package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batch-shaped decode/feature-extract over
  * mapPartitions. The Spark-side contract — schema, partitioning,
  * batch iteration, null handling — is real and tested; the actual
  * codec is STUBBED with a deterministic fake (image/audio libraries
  * are not available in this environment) and clearly marked below.
  */
object Multimodal {

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))

  /** STUB DECODER — deterministic fake standing in for a real codec
    * (e.g. JPEG decode / audio resample). Derives plausible metadata
    * purely from the byte stream so tests and oracles are stable.
    * Swap this single function for a real codec binding in
    * production; everything around it (schema, batching, nulls)
    * stays unchanged.
    */
  def fakeDecode(bytes: Array[Byte]): Row = {
    val n = bytes.length
    val mean = if (n == 0) 0.0
    else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
    Row(n, n % 640, (n * 7) % 480, n % 24, mean)
  }

  /** Decode/feature-extract a binary column via mapPartitions —
    * the rows stream through in partition batches exactly as a
    * vectorized UDF would see them; output schema is input fields +
    * `media_meta` struct. NULL media → NULL metadata.
    */
  def decodeColumn(df: DataFrame, binaryCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("media_meta", MediaMetaSchema, nullable = true))
    val idx = df.schema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.get(idx) match {
          case null => null
          case b: Array[Byte] => b
        }
        val meta = if (bytes == null) null else fakeDecode(bytes)
        Row.fromSeq(row.toSeq :+ meta)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame-sampling plan: one output row per selected
    * frame at a fixed stride, with the frame's timestamp offset — the
    * relational half of video frame extraction (the pixel decode is
    * the stubbed seam above; the EXPLODE of frame indices, which is
    * what shuffles and scales, is real). A media row with n frames at
    * `fps` yields ceil(n/everyN) rows.
    * Output: id, frame_idx, frame_ms.
    */
  def frameSamplePlan(df: DataFrame, id: String, nFramesCol: String,
      everyN: Int, fps: Double = 24.0): DataFrame = {
    val idxs = when(col(nFramesCol) > 0,
      sequence(lit(0), col(nFramesCol) - 1, lit(everyN)))
      .otherwise(array().cast("array<int>"))
    df.select(col(id), explode(idxs).as("frame_idx"))
      .withColumn("frame_ms",
        round(col("frame_idx") * lit(1000.0) / fps, 6))
  }

  /** Relational view of the same metadata, computed with built-in
    * expressions (what the oracle checks): byte length, first-char
    * code, and the derived fake dimensions. Used to validate the
    * plumbing against DuckDB on text-derived blobs.
    */
  def mediaMetaRelational(df: DataFrame, id: String, text: String): DataFrame = {
    val blobLen = octet_length(col(text).cast("binary"))
    df.select(col(id),
      blobLen.as("n_bytes"),
      (blobLen % 640).as("width"),
      ((blobLen * 7) % 480).as("height"),
      (blobLen % 24).as("n_frames"),
      ascii(substring(col(text), 1, 1)).as("first_byte"))
  }
}
