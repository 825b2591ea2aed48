package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batch-shaped decode/feature-extract over
  * mapPartitions. The Spark-side contract — schema, partitioning,
  * batch iteration, null handling — is real and tested. PNG/JPEG
  * bytes are decoded with the REAL JDK codec (`javax.imageio`, zero
  * extra dependencies); other formats fall back to the clearly-marked
  * deterministic stub below (audio/video codecs are not available in
  * this environment).
  */
object Multimodal {

  // Never spill ImageIO's decode scratch space to disk files on
  // executors — in-memory cache only.
  javax.imageio.ImageIO.setUseCache(false)

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))

  /** STUB DECODER — deterministic fake standing in for codecs the JDK
    * does not ship (audio resample, video demux). Derives plausible
    * metadata purely from the byte stream so tests and oracles are
    * stable. Swap this single function for a real codec binding in
    * production; everything around it (schema, batching, nulls)
    * stays unchanged.
    */
  def fakeDecode(bytes: Array[Byte]): Row = {
    val n = bytes.length
    val mean = if (n == 0) 0.0
    else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
    Row(n, n % 640, (n * 7) % 480, n % 24, mean)
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  /** REAL DECODER — `javax.imageio` (in the JDK, no added
    * dependencies) for PNG/JPEG bytes: width/height/channel count come
    * from the actually-decoded image; mean_byte stays the byte-stream
    * mean (same definition as the stub, format-independent);
    * n_frames = 1 for still images. Returns None when the bytes are
    * not a decodable PNG/JPEG (caller falls back to the stub).
    */
  def imageDecode(bytes: Array[Byte]): Option[Row] = {
    if (!isPng(bytes) && !isJpeg(bytes)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val n = bytes.length
      val mean = if (n == 0) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
      Some(Row(n, img.getWidth, img.getHeight, 1, mean))
    }
  }

  /** Decode/feature-extract a binary column via mapPartitions —
    * the rows stream through in partition batches exactly as a
    * vectorized UDF would see them; output schema is input fields +
    * `media_meta` struct. NULL media → NULL metadata. PNG/JPEG bytes
    * go through the real JDK decoder; anything else hits the stub.
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
        val meta =
          if (bytes == null) null
          else imageDecode(bytes).getOrElse(fakeDecode(bytes))
        Row.fromSeq(row.toSeq :+ meta)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Shared synthesize→encode→DECODE round-trip for the deterministic
    * PNG corpus (one definition of the pixel formula for both the
    * metadata and the perceptual-hash operators): w = 1 + id % 16,
    * h = 1 + id % 12, pixel(x,y) = (31x + 17y + id) mod 256 in every
    * channel. Returns the image decoded BACK from the encoded bytes —
    * callers may only report decoded facts. Disables ImageIO's
    * temp-FILE stream cache in the calling JVM first: executors that
    * never initialize this object would otherwise pay two temp-file
    * create/delete round-trips per row (and fail outright on an
    * unwritable java.io.tmpdir).
    */
  private def synthDecodeRoundTrip(docId: Long): java.awt.image.BufferedImage = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = (1 + docId % 16).toInt
    val h = (1 + docId % 12).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((31L * x + 17L * y + docId) % 256).toInt
        raster.setSample(x, y, 0, v)
        raster.setSample(x, y, 1, v)
        raster.setSample(x, y, 2, v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(baos.toByteArray))
  }

  private def rowId(row: Row, idx: Int): Long = row.get(idx) match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case other => other.asInstanceOf[Number].longValue()
  }

  /** End-to-end proof that the REAL codec runs on the executors: per
    * input row, synthesize a PNG whose dimensions and pixel values are
    * pure functions of the id (w = 1 + id % 16, h = 1 + id % 12,
    * pixel(x,y) = (31x + 17y + id) mod 256 in every channel), encode
    * it with ImageIO, then DECODE the bytes back and report only
    * decoded facts — width/height from the decoded header, channel
    * count from the decoded raster, mean pixel from the decoded
    * samples. PNG is lossless, so the DuckDB oracle can verify every
    * column from the closed-form pixel function; the values cannot be
    * faked from the byte stream without actually decoding it. The
    * pixel aggregate is the integer sum (not a float mean) so the
    * oracle compare is exact in both engines by construction.
    * Output: id, width, height, channels, sum_px.
    */
  def pngRoundTripMeta(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sum_px", LongType, nullable = false)))
    val idx = df.schema.fieldIndex(id)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val docId = rowId(row, idx)
        // everything below comes from the DECODED image
        val dec = synthDecodeRoundTrip(docId)
        val dr = dec.getRaster
        val dw = dec.getWidth
        val dh = dec.getHeight
        var sum = 0L
        var yy = 0
        while (yy < dh) {
          var xx = 0
          while (xx < dw) { sum += dr.getSample(xx, yy, 0); xx += 1 }
          yy += 1
        }
        Row(docId, dw, dh, dr.getNumBands, sum)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Perceptual image fingerprints over DECODED pixels — the hash
    * half of image near-duplicate detection (pair finding is
    * [[graft.ext.Dedup.hammingPairs]]' pigeonhole band join, the same
    * machinery text SimHash uses). Works on the deterministic PNG
    * corpus of [[pngRoundTripMeta]]: per id, synthesize the
    * closed-form image, ENCODE it, then decode the bytes back and
    * fingerprint only decoded raster samples — PNG is lossless, so an
    * oracle can replay every bit from the pixel function, while the
    * values cannot be produced without actually running the codec.
    *
    * Both hashes are the standard 8×8-grid forms, truncated to 56
    * bits (8 rows × 7 columns) so the fingerprint never touches the
    * sign bit of a 64-bit integer in either engine:
    * - dhash: bit r·7+g set iff sample(g+1, r) > sample(g, r) —
    *   horizontal gradient signs, invariant to constant brightness
    *   shifts except where the 8-bit value wraps (which is what makes
    *   shifted variants NEAR-dups, not exact ones).
    * - ahash: bit r·7+g set iff sample(g, r)·56 > Σ samples — the
    *   mean threshold compared in exact integer cross-multiplication.
    * Sampling is nearest-neighbor at (⌊g·w/8⌋, ⌊r·h/8⌋), band 0 —
    * integer-exact, so both engines replay it bit for bit.
    * Output: id, width, height, dhash, ahash.
    */
  def pngPerceptualHash(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("dhash", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val idx = df.schema.fieldIndex(id)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val docId = rowId(row, idx)
        // fingerprint path: everything below reads the DECODED image
        val dec = synthDecodeRoundTrip(docId)
        val (dhash, ahash) = gridHashes(dec)
        Row(docId, dec.getWidth, dec.getHeight, dhash, ahash)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** The 8×8-grid 56-bit dHash/aHash block over a DECODED image's
    * band-0 samples — extracted verbatim from [[pngPerceptualHash]]
    * (whose oracle replays it bit for bit) so the lossy JPEG path
    * fingerprints with the IDENTICAL form. Sampling is
    * nearest-neighbor at (⌊g·w/8⌋, ⌊r·h/8⌋).
    */
  private def gridHashes(dec: java.awt.image.BufferedImage): (Long, Long) = {
    val dr = dec.getRaster
    val w = dec.getWidth
    val h = dec.getHeight
    val s = Array.ofDim[Int](8, 8)
    var r = 0
    while (r < 8) {
      var g = 0
      while (g < 8) { s(r)(g) = dr.getSample(g * w / 8, r * h / 8, 0); g += 1 }
      r += 1
    }
    var dhash = 0L
    var ahash = 0L
    var sum = 0
    r = 0
    while (r < 8) {
      var g = 0
      while (g < 7) { sum += s(r)(g); g += 1 }
      r += 1
    }
    r = 0
    while (r < 8) {
      var g = 0
      while (g < 7) {
        val bit = 1L << (r * 7 + g)
        if (s(r)(g + 1) > s(r)(g)) dhash |= bit
        if (s(r)(g).toLong * 56 > sum) ahash |= bit
        g += 1
      }
      r += 1
    }
    (dhash, ahash)
  }

  /** The id→source-image function of the JPEG corpus and its twin
    * construction: everything derives from key = id mod 10⁷, so ids
    * i and i + 10⁷ synthesize the SAME source image (the planted
    * exact-twin structure q_jpeg_neardup's oracle replays). The
    * field is an 8×8 grid of CONSTANT cells whose values are an
    * integer mix of (key, row, col) — pseudo-random per key, so the
    * 56-bit grid hashes of distinct keys are well-separated — and
    * whose geometry is chosen so each cell is a whole number of
    * JPEG's 8×8 DCT blocks (w, h multiples of 8): a constant aligned
    * block survives compression as its DC coefficient, so the decoded
    * grid stays readable (bounded quantization error) while the codec
    * is still genuinely lossy. A sawtooth field here (the PNG
    * corpus' choice) degrades to near-uniform gray and collapses
    * thousands of distinct keys onto colliding fingerprints.
    */
  private def synthJpegSource(docId: Long): java.awt.image.BufferedImage = {
    val key = docId % 10000000L
    val w = (8 * (8 + key % 5)).toInt // 64..96, cell-aligned
    val h = (8 * (8 + key % 3)).toInt // 64..80
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      val r = y * 8 / h
      var x = 0
      while (x < w) {
        val c = x * 8 / w
        // splitmix64-style finalizer: an AFFINE mix here would give
        // every key the same ±step gradient pattern along a row and
        // collapse thousands of keys onto colliding grid hashes
        var z = key * 64 + r * 8 + c
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
        z ^= (z >>> 33)
        val v = ((z & 0x7fffffffL) % 256L).toInt
        raster.setSample(x, y, 0, v)
        raster.setSample(x, y, 1, v)
        raster.setSample(x, y, 2, v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Synthesize→JPEG-encode→DECODE round trip — the LOSSY sibling of
    * [[synthDecodeRoundTrip]]: ImageIO's real JPEG writer (libjpeg
    * quantization, default quality) then its real reader. Returns
    * (source, decoded); unlike the PNG path the decoded samples are
    * NOT the closed-form values — callers report decoded facts plus
    * source-vs-decoded error bounds, and fingerprints face genuine
    * compression artifacts.
    */
  private def synthJpegRoundTrip(docId: Long)
      : (java.awt.image.BufferedImage, java.awt.image.BufferedImage) = {
    javax.imageio.ImageIO.setUseCache(false)
    val src = synthJpegSource(docId)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "jpg", baos)
    (src, javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(baos.toByteArray)))
  }

  /** LOSSY codec round-trip audit: per id, synthesize the closed-form
    * source, JPEG-encode + decode it, and report decoded header facts
    * (width/height/channels — JPEG preserves geometry, so these ARE
    * oracle-replayable closed-form) plus the error verdict
    * `err_ok` = max |decoded − source| over band 0 ≤ `tol` — the
    * oracle states the spec bound (constant true), the ENGINE proves
    * compliance by measuring the real decode against the real source:
    * a broken codec path, a channel swap, a wrong-quality writer all
    * flip the boolean. The raw max error is spec-pinned in ExtSpec
    * (nonzero — the codec is genuinely lossy — and well under tol).
    * Output: id, width, height, channels, err_ok.
    */
  def jpegRoundTripMeta(df: DataFrame, id: String, tol: Int = 48): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("err_ok", BooleanType, nullable = false)))
    val idx = df.schema.fieldIndex(id)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val docId = rowId(row, idx)
        val (src, dec) = synthJpegRoundTrip(docId)
        Row(docId, dec.getWidth, dec.getHeight, dec.getRaster.getNumBands,
          jpegMaxErr(src, dec) <= tol)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** max |decoded − source| over band 0 — the lossy-error metric of
    * [[jpegRoundTripMeta]] and the ExtSpec lossiness pins.
    */
  private[graft] def jpegMaxErr(src: java.awt.image.BufferedImage,
      dec: java.awt.image.BufferedImage): Int = {
    val sr = src.getRaster
    val dr = dec.getRaster
    var err = 0
    var y = 0
    while (y < src.getHeight) {
      var x = 0
      while (x < src.getWidth) {
        val d = math.abs(dr.getSample(x, y, 0) - sr.getSample(x, y, 0))
        if (d > err) err = d
        x += 1
      }
      y += 1
    }
    err
  }

  /** test hook: the (source, decoded) pair for one id. */
  private[graft] def jpegRoundTripForTest(docId: Long) = synthJpegRoundTrip(docId)

  /** Perceptual fingerprints over LOSSY-decoded JPEG rasters — the
    * same 56-bit [[gridHashes]] form the PNG path ships, but computed
    * on pixels that carry real libjpeg quantization artifacts. Twin
    * ids (i and i + 10⁷, identical source by [[synthJpegSource]]'s
    * key construction) produce byte-identical JPEGs and therefore
    * hamming-0 fingerprints — the deterministic plant
    * q_jpeg_neardup's oracle replays — while distinct keys yield
    * artifact-laden hashes whose spread the band join prunes.
    * Output: id, width, height, dhash, ahash.
    */
  def jpegPerceptualHash(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("dhash", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val idx = df.schema.fieldIndex(id)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val docId = rowId(row, idx)
        val (_, dec) = synthJpegRoundTrip(docId)
        val (dhash, ahash) = gridHashes(dec)
        Row(docId, dec.getWidth, dec.getHeight, dhash, ahash)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Shared synthesize→encode→DECODE round-trip for the deterministic
    * WAV corpus — the audio twin of [[synthDecodeRoundTrip]], making
    * "multimodal" mean two REAL codecs: 16-bit mono PCM at 8 kHz,
    * n = 64 + (id % 12)·4 samples, sample(i) = (((31·i + id) mod 256)
    * − 128)·256. The PCM block is framed with javax.sound's real WAV
    * writer (RIFF header, chunk layout) and decoded back with
    * AudioSystem's WAV reader — callers may only report DECODED facts
    * (format fields, frame count, sample values read back per the
    * decoded format's endianness). WAV PCM is lossless, so every
    * decoded sample is oracle-checkable from the closed-form formula,
    * and the values cannot be produced without actually running the
    * codec round-trip.
    */
  private def synthWavRoundTrip(docId: Long)
      : (javax.sound.sampled.AudioFormat, Array[Short]) = {
    import javax.sound.sampled._
    val n = (64 + (docId % 12) * 4).toInt
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // signed PCM LE
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (((31L * i + docId) % 256) - 128).toInt * 256
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    val dec = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    val dfmt = dec.getFormat
    val out = dec.readAllBytes()
    dec.close()
    // samples re-read per the DECODED format's frame size/endianness
    val frame = dfmt.getFrameSize
    val m = out.length / frame
    val samples = new Array[Short](m)
    val be = dfmt.isBigEndian
    var k = 0
    while (k < m) {
      val b0 = out(k * frame) & 0xff
      val b1 = out(k * frame + 1) & 0xff
      samples(k) =
        (if (be) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
      k += 1
    }
    (dfmt, samples)
  }

  /** End-to-end proof that the REAL WAV codec runs on the executors —
    * the audio twin of [[pngRoundTripMeta]]: per input row, synthesize
    * the closed-form PCM block, frame it as a WAV with
    * javax.sound.sampled, decode the bytes back, and report only
    * decoded facts — sample rate/channels from the decoded format,
    * n_samples from the decoded frame count, sum_samples over the
    * decoded sample values. Lossless PCM ⇒ the DuckDB oracle verifies
    * every column from the sample formula.
    * Output: id, n_samples, sample_rate, channels, sum_samples.
    */
  def wavRoundTripMeta(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sum_samples", LongType, nullable = false)))
    val idx = df.schema.fieldIndex(id)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val docId = rowId(row, idx)
        val (fmt, samples) = synthWavRoundTrip(docId)
        var sum = 0L
        var i = 0
        while (i < samples.length) { sum += samples(i); i += 1 }
        Row(docId, samples.length, fmt.getSampleRate.toInt,
          fmt.getChannels, sum)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Audio fingerprint over DECODED samples — the hash half of audio
    * near-duplicate detection (pair finding is
    * [[graft.ext.Dedup.hammingPairs]]' pigeonhole band join, shared
    * with text SimHash and image dHash). The delta-sign construction
    * is the time-domain reduction of the Haitsma & Kalker 2002 robust
    * audio fingerprint (sign of band-energy DIFFERENCES, chosen there
    * precisely because difference signs survive gain changes):
    * 56 delta-sign bits over 57
    * probe points spread evenly across the decoded clip, bit j set
    * iff sample(p_{j+1}) > sample(p_j) with p_j = ⌊j·(n−1)/56⌋ —
    * integer-exact probe positions, so both engines replay the bits
    * exactly; delta signs are invariant to constant gain shifts
    * except where the synth formula's 8-bit value wraps (which is
    * what makes shifted variants NEAR-dups rather than exact ones —
    * the same contract as the image dHash).
    * Output: id, n_samples, afp (long, 56 bits).
    */
  def wavFingerprint(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("afp", LongType, nullable = false)))
    val idx = df.schema.fieldIndex(id)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val docId = rowId(row, idx)
        val (_, s) = synthWavRoundTrip(docId)
        val n = s.length
        var fp = 0L
        var j = 0
        while (j < 56) {
          val p0 = j * (n - 1) / 56
          val p1 = (j + 1) * (n - 1) / 56
          if (s(p1) > s(p0)) fp |= 1L << j
          j += 1
        }
        Row(docId, n, fp)
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

  /** Synthesize, ENCODE and DECODE an animated GIF whose every frame
    * is a pure function of the id — the multi-frame (video-like)
    * codec round-trip: w = 1 + id % 16, h = 1 + id % 12, n_frames =
    * 2 + id % 5, pixel(x, y, f) = (31x + 17y + id + 7f) mod 256 (the
    * PNG corpus' pixel function plus a per-frame brightness term, so
    * CONSECUTIVE frames are constant-shift near-dups — the shot-
    * detection structure). Frames are TYPE_BYTE_INDEXED on an
    * explicit 256-gray palette (GIF stores ≤256-color indexed rasters
    * losslessly), written with ImageIO's GIF sequence writer and read
    * back frame by frame (getNumImages(true) + read(i)); callers
    * report only DECODED facts, and gray values are taken from the
    * decoded RGB (palette-permutation-proof), never the raw index.
    */
  private def synthGifRoundTrip(docId: Long)
      : IndexedSeq[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = (1 + docId % 16).toInt
    val h = (1 + docId % 12).toInt
    val nF = (2 + docId % 5).toInt
    val grays = Array.tabulate(256)(i => i.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val baos = new java.io.ByteArrayOutputStream()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    // non-interlaced frames: the JDK GIF writer defaults to interlaced
    // output, whose pass structure mis-round-trips rasters shorter
    // than 8 rows (rows come back pass-shuffled) — and this corpus'
    // heights are 1..12
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    var f = 0
    while (f < nF) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0,
            ((31L * x + 17L * y + docId + 7L * f) % 256).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        param)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    val frames = (0 until n).map(reader.read)
    reader.dispose()
    iis.close()
    frames
  }

  /** decoded gray value at (x, y) — red channel of the decoded RGB,
    * independent of how the codec ordered the palette
    */
  private def decodedGray(img: java.awt.image.BufferedImage,
      x: Int, y: Int): Int = (img.getRGB(x, y) >> 16) & 255

  /** Per-frame decoded facts of the animated-GIF round-trip — the
    * multi-frame half of the image story ([[pngRoundTripMeta]]'s
    * contract, per frame): frame count from the DECODED stream,
    * dimensions from each decoded frame, sum_px over decoded pixels.
    * GIF is lossless for indexed input, so a closed-form oracle
    * verifies every value; none can be produced without actually
    * running the codec (the sequence writer + multi-image reader).
    * This is the real decode behind [[frameSamplePlan]]'s plan-only
    * frame explosion. Output: id, frame_idx, n_frames, width, height,
    * sum_px.
    */
  def gifFrameMeta(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_px", LongType, nullable = false)))
    val idx = df.schema.fieldIndex(id)
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val docId = rowId(row, idx)
        val frames = synthGifRoundTrip(docId)
        frames.zipWithIndex.map { case (dec, f) =>
          val dw = dec.getWidth
          val dh = dec.getHeight
          var sum = 0L
          var yy = 0
          while (yy < dh) {
            var xx = 0
            while (xx < dw) { sum += decodedGray(dec, xx, yy); xx += 1 }
            yy += 1
          }
          Row(docId, f, frames.length, dw, dh, sum)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Per-frame 56-bit dHash over DECODED animated-GIF rasters — the
    * fingerprint half of video near-dup detection (temporal pairing
    * is [[graft.ext.Dedup.hammingPairs]] over the packed
    * (id, frame) key, the same pigeonhole band join text SimHash,
    * image dHash and the audio fingerprint ride). Same 8-row ×
    * 7-column gradient-sign construction as [[pngPerceptualHash]],
    * nearest-neighbor sampled at (⌊g·w/8⌋, ⌊r·h/8⌋) from the decoded
    * gray values. fkey = id·8 + frame_idx packs the pair key
    * (n_frames ≤ 6 < 8 by construction).
    * Output: id, frame_idx, fkey, dhash.
    */
  def gifFrameHash(df: DataFrame, id: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("fkey", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val idx = df.schema.fieldIndex(id)
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val docId = rowId(row, idx)
        synthGifRoundTrip(docId).zipWithIndex.map { case (dec, f) =>
          val w = dec.getWidth
          val h = dec.getHeight
          val sm = Array.ofDim[Int](8, 8)
          var r = 0
          while (r < 8) {
            var g = 0
            while (g < 8) {
              sm(r)(g) = decodedGray(dec, g * w / 8, r * h / 8); g += 1
            }
            r += 1
          }
          var dhash = 0L
          r = 0
          while (r < 8) {
            var g = 0
            while (g < 7) {
              if (sm(r)(g + 1) > sm(r)(g)) dhash |= 1L << (r * 7 + g)
              g += 1
            }
            r += 1
          }
          Row(docId, f, docId * 8 + f, dhash)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
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
