package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns. The dot
  * product is a codegen'd `aggregate(zip_with(...))` fold — no UDF.
  * Brute-force is the exactness baseline; the sign-LSH bucketed
  * variant is the scale path (bucket join instead of cross join).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, sequential accumulation (matches
    * the oracle's list_sum(list_transform(...)) evaluation order).
    * Backed by the native codegen'd DotProduct expression registered
    * by GraftExtensions (sessions must set spark.sql.extensions=
    * graft.GraftExtensions — Sessions.local does) — the equivalent
    * higher-order-function fold runs interpreted closures per element;
    * the native loop lives inside whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k for each query vector (exact baseline;
    * O(|queries|·|corpus|) — broadcast the QUERIES side: the query set
    * is the small one by construction, while the corpus is the 100 TB
    * axis and must stay partitioned so every executor scans only its
    * corpus slice against the replicated queries).
    * Output: query_id, vec_id, cosine, rank (ties → smaller vec_id).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    // norms are per-ROW, computed before the join — cosine inside the
    // pair loop would re-fold both arrays for every candidate pair
    val q = queries.select(col(id).as("query_id"), col(vec).as("__qv"),
      norm(col(vec)).as("__qn"))
    val c = corpus.select(col(id).as("vec_id"), col(vec).as("__cv"),
      norm(col(vec)).as("__cn"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("vec_id"))
      .withColumn("cosine", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"),
        col("rank"))
  }

  /** Sign-LSH bucket: bit j = (vec[j] > 0) for the first `bitsUsed`
    * dimensions — axis-aligned random-hyperplane LSH, fully
    * deterministic and engine-portable.
    */
  def signBucket(vec: Column, bitsUsed: Int = 8): Column =
    (0 until bitsUsed).map(j =>
      when(element_at(vec, j + 1) > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)

  /** Approximate top-k: candidates restricted to the query's sign-LSH
    * bucket, then exact cosine rank within the bucket. At cluster
    * scale this is a shuffle on the bucket key instead of a cross
    * join; recall is traded via bitsUsed.
    * Output: query_id, vec_id, cosine, rank.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, id: String, vec: String,
      k: Int, bitsUsed: Int = 8): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("__qv"),
      norm(col(vec)).as("__qn"), signBucket(col(vec), bitsUsed).as("__bucket"))
    val c = corpus.select(col(id).as("vec_id"), col(vec).as("__cv"),
      norm(col(vec)).as("__cn"), signBucket(col(vec), bitsUsed).as("__bucket"))
    val scored = q.join(c, Seq("__bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"),
        col("rank"))
  }

  /** Multi-probe sign-LSH top-k: the query probes its own bucket AND
    * every 1-bit-flip neighbor bucket (bitsUsed + 1 probes) — the
    * standard recall repair for bucketed ANN: a near neighbor that
    * disagrees on exactly one hyperplane sign is recovered without
    * raising bucket count or replicating the corpus. The corpus keeps
    * ONE row per vector (buckets partition it), so probing multiplies
    * only the query side — at cluster scale that is a bitsUsed+1-row
    * explosion of the small side feeding the same bucket equi-join.
    * Output: query_id, vec_id, cosine, rank.
    */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame, id: String,
      vec: String, k: Int, bitsUsed: Int = 8): DataFrame = {
    val base = signBucket(col(vec), bitsUsed)
    val probes = array((base +: (0 until bitsUsed).map(j =>
      base.bitwiseXOR(lit(1L << j)))): _*)
    val q = queries.select(col(id).as("query_id"), col(vec).as("__qv"),
      norm(col(vec)).as("__qn"), explode(probes).as("__bucket"))
    val c = corpus.select(col(id).as("vec_id"), col(vec).as("__cv"),
      norm(col(vec)).as("__cn"), signBucket(col(vec), bitsUsed).as("__bucket"))
    val scored = q.join(c, Seq("__bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"),
        col("rank"))
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    * (MLlib, seeded) assigns every corpus vector to its nearest of
    * `nlist` centroid cells; a query scans only its `nprobe` closest
    * cells. Training touches a bounded sample; assignment, probing
    * and scoring are plain joins on the (tiny, broadcast) centroid
    * table — the standard ANN shape at cluster scale, recall traded
    * via nlist/nprobe.
    * Output: query_id, vec_id, cosine, rank.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, id: String, vec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 2, seed: Long = 42L,
      trainSample: Int = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // Deterministic training set: orderBy(id) before limit — a bare
    // limit over a multi-partition scan is not a stable sample, so the
    // "seeded" quantizer could vary run to run despite the fixed seed.
    val train = corpus
      .orderBy(col(id))
      .limit(trainSample)
      .select(array_to_vector(col(vec).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
      .fit(train)
    // Centroids as a LITERAL array<struct<cell,cent>> — cell assignment
    // becomes a pure projection (transform → array_sort → slice): no
    // broadcast join, no per-row window sort over the corpus. nlist is
    // small by construction, so the literal stays tiny.
    val centArr = array(model.clusterCenters.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"),
        array(c.toArray.map(lit(_)): _*).as("cent"))
    }: _*)
    def dist2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    // nearest `keep` cells, ties to the smaller cell id (struct sort
    // orders by d2 then cell)
    def nearCells(vecCol: Column, keep: Int): Column =
      slice(array_sort(transform(centArr, ct =>
        struct(dist2(vecCol, ct.getField("cent")).as("d2"),
          ct.getField("cell").as("cell")))), 1, keep)
    val corpusCells = corpus
      .withColumn("cell", element_at(nearCells(col(vec), 1), 1).getField("cell"))
      .select(col(id).as("vec_id"), col(vec).as("__cv"),
        norm(col(vec)).as("__cn"), col("cell"))
    val queryCells = queries
      .withColumn("__cell", explode(nearCells(col(vec), nprobe)))
      .withColumn("cell", col("__cell").getField("cell"))
      .select(col(id).as("query_id"), col(vec).as("__qv"),
        norm(col(vec)).as("__qn"), col("cell"))
    val scored = queryCells.join(corpusCells, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cosine", dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 6).as("cosine"),
        col("rank"))
  }

  /** Per-vector symmetric int8 quantization — the storage scale path
    * for embedding corpora (4x smaller than float32, 8x than float64):
    * scale = 127 / max|vᵢ|, qᵢ = round(vᵢ·scale) ∈ [−127, 127], plus
    * the reconstruction MSE of q/scale against the original. All
    * element folds are sequential (same evaluation order in any
    * engine), so the output is deterministic and oracle-checkable.
    * Output: id, scale, q (array<int>), mse.
    */
  def quantizeInt8(df: DataFrame, id: String, vec: String): DataFrame = {
    val v = col(vec)
    val maxAbs = aggregate(v, lit(0.0), (acc, x) =>
      when(abs(x.cast("double")) > acc, abs(x.cast("double"))).otherwise(acc))
    val scale = when(col("__maxabs") > 0, lit(127.0) / col("__maxabs"))
    val q = transform(v, x =>
      round(x.cast("double") * col("__scale")).cast("int"))
    val err = aggregate(zip_with(v, col("__q"), (x, qi) => {
      val r = qi.cast("double") / col("__scale")
      (x.cast("double") - r) * (x.cast("double") - r)
    }), lit(0.0), (acc, e) => acc + e) / size(v)
    df.withColumn("__maxabs", maxAbs)
      .withColumn("__scale", scale)
      .withColumn("__q", q)
      .select(col(id), round(col("__scale"), 6).as("scale"),
        col("__q").as("q"), round(err, 9).as("mse"))
  }

  /** Near-duplicate pairs by cosine ≥ threshold. With bucketBits > 0
    * candidates are restricted to the same sign-LSH bucket — an
    * equi-join on the bucket key instead of an O(n²) cross join, the
    * only shape that survives at cluster scale (recall is traded via
    * bucketBits; 0 = exact brute force).
    * Output: id_a < id_b, cosine.
    */
  def cosinePairs(df: DataFrame, id: String, vec: String,
      threshold: Double, bucketBits: Int = 0): DataFrame = {
    val a = df.select(col(id).as("id_a"), col(vec).as("__va"),
      norm(col(vec)).as("__na"),
      signBucket(col(vec), math.max(bucketBits, 1)).as("__bucket"))
    val b = df.select(col(id).as("id_b"), col(vec).as("__vb"),
      norm(col(vec)).as("__nb"),
      signBucket(col(vec), math.max(bucketBits, 1)).as("__bucket"))
    val joined =
      if (bucketBits > 0)
        a.join(b, a("__bucket") === b("__bucket") && col("id_a") < col("id_b"))
      else a.join(b, col("id_a") < col("id_b"))
    joined
      .withColumn("cosine", dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
