package graft

import org.apache.spark.sql.functions._

import graft.ext.TextStats

/** BPE training: the distributed trainer must reproduce, merge for
  * merge, a literal single-threaded reference implementation of
  * Sennrich-style BPE over the same word-frequency table (same
  * pair-weight argmax, same total tie order, same greedy
  * left-to-right merge).
  */
class BpeSpec extends SparkTestBase {

  /** Reference BPE on a word→count map: plain Scala, no Spark.
    * Symbols are CODE POINTS (not UTF-16 units), matching the engine
    * and the SQL oracles.
    */
  private def refBpe(wordCounts: Map[String, Long],
      numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) =>
        (graft.ext.TextStats.codePointSyms(w).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= numMerges && !stop) {
      val pairWeights = words.toSeq
        .flatMap { case (sym, c) => sym.zip(sym.tail).map(p => (p, c)) }
        .groupMapReduce(_._1)(_._2)(_ + _)
        .filter(_._2 >= 2L)
      if (pairWeights.isEmpty) stop = true
      else {
        val ((l, rr), w) = pairWeights.minBy { case ((l, rr), w) => (-w, l, rr) }
        out += ((r, l, rr, l + rr, w))
        words = words.toSeq.map { case (sym, c) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- sym) {
            if (acc.nonEmpty && acc.last == l && x == rr)
              acc(acc.size - 1) = l + rr
            else acc += x
          }
          (acc.toVector, c)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        r += 1
      }
    }
    out.toSeq
  }

  test("trainBpe matches the reference trainer on the classic toy corpus") {
    import spark.implicits._
    // Sennrich's canonical example shape: shared suffixes dominate
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest"),
      (3L, "newest newest newest newest widest widest widest")
    ).toDF("doc_id", "text")
    val got = TextStats.trainBpe(docs, "doc_id", "text", numMerges = 8)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    assert(got == refBpe(wc, 8))
    // the canonical first merges: 'es' then 'est' (weight 9)
    assert(got.take(2).map(_._4) == Seq("es", "est"))
  }

  test("trainBpe matches the reference trainer on the real sf0.001 corpus") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextStats.trainBpe(docs, "doc_id", "text", numMerges = 12)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val wc = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == refBpe(wc, 12))
    assert(got.size == 12) // corpus is rich enough for all 12 merges
  }

  test("trainBpeBatched with batchSize=1 equals trainBpe merge for merge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest"),
      (3L, "newest newest newest newest widest widest widest")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // batch of one = the exact greedy trainer, round for round
    assert(rows(TextStats.trainBpeBatched(docs, "doc_id", "text",
        numMerges = 8, batchSize = 1)) ==
      rows(TextStats.trainBpe(docs, "doc_id", "text", numMerges = 8)))
  }

  test("trainBpeBatched picks symbol-disjoint pairs per round, dense ranks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest"),
      (3L, "newest newest newest newest widest widest widest")
    ).toDF("doc_id", "text")
    val got = TextStats.trainBpeBatched(docs, "doc_id", "text",
      numMerges = 8, batchSize = 4).orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(4))).toSeq
    assert(got.map(_._1) == (1 to got.size)) // dense pick-order ranks
    // within each round of 4, no symbol repeats on either side
    got.grouped(4).foreach { round =>
      val syms = round.flatMap(t => Seq(t._2, t._3))
      assert(syms.distinct.size == syms.size,
        s"round shares a symbol: $round")
    }
    // the top pair is still the greedy top pair ('es' weight 9)
    assert((got.head._2, got.head._3) == ("e", "s"))
  }

  test("trainBpe symbols are code points: supplementary-plane text trains cleanly") {
    import spark.implicits._
    // 𝄞 (U+1D11E) is two UTF-16 units; a code-unit split would train
    // on lone surrogates and diverge from every per-code-point SQL
    // replay. The merged pair must be the real two-char string.
    val docs = Seq((1L, "𝄞a 𝄞a 𝄞a"))
      .toDF("doc_id", "text")
    val got = TextStats.trainBpe(docs, "doc_id", "text", numMerges = 1)
      .collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "𝄞" && got(0).getString(2) == "a")
    assert(got(0).getString(3) == "𝄞a")
    assert(got(0).getLong(4) == 3L)
    // and the reference trainer agrees (both are code-point-based)
    assert(refBpe(Map("𝄞a" -> 3L), 1).head._4 == "𝄞a")
    // encode side shares the same alphabet: 3 words of 1 token each
    val enc = TextStats.encodeBpe(docs, "doc_id", "text",
      TextStats.trainBpe(docs, "doc_id", "text", numMerges = 1)).collect()(0)
    assert(enc.getLong(1) == 3L && enc.getLong(2) == 3L)
  }

  test("trainBpe stops early when no pair repeats") {
    import spark.implicits._
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val got = TextStats.trainBpe(docs, "doc_id", "text", numMerges = 5)
    assert(got.count() == 0) // every pair has weight 1
  }

  /** Reference ENCODE: replay the merge table in rank order, each
    * merge as one greedy left-to-right pass (the exact operation the
    * trainer applied to its own working corpus). */
  private def refEncode(word: String,
      merges: Seq[(Int, String, String)]): Int = {
    var syms = graft.ext.TextStats.codePointSyms(word).toVector
    for ((_, l, r) <- merges.sortBy(_._1)) {
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      for (x <- syms) {
        if (acc.nonEmpty && acc.last == l && x == r)
          acc(acc.size - 1) = l + r
        else acc += x
      }
      syms = acc.toVector
    }
    syms.length
  }

  test("encodeBpe equals the rank-order replay on the real corpus") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = TextStats.trainBpe(docs, "doc_id", "text", numMerges = 12)
    val mseq = merges.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val got = TextStats.encodeBpe(docs, "doc_id", "text", merges)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // independent per-doc expectation from the reference encoder
    val words = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = words.groupBy(_._1).map { case (d, ws) =>
      d -> ((ws.length.toLong,
        ws.map(w => refEncode(w._2, mseq).toLong).sum,
        ws.map(_._2.length.toLong).sum))
    }
    assert(got == expect)
    // encoding must compress: fewer BPE tokens than chars, at least
    // as many as words
    got.values.foreach { case (nw, nb, nc) =>
      assert(nb >= nw && nb <= nc)
    }
  }

  test("encodeBpe from a parquet-persisted merge artifact equals the direct encode") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = TextStats.trainBpe(docs, "doc_id", "text", numMerges = 12)
    val direct = TextStats.encodeBpe(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().toSeq
    val art = java.nio.file.Files
      .createTempDirectory("bpe_artifact_spec").toString
    merges.write.mode("overwrite").parquet(art)
    // the loaded artifact has NO lineage back to training — encode
    // reads only the 12-row parquet (the ship-a-tokenizer shape)
    val loaded = spark.read.parquet(art)
    assert(loaded.count() == merges.count())
    val viaArtifact = TextStats.encodeBpe(docs, "doc_id", "text", loaded)
      .orderBy("doc_id").collect().toSeq
    assert(viaArtifact == direct)
  }
}
