package graft

import org.apache.spark.sql.functions._

import graft.ext.TextStats

/** Misra-Gries sketch aggregate + two-pass exact heavy hitters.
  * The sketch's containment guarantee (every item with frequency
  * > n/(capacity+1) survives) must hold for ANY partition layout and
  * merge order, so the property test drives skewed streams through
  * many small partitions — the worst case for mergeable-summary error
  * accumulation — with capacity far below the vocabulary size.
  */
class HeavyHittersSpec extends SparkTestBase {

  test("MG sketch contains every frequent item under skew and repartitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    for (trial <- 1 to 5) {
      // zipf-ish: few hot items over a long uniform tail, vocab >> capacity
      val hot = (1 to 8).flatMap(i => Seq.fill(200 * i)(s"hot_$i"))
      val tail = (1 to 4000).map(i => s"tail_${rng.nextInt(2000)}_$i")
      val items = rng.shuffle(hot ++ tail)
      val n = items.size.toLong
      val capacity = 32
      val df = items.toDF("token").repartition(13 + trial)
      val sketch = df
        .agg(call_function("graft_heavy_hitters", col("token"), lit(capacity)))
        .head().getMap[String, Long](0)
      val exact = items.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val guarantee = n / (capacity + 1)
      for ((tok, cnt) <- exact if cnt > guarantee)
        assert(sketch.contains(tok),
          s"trial $trial: frequent item $tok (count $cnt > $guarantee) missing")
      assert(sketch.size <= capacity)
      // estimates never exceed true counts and undershoot by <= n/(cap+1)
      for ((tok, est) <- sketch) {
        val truth = exact.getOrElse(tok, 0L)
        assert(est <= truth && truth - est <= guarantee,
          s"trial $trial: estimate $est for $tok outside [truth-$guarantee, truth]")
      }
    }
  }

  test("two-pass heavy hitters equals the exact unbounded group-by") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // docs with hot words well above 2% and a diffuse tail below it
    val docs = (1L to 60L).map { i =>
      val words = Seq.fill(10)("alpha") ++ Seq.fill(6)("beta") ++
        (1 to 30).map(_ => s"rare${rng.nextInt(500)}")
      (i, rng.shuffle(words).mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextStats.heavyHitterTokens(docs, "doc_id", "text",
      capacity = 63, supportPpm = 20000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val toks = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "")
    val total = toks.count()
    val expected = toks.groupBy("t").count().collect()
      .filter(r => r.getLong(1) * 1000000L >= total * 20000L)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == expected)
    assert(out.contains("alpha") && out.contains("beta"))
  }

  test("heavyHitterTokens rejects a capacity too small for the support") {
    import spark.implicits._
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextStats.heavyHitterTokens(d, "doc_id", "text",
        capacity = 9, supportPpm = 10000L)
    }
  }
}
