package graft

import org.apache.spark.sql.functions._
import graft.ext.{Similarity, TextStats}

/** Contract fixtures for the retrieve→rerank stage and the bucketed
  * packer: rerank only permutes/prunes the retrieval candidate set,
  * scores stay in [-1, 1]-ish blend range, and bucketed packing
  * respects the budget within each (shard, bucket).
  */
class RerankSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = {
    // 30 deterministic 8-dim vectors with sign structure
    val rows = (0L until 30L).map { i =>
      val v = (0 until 8).map(j =>
        (math.sin(i * 7 + j * 3) * (if ((i + j) % 3 == 0) -1 else 1)).toFloat)
      (i, v.toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("rerank output is a subset of the retrieval candidates, re-ranked") {
    val queries = emb.filter(col("vec_id") < 3)
    val cands = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rr = Similarity.rerankTopK(queries, emb, "vec_id", "embedding",
      kRetrieve = 10, kFinal = 4).collect()
    assert(rr.length === 12) // 3 queries × 4
    rr.foreach { r =>
      assert(cands.contains((r.getLong(0), r.getLong(1))),
        s"reranked pair not in candidate set: $r")
    }
    // ranks are 1..4 per query, ordered by rerank_score desc
    rr.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq === (1 to 4))
      val scores = sorted.map(_.getDouble(3)).toSeq
      assert(scores === scores.sorted.reverse, s"scores not descending: $scores")
    }
  }

  test("bucketed packing keeps batches within budget except oversized docs") {
    val docs = (1L to 200L).map(i => (i, ("w " * (i % 40 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val packed = TextStats.packBatchesBucketed(docs, "doc_id", "text",
      budgetTokens = 50, nShards = 4, nBuckets = 3)
    val batches = packed.groupBy("shard", "len_bucket", "batch")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("k"))
      .collect()
    batches.foreach { b =>
      val tot = b.getAs[Long]("tot")
      // greedy fill: a batch only exceeds budget by its boundary doc
      assert(tot < 50 + 40, s"batch grossly over budget: $b")
    }
    // buckets are length-homogeneous: within a shard, every bucket-2 doc
    // is at least as long as every bucket-1 doc
    val byShard = packed.collect().groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, rows) =>
      val byBucket = rows.groupBy(_.getAs[Int]("len_bucket"))
        .map { case (b, rs) => b -> rs.map(_.getAs[Long]("n_tokens")) }
      for (b <- byBucket.keys if byBucket.contains(b + 1)) {
        assert(byBucket(b).max <= byBucket(b + 1).min,
          s"bucket $b overlaps bucket ${b + 1}")
      }
    }
  }
}
