package graft

import org.apache.spark.sql.functions._
import graft.core.Salt

/** Skew-salting: the two-stage salted aggregation must be
  * BIT-identical to the direct single-stage groupBy (that is the whole
  * point of routing the sum through exact decimals — a double sum
  * would drift with summation order and salting would change results).
  */
class SaltSpec extends SparkTestBase {

  test("salted two-stage agg equals direct groupBy exactly") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // one pathologically hot key + two small ones
    val rows = (0 until 5000).map { i =>
      val k = if (i % 10 < 8) "hot" else if (i % 2 == 0) "a" else "b"
      (k, i.toLong, rng.nextDouble() * 100.0)
    }
    val df = rows.toDF("k", "rid", "v")
    val salted = Salt.skewAgg(df, Seq("k"), col("v"), col("rid"), nSalts = 16)
      .orderBy("k").collect()
    val direct = df.groupBy("k").agg(
      count(col("v")).as("n"),
      sum(round(col("v"), 3).cast(org.apache.spark.sql.types.DecimalType(30, 3)))
        .cast("double").as("sum_val"),
      min(col("v")).as("min_val"), max(col("v")).as("max_val"))
      .orderBy("k").collect()
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (s, d) =>
      assert(s.getString(0) == d.getString(0))
      assert(s.getLong(1) == d.getLong(1))
      assert(s.getDouble(2) == d.getDouble(2)) // exact, not approx
      assert(s.getDouble(3) == d.getDouble(3))
      assert(s.getDouble(4) == d.getDouble(4))
    }
  }

  test("salted replicated join equals the plain equi-join row set") {
    import spark.implicits._
    val big = (0 until 4000).map { i =>
      (if (i % 10 < 9) "hot" else "cold", i.toLong) // 90% one key
    }.toDF("k", "rid")
    val dim = Seq(("hot", 1), ("cold", 2), ("absent", 3)).toDF("k", "attr")
    val salted = Salt.skewJoin(big, dim, Seq("k"), col("rid"), nSalts = 8)
      .select("k", "rid", "attr")
    val plain = big.join(dim, Seq("k")).select("k", "rid", "attr")
    assert(salted.orderBy("rid").collect.toSeq ==
      plain.orderBy("rid").collect.toSeq)
    assert(salted.count() == 4000) // inner join, every big row matched
  }

  test("salt spreads a hot key over the requested sub-groups") {
    import spark.implicits._
    val df = (0 until 1000).map(i => ("hot", i.toLong, 1.0)).toDF("k", "rid", "v")
    val nDistinct = df.select(Salt.saltFrom(col("rid"), 8).as("s"))
      .distinct().count()
    assert(nDistinct == 8)
  }
}
