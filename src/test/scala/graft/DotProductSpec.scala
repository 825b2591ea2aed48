package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Native DotProduct expression: bit-equality with the
  * higher-order-function fold it replaced, NULL semantics, and the
  * SQL registration through GraftExtensions.
  */
class DotProductSpec extends SparkTestBase {

  private def foldDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("native dot equals the fold bit-for-bit on random vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2 - 1),
        Array.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      foldDot(col("a"), col("b")).as("fold")).collect()
    cmp.foreach { r =>
      // exact: same widening, same summation order
      assert(r.getDouble(0) == r.getDouble(1))
    }
  }

  test("null semantics: null input, length mismatch, null element") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f))).toDF("id", "a", "b")
    val out = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1))
    // length mismatch -> NULL (the fold's zip_with padding gave NULL too)
    val mm = Seq((1L, Array(1.0f, 2.0f), Array(3.0f))).toDF("id", "a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d")).head()
    assert(mm.isNullAt(0))
  }

  test("double-element arrays are accepted, each side independently") {
    import spark.implicits._
    // the fold accepted any numeric array (it widened to double);
    // the native expression must not regress that contract
    val dd = Seq((1L, Array(1.0, 2.0), Array(3.0, 4.0))).toDF("id", "a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d")).head()
    assert(dd.getDouble(0) == 11.0)
    val mixed = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "a")
      .withColumn("b", col("a").cast("array<double>"))
      .select(Similarity.dot(col("a"), col("b")).as("d"),
        Similarity.dot(col("b"), col("a")).as("d2")).head()
    assert(mixed.getDouble(0) == 5.0 && mixed.getDouble(1) == 5.0)
  }

  test("graft_dot is registered in SQL via GraftExtensions") {
    import spark.implicits._
    Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
      .createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_dot(v, v) AS d FROM vecs").head()
    assert(r.getDouble(0) == 14.0)
  }
}
