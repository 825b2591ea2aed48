package graft

import org.apache.spark.sql.functions._
import graft.core.{Rle, SeriesSpec}

/** Property check: Rle.withMarkers/runs must agree with a direct
  * Scala transliteration of the reference's `rle_bool`
  * (ufz_water_qc_pipeline.py:94-103 — np.diff-on-bool is XOR) on
  * arbitrary boolean vectors (seeded random + adversarial shapes).
  */
class RlePropertySpec extends SparkTestBase {

  /** Literal transliteration of rle_bool. */
  private def rleBoolRef(xb: Array[Boolean]): Seq[(Int, Int, Boolean)] = {
    val n = xb.length
    if (n == 0) return Seq.empty
    // c = [True, xb[1:] != xb[:-1], True]; dif = XOR of consecutive
    val c = Array(true) ++ (1 until n).map(i => xb(i) != xb(i - 1)) ++ Array(true)
    val dif = (0 until n).map(j => c(j) != c(j + 1))
    val idx = dif.zipWithIndex.collect { case (true, j) => j }
    idx.zip(idx.drop(1)).map { case (a, b) => (a, b - a, xb(a)) }
  }

  private val spec = SeriesSpec(Seq("series"))

  private def check(flags: Seq[Boolean]): Unit = {
    import spark.implicits._
    val df = flags.zipWithIndex.map { case (f, i) =>
      ("s", java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(15L * i)), f)
    }.toDF("series", "ts", "flag")
    val ours = Rle.runs(df, spec, col("flag"))
      .select(col("__rn"), col("run_len"), col("__xb"))
      .collect()
      .map(r => (r.getAs[Int]("__rn"), r.getAs[Int]("run_len"),
        r.getAs[Boolean]("__xb")))
      .sortBy(_._1).toSeq
    assert(ours == rleBoolRef(flags.toArray), s"flags=${flags.mkString(",")}")
  }

  test("marker runs equal the reference rle_bool on adversarial shapes") {
    check(Seq(true))
    check(Seq(false))
    check(Seq(true, true))
    check(Seq(true, false))
    check(Seq(false, true))
    check(Seq(true, false, true, false, true)) // alternating -> no runs
    check(Seq(false, true, true, false))        // classic truncated run
    check(Seq.fill(12)(true))
    check(Seq.fill(12)(false))
  }

  test("marker runs equal the reference rle_bool on 40 seeded random vectors") {
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 40) {
      val n = 1 + rng.nextInt(40)
      check(Seq.fill(n)(rng.nextBoolean()))
    }
  }
}
