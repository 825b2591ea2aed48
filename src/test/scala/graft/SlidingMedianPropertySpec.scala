package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Property check for the two-heap lazy-deletion sliding median —
  * no Spark involved: drive the structure exactly as the exec does
  * (arrivals lead emission by the sibling-frame lookahead, adjustTo
  * per emitted index) over adversarial value streams (heavy
  * duplicates, few distinct values, nulls, signed zero) and random
  * frames, comparing every emitted median with the naive
  * sorted-frame computation. 400 seeded random cases.
  */
class SlidingMedianPropertySpec extends AnyFunSuite {

  private def naiveMedian(vals: Seq[Double]): Option[Double] =
    if (vals.isEmpty) None
    else {
      val s = vals.sorted
      val n = s.length
      Some((s((n - 1) / 2) + s(n / 2)) / 2.0)
    }

  private def genValue(rng: scala.util.Random): Option[Double] =
    rng.nextInt(16) match {
      case 0 | 1 => None
      case 2 | 3 | 4 | 5 | 6 => Some(5.0) // boundary duplicates
      case 7 | 8 | 9 => Some(rng.nextInt(4).toDouble) // few distinct
      case 10 => Some(-0.0) // signed-zero bit identity in the ledger
      case _ => Some((rng.nextInt(2001) - 1000) / 10.0)
    }

  test("streamed medians equal the naive sorted-frame median on random streams") {
    val rng = new scala.util.Random(1234)
    for (caseNo <- 0 until 400) {
      val n = 1 + rng.nextInt(120)
      val arr = Array.fill(n)(genValue(rng))
      val before = rng.nextInt(13)
      val after = rng.nextInt(13)
      val maxAfter = after + rng.nextInt(6) // simulates larger sibling frames
      val w = new SlidingMedianWindow(before, before + maxAfter + 2)
      var arrived = 0
      for (i <- 0 until n) {
        while (arrived < math.min(n, i + maxAfter + 1)) {
          arr(arrived) match {
            case Some(v) => w.arrive(v)
            case None => w.arriveNull()
          }
          arrived += 1
        }
        val frameEnd = math.min(i + after, n - 1)
        w.adjustTo(i, frameEnd)
        val frame = (math.max(0, i - before) to frameEnd).flatMap(j => arr(j))
        assert(w.validCount == frame.size,
          s"case $caseNo: validCount ${w.validCount} != ${frame.size} at i=$i " +
            s"(before=$before after=$after)")
        naiveMedian(frame).foreach { m =>
          val got = w.median()
          assert(java.lang.Double.compare(got, m) == 0 || got == m,
            s"case $caseNo: median $got != $m at i=$i frame=$frame " +
              s"(before=$before after=$after maxAfter=$maxAfter)")
        }
      }
    }
  }
}
