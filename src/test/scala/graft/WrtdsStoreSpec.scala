package graft

import org.apache.spark.sql.functions._
import graft.core.SeriesSpec
import graft.wrtds.{SeriesStore, Wrtds}

/** SeriesStore contract + blocked-kernel equivalence: the spilled
  * block path must be bit-identical to the all-in-memory path
  * (Wrtds.proxy doc, "Numerics are bit-identical to the materialized
  * form"). This is the test whose absence let round 4 ship a consumer
  * of a class that didn't exist.
  */
class WrtdsStoreSpec extends SparkTestBase {

  private def fill(store: SeriesStore, n: Int): Unit = {
    (0 until n).foreach { i =>
      store.append(i.toLong * 1000L, i * 0.5, math.sin(i), math.cos(i),
        if (i % 7 == 0) Double.NaN else i * 1.5, i * 2.0, i % 7 != 0)
    }
    store.seal()
  }

  private def drain(store: SeriesStore): Seq[(Long, Double, Double, Double, Double, Double, Boolean)] =
    store.blocks().flatMap { b =>
      (0 until b.len).map(i =>
        (b.us(i), b.tnum(i), b.sv(i), b.cv(i), b.y(i), b.q(i), b.fin(i)))
    }.toList

  private def spillFiles(): Set[String] = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("graft-seriesstore-")).toSet
  }

  test("store preserves append order across memory and spilled blocks") {
    val before = spillFiles()
    // blockRows=16, spill past 40 rows, 100 rows total: blocks 1-3
    // stay on heap (rows 1..48 complete at <=40? rows counted at block
    // completion: block boundaries at 16,32,48,... -> totalRows>40 from
    // the 48-row block on) => mixed mem-prefix + disk-suffix layout
    val store = new SeriesStore(blockRows = 16, spillAtRows = 40)
    fill(store, 100)
    assert(spillFiles().size > before.size, "expected a spill file")
    val rows = drain(store)
    assert(rows.length == 100)
    assert(rows.map(_._1) == (0 until 100).map(_.toLong * 1000L))
    // NaN-aware value check on a spilled row (y of i=71 = 106.5)
    assert(rows(71)._5 == 106.5 && rows(71)._7)
    assert(rows(71)._2 == 35.5)
    assert(rows(7)._5.isNaN && !rows(7)._7) // i%7==0 -> NaN y, fin=false
    store.close()
    assert(spillFiles() == before, "close() must delete the spill file")
  }

  test("blocks() cursors are independent (nested concurrent iteration)") {
    val store = new SeriesStore(blockRows = 8, spillAtRows = 10)
    fill(store, 50)
    // nested scan like the O(n^2) kernel: for each i-block, full j-scan
    var crossCount = 0L
    var usSum = 0L
    store.blocks().foreach { ib =>
      store.blocks().foreach { jb => crossCount += ib.len.toLong * jb.len }
      (0 until ib.len).foreach(i => usSum += ib.us(i))
    }
    assert(crossCount == 50L * 50L)
    assert(usSum == (0 until 50).map(_.toLong * 1000L).sum)
    store.close()
  }

  test("close() is idempotent and safe mid-iteration") {
    val store = new SeriesStore(blockRows = 4, spillAtRows = 4)
    fill(store, 20)
    val it = store.blocks()
    it.next() // leave the reader open mid-stream
    store.close()
    store.close() // idempotent
    intercept[IllegalArgumentException](store.blocks())
  }

  test("proxy blocked/spilled path is bit-identical to in-memory path") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      ("s" + (i % 3),
        java.time.LocalDateTime.of(2021, 3, 1, 6, 0, 0).plusDays(i.toLong)
          .toString.replace('T', ' '),
        if (i % 11 == 0) null
        else java.lang.Double.valueOf(20 + 6 * math.sin(2 * math.Pi * i / 365.25) + rng.nextDouble()))
    }
    val df = rows.toDF("series", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s"))
      .select("series", "ts", "value")
    val spec = SeriesSpec(Seq("series"))
    def dump(blockRows: Int, spillAtRows: Int) =
      Wrtds.proxy(df, spec, htDays = 45.0, minp = 10,
        blockRows = blockRows, spillAtRows = spillAtRows)
        .select($"series", $"ts", $"wrtds_yhat", $"wrtds_resid")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
          Option(r.get(2)), Option(r.get(3)))).sortBy(t => (t._1, t._2))
    val mem = dump(1 << 16, 1 << 20) // everything in one block, no spill
    val spilled = dump(16, 20)       // many blocks, all but one spilled
    assert(mem.length == 300 && (mem sameElements spilled),
      "blocked/spilled kernel must match the materialized kernel exactly")
  }
}
