package graft.wrtds

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, File, FileInputStream, FileOutputStream}

import org.apache.spark.TaskContext

/** Spill-capable columnar store for one WRTDS series (the blocked
  * backing store documented at [[Wrtds.proxy]]; reference kernel
  * `scripts/ufz_water_qc_pipeline.py:592-622`).
  *
  * Rows append into fixed-size primitive column blocks of `blockRows`
  * rows (`us/tnum/sv/cv/y/q/fin`). While total appended rows stay at or
  * below `spillAtRows`, completed blocks are kept on-heap; past that
  * threshold every subsequently completed block (including the sealed
  * tail) is written to a single executor-local temp file and its arrays
  * are dropped, so per-task live memory stays O(blockRows) however long
  * the series is. Block order — and therefore row order — is always the
  * append (time-sorted) order: spilling is monotone, so the on-heap
  * prefix precedes the on-disk suffix, and disk blocks are read back in
  * file order.
  *
  * `blocks()` may be called any number of times and the resulting
  * iterators used CONCURRENTLY (the O(n²) kernel nests a j-scan inside
  * an i-scan): each call opens its own buffered reader over the spill
  * file, so cursors never interfere. `close()` is idempotent, closes
  * every reader still open, and deletes the spill file; it is also
  * registered as a task-completion listener so a failed or
  * early-terminated task (e.g. a downstream LIMIT) cannot leak the
  * file until JVM exit.
  */
final class SeriesStore(blockRows: Int, spillAtRows: Int) {
  require(blockRows > 0, s"blockRows must be positive: $blockRows")
  import SeriesStore.Block

  // completed blocks in append order; null slot = spilled to disk
  private val slots = scala.collection.mutable.ArrayBuffer.empty[Block]
  private var spilledCount = 0
  private var spillFile: File = null
  private var spillOut: DataOutputStream = null
  private val readers = new java.util.ArrayList[DataInputStream]()
  private var totalRows = 0L
  private var isSealed = false
  private var isClosed = false

  // fill buffers for the block under construction
  private var cUs = new Array[Long](blockRows)
  private var cTnum = new Array[Double](blockRows)
  private var cSv = new Array[Double](blockRows)
  private var cCv = new Array[Double](blockRows)
  private var cY = new Array[Double](blockRows)
  private var cQ = new Array[Double](blockRows)
  private var cFin = new Array[Boolean](blockRows)
  private var cLen = 0

  locally {
    val tc = TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => close())
  }

  def append(us: Long, tnum: Double, sv: Double, cv: Double, y: Double,
      q: Double, fin: Boolean): Unit = {
    require(!isSealed, "append after seal")
    cUs(cLen) = us; cTnum(cLen) = tnum; cSv(cLen) = sv; cCv(cLen) = cv
    cY(cLen) = y; cQ(cLen) = q; cFin(cLen) = fin
    cLen += 1
    totalRows += 1
    if (cLen == blockRows) finishBlock()
  }

  /** Finalize the tail block; no appends afterwards, reads allowed. */
  def seal(): Unit = {
    if (!isSealed) {
      if (cLen > 0) finishBlock()
      cUs = null; cTnum = null; cSv = null; cCv = null; cY = null
      cQ = null; cFin = null
      if (spillOut != null) { spillOut.close(); spillOut = null }
      isSealed = true
    }
  }

  /** Blocks in append (ascending-time) order. Fresh independent cursor
    * per call — safe to nest/interleave with other live iterators.
    */
  def blocks(): Iterator[Block] = {
    require(isSealed, "blocks() before seal()")
    require(!isClosed, "blocks() after close()")
    val in: DataInputStream =
      if (spilledCount == 0) null
      else {
        val s = new DataInputStream(new BufferedInputStream(
          new FileInputStream(spillFile), 1 << 16))
        readers.synchronized { readers.add(s) }
        s
      }
    new Iterator[Block] {
      private var idx = 0
      def hasNext: Boolean = {
        val h = idx < slots.length
        if (!h && in != null) {
          readers.synchronized { readers.remove(in) }
          in.close()
        }
        h
      }
      def next(): Block = {
        val mem = slots(idx)
        idx += 1
        if (mem != null) mem else SeriesStore.readBlock(in)
      }
    }
  }

  def rows: Long = totalRows

  /** Idempotent: closes writer + all open readers, deletes spill file. */
  def close(): Unit = if (!isClosed) {
    isClosed = true
    if (spillOut != null) { spillOut.close(); spillOut = null }
    readers.synchronized {
      val it = readers.iterator()
      while (it.hasNext) { try it.next().close() catch { case _: Exception => () } }
      readers.clear()
    }
    if (spillFile != null) { spillFile.delete(); spillFile = null }
  }

  private def finishBlock(): Unit = {
    val b = new Block(cLen, cUs, cTnum, cSv, cCv, cY, cQ, cFin)
    if (totalRows > spillAtRows) {
      if (spillOut == null) {
        spillFile = File.createTempFile("graft-seriesstore-", ".bin")
        spillFile.deleteOnExit()
        spillOut = new DataOutputStream(new BufferedOutputStream(
          new FileOutputStream(spillFile), 1 << 16))
      }
      SeriesStore.writeBlock(spillOut, b)
      spilledCount += 1
      slots += null // placeholder keeps append order across mem/disk
    } else {
      slots += b
    }
    if (cLen == blockRows) { // tail-block arrays are nulled by seal()
      cUs = new Array[Long](blockRows); cTnum = new Array[Double](blockRows)
      cSv = new Array[Double](blockRows); cCv = new Array[Double](blockRows)
      cY = new Array[Double](blockRows); cQ = new Array[Double](blockRows)
      cFin = new Array[Boolean](blockRows)
    }
    cLen = 0
  }
}

object SeriesStore {

  /** One immutable column block; arrays may exceed `len` (tail block). */
  final class Block(val len: Int, usA: Array[Long], tnumA: Array[Double],
      svA: Array[Double], cvA: Array[Double], yA: Array[Double],
      qA: Array[Double], finA: Array[Boolean]) {
    def us(i: Int): Long = usA(i)
    def tnum(i: Int): Double = tnumA(i)
    def sv(i: Int): Double = svA(i)
    def cv(i: Int): Double = cvA(i)
    def y(i: Int): Double = yA(i)
    def q(i: Int): Double = qA(i)
    def fin(i: Int): Boolean = finA(i)
  }

  private def writeBlock(out: DataOutputStream, b: Block): Unit = {
    out.writeInt(b.len)
    var i = 0
    while (i < b.len) { out.writeLong(b.us(i)); i += 1 }
    i = 0
    while (i < b.len) { out.writeDouble(b.tnum(i)); i += 1 }
    i = 0
    while (i < b.len) { out.writeDouble(b.sv(i)); i += 1 }
    i = 0
    while (i < b.len) { out.writeDouble(b.cv(i)); i += 1 }
    i = 0
    while (i < b.len) { out.writeDouble(b.y(i)); i += 1 }
    i = 0
    while (i < b.len) { out.writeDouble(b.q(i)); i += 1 }
    i = 0
    while (i < b.len) { out.writeBoolean(b.fin(i)); i += 1 }
  }

  private def readBlock(in: DataInputStream): Block = {
    val len = in.readInt()
    val us = new Array[Long](len)
    val tnum = new Array[Double](len)
    val sv = new Array[Double](len)
    val cv = new Array[Double](len)
    val y = new Array[Double](len)
    val q = new Array[Double](len)
    val fin = new Array[Boolean](len)
    var i = 0
    while (i < len) { us(i) = in.readLong(); i += 1 }
    i = 0
    while (i < len) { tnum(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < len) { sv(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < len) { cv(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < len) { y(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < len) { q(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < len) { fin(i) = in.readBoolean(); i += 1 }
    new Block(len, us, tnum, sv, cv, y, q, fin)
  }
}
