package graft

import graft.ext.TextStats

/** Exact-assert micro-fixtures for the line/segment dedup operator
  * (the C4/RefinedWeb boilerplate pass, SURVEY.md §7.1 step 8):
  * cross-doc duplicate segments keep-first by doc id, within-doc
  * duplicates keep-first by position, trailing partial segments
  * participate, and tokenless docs survive with an empty result.
  */
class LineDedupSpec extends SparkTestBase {
  import spark.implicits._

  // segWords=3 keeps the fixtures readable: "a b c" is one segment.
  private def run(rows: (Long, String)*) =
    TextStats.lineDedup(rows.toSeq.toDF("doc_id", "text"), "doc_id", "text",
      segWords = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)

  test("cross-doc duplicate segment keeps only the smallest doc id") {
    val out = run(
      1L -> "a b c x y z",
      2L -> "a b c q r s")
    assert(out === Seq(
      (1L, 2L, 2L, "a b c x y z"),
      (2L, 2L, 1L, "q r s")))
  }

  test("within-doc duplicate segment keeps only the first position") {
    val out = run(3L -> "a b c a b c d e f")
    assert(out === Seq((3L, 3L, 2L, "a b c d e f")))
  }

  test("trailing partial segments dedup like full ones") {
    // "g h" is a 2-token trailing segment; doc 5 repeats it → dropped.
    val out = run(
      4L -> "a b c g h",
      5L -> "q r s g h")
    assert(out === Seq(
      (4L, 2L, 2L, "a b c g h"),
      (5L, 2L, 1L, "q r s")))
  }

  test("a doc whose every segment is boilerplate comes back empty") {
    val out = run(
      6L -> "a b c d e f",
      7L -> "a b c",
      8L -> "d e f")
    assert(out === Seq(
      (6L, 2L, 2L, "a b c d e f"),
      (7L, 1L, 0L, ""),
      (8L, 1L, 0L, "")))
  }

  test("tokenless docs are kept with n_segs=0 and empty text") {
    val out = run(9L -> "   ", 10L -> "", 11L -> "k l m")
    assert(out === Seq(
      (9L, 0L, 0L, ""),
      (10L, 0L, 0L, ""),
      (11L, 1L, 1L, "k l m")))
  }

  test("segmentation is case/whitespace-normalized before hashing") {
    val out = run(
      12L -> "A  B   C",
      13L -> "a b c")
    assert(out === Seq(
      (12L, 1L, 1L, "a b c"),
      (13L, 1L, 0L, "")))
  }
}
