package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.ext.{Sampling, TextStats}

/** Micro-fixtures for the curation operators added in round 7's third
  * wave: PII redaction, URL/domain blocklist stats, and
  * temperature-scaled source mixing weights.
  */
class CurationSpec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("piiRedact masks all four classes and counts each on the original") {
    val df = docs(
      1L -> "mail me at jo.doe+x@corp.example.org or call 415-555-0199 now",
      2L -> "server 10.0.3.77 and 192.168.1.1 ; acct 004420001999 ok",
      3L -> "plain text, nothing to scrub 12345678",  // 8 digits: no match
      4L -> "+44 555-123-4567 and a@b.io")
    val out = TextStats.piiRedact(df, "doc_id", "text")
      .orderBy("doc_id").collect()

    assert(out(0).getString(1) ===
      "mail me at <EMAIL> or call <PHONE> now")
    assert(out(0).getInt(2) === 1 && out(0).getInt(3) === 1)
    assert(out(1).getString(1) === "server <IP> and <IP> ; acct <ID> ok")
    assert(out(1).getInt(4) === 2 && out(1).getInt(5) === 1)
    // 8-digit run is below the 9-digit ID threshold — untouched
    assert(out(2).getString(1) === "plain text, nothing to scrub 12345678")
    assert(Seq(2, 3, 4, 5).forall(i => out(2).getInt(i) === 0))
    // "+44 555-123-4567": the optional + binds to the 3-3-4 core only
    assert(out(3).getString(1) === "+44 <PHONE> and <EMAIL>")
  }

  test("domainStats: counts, sorted-distinct csv, blocklist flag, empty doc") {
    val df = docs(
      1L -> "see https://A.example.com/p http://cdn.example.net/x https://a.example.com/q",
      2L -> "only https://bad0.spam.io/z here",
      3L -> "no urls at all")
    val out = TextStats.domainStats(df, "doc_id", "text",
      blocklist = Seq("bad0.spam.io")).orderBy("doc_id").collect()

    // case-folded: A.example.com and a.example.com are one domain
    assert(out(0).getInt(1) === 3 && out(0).getInt(2) === 2)
    assert(out(0).getString(3) === "a.example.com,cdn.example.net")
    assert(!out(0).getBoolean(4))
    assert(out(1).getBoolean(4) && out(1).getString(3) === "bad0.spam.io")
    assert(out(2).getInt(1) === 0 && out(2).getString(3) === "" &&
      !out(2).getBoolean(4))
  }

  test("domainStats and piiRedact are zero-shuffle map-only plans") {
    val df = docs(1L -> "x https://a.b/c 415-555-0100")
    val dPlan = TextStats.domainStats(df, "doc_id", "text", Seq("a.b"))
      .queryExecution.executedPlan
    assert(dPlan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
    val pPlan = TextStats.piiRedact(df, "doc_id", "text")
      .queryExecution.executedPlan
    assert(pPlan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
  }

  test("budgetSelect never funnels the corpus through one partition") {
    import spark.implicits._
    // a corpus-sized input with many distinct quality values: the only
    // single-partition exchange allowed is the one over the per-quality
    // AGGREGATE (corpus-size-independent); the per-doc window must stay
    // hash-partitioned on quality.
    val df = spark.range(10000)
      .select(col("id").as("doc_id"),
        (col("id") % 97).cast("double").as("q"), lit(10L).as("t"))
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try Sampling.budgetSelect(df, "doc_id", col("q"), col("t"),
        budget = 1000L).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    val singles = plan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.numPartitions == 1 => e
    }
    assert(singles.nonEmpty, "expected the aggregated-table window stage")
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    singles.foreach { e =>
      assert(e.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        s"single-partition exchange not above an aggregate:\n$e")
    }
  }

  test("domainStatsJoin equals domainStats on the same inputs") {
    import spark.implicits._
    val df = docs(
      1L -> "see https://A.example.com/p http://cdn.example.net/x https://a.example.com/q",
      2L -> "only https://bad0.spam.io/z here",
      3L -> "no urls at all")
    val bl = Seq("bad0.spam.io")
    val lit = TextStats.domainStats(df, "doc_id", "text", bl)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val join = TextStats.domainStatsJoin(df, "doc_id", "text",
        bl.toDF("domain"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(join === lit)
  }

  test("temperatureWeights: alpha=1 keeps natural shares, alpha=0 is uniform") {
    import spark.implicits._
    val df = Seq(("s0", 900L), ("s1", 100L)).toDF("source", "n")
    val nat = Sampling.temperatureWeights(df, "source", "n", alpha = 1.0)
      .orderBy("source").collect()
    assert(nat(0).getDouble(2) === 0.9 && nat(0).getDouble(3) === 0.9)
    assert(nat(1).getDouble(3) === 0.1)
    assert(nat(0).getDouble(4) === 1.0 && nat(1).getDouble(4) === 1.0)

    val uni = Sampling.temperatureWeights(df, "source", "n", alpha = 0.0)
      .orderBy("source").collect()
    assert(uni(0).getDouble(3) === 0.5 && uni(1).getDouble(3) === 0.5)
    // uniform mixing oversamples the tail source 5x, halves the head
    assert(uni(0).getDouble(4) === 0.555556 && uni(1).getDouble(4) === 5.0)
  }

  test("temperatureWeights: alpha=0.5 on perfect squares is exact") {
    // sqrt weights 3:1 from a 9:1 size ratio
    import spark.implicits._
    val df = Seq(("s0", 90000L), ("s1", 10000L)).toDF("source", "n")
    val out = Sampling.temperatureWeights(df, "source", "n", alpha = 0.5)
      .orderBy("source").collect()
    assert(out(0).getDouble(3) === 0.75 && out(1).getDouble(3) === 0.25)
    assert(out(1).getDouble(4) === 2.5)  // tail upweighted 2.5x
  }

  test("crossSourceMatrix: cross pairs once per family, diagonal within-source") {
    import spark.implicits._
    // family "x": in A (twice) and B → (A,B) cross + (A,A) within
    // family "y": in A and C → (A,C) cross
    // family "z": only in B, once → nowhere
    val df = Seq(
      (1L, "x", "A"), (2L, " X ", "A"), (3L, "x", "B"),
      (4L, "y", "A"), (5L, "y", "C"),
      (6L, "z", "B")).toDF("doc_id", "text", "source")
    val out = ext.Dedup.crossSourceMatrix(df, "doc_id", "text", "source")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("A", "A", 1L), ("A", "B", 1L), ("A", "C", 1L)))
  }

  test("snapshotDiff labels added/removed/changed/unchanged") {
    import spark.implicits._
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newV = Seq((2L, "b"), (3L, "C "), (4L, "d")).toDF("doc_id", "text")
    val out = ext.Dedup.snapshotDiff(oldV, newV, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // "C " normalizes to "c" → unchanged despite the raw-text delta
    assert(out.toSeq === Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "unchanged"), (4L, "added")))

    val changed = ext.Dedup.snapshotDiff(
      Seq((9L, "x")).toDF("doc_id", "text"),
      Seq((9L, "y")).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(changed.head.getString(1) === "changed")

    // presence beats hash nullability: a doc present in BOTH snapshots
    // with NULL text has NULL hashes on both sides — it must classify
    // as changed (matching the oracle's NULL-equality semantics),
    // never as added; NULL-text only on one side is changed too.
    val nullText = ext.Dedup.snapshotDiff(
      Seq((1L, null: String), (2L, "a"), (3L, null: String))
        .toDF("doc_id", "text"),
      Seq((1L, null: String), (2L, null: String), (4L, null: String))
        .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(nullText.toSeq === Seq((1L, "changed"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
  }

  test("budgetSelect is row-count-stable for NULL quality (sorted last)") {
    import spark.implicits._
    val df = Seq((1L, Some(0.9), 5L), (2L, None, 3L), (3L, Some(0.5), 4L))
      .toDF("doc_id", "q", "t")
    val out = Sampling.budgetSelect(df, "doc_id", col("q"), col("t"),
      budget = 9L).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    // order: 0.9 (5) kept, 0.5 (cum 9) kept, NULL last (cum 12) dropped
    assert(out.toSeq === Seq((1L, true), (2L, false), (3L, true)))
  }

  test("piiRedact: digit run inside an email is an email, not an ID run") {
    val out = TextStats.piiRedact(
      docs(1L -> "write 123456789@x.com now"), "doc_id", "text").collect()
    assert(out.head.getString(1) === "write <EMAIL> now")
    assert(out.head.getInt(2) === 1 && out.head.getInt(5) === 0)
  }

  test("budgetSelect keeps the strict quality-ordered prefix within budget") {
    import spark.implicits._
    // order: q=.9 id1 (5), q=.9 id4 (4) [cum 9], q=.5 id2 (3) [cum 12>10
    // → dropped], q=.5 id3 (1) [cum 13 → dropped: strict prefix, no
    // skip-and-refill], q=.1 id5 (1) [dropped]
    val df = Seq(
      (1L, 0.9, 5L), (4L, 0.9, 4L), (2L, 0.5, 3L), (3L, 0.5, 1L),
      (5L, 0.1, 1L)).toDF("doc_id", "q", "t")
    val out = Sampling.budgetSelect(df, "doc_id", col("q"), col("t"),
      budget = 10L).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    assert(out.toSeq === Seq((1L, true), (2L, false), (3L, false),
      (4L, true), (5L, false)))
  }

  test("ngramNovelty: unique doc scores 1, exact dups 0, short docs null") {
    import spark.implicits._
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, (100 to 120).map(i => s"u$i").mkString(" ")), // fully novel
      (2L, base), (3L, base), // exact dups: every gram shared
      (4L, "a b"), // too short for 3-grams
      // 5 shares w1..w10's grams with 2/3 but adds a novel tail
      (5L, (1 to 10).map(i => s"w$i").mkString(" ") + " " +
        (200 to 209).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.ext.TextStats.ngramNovelty(d, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("novelty") == 1.0)
    assert(out(1).getAs[Double]("novelty") == 0.0)
    assert(out(2).getAs[Double]("novelty") == 0.0)
    assert(out(3).getAs[Long]("n_grams") == 0L &&
      out(3).isNullAt(out(3).fieldIndex("novelty")))
    // doc 5: 18 grams; w1..w8-start grams (8) are shared with 2/3,
    // the w9/w10→v-tail bridge grams and the v-tail grams are novel
    assert(out(4).getAs[Long]("n_grams") == 18L)
    assert(out(4).getAs[Long]("n_novel") == 10L)
    assert(out(4).getAs[Double]("novelty") == 10.0 / 18.0)
  }

  test("leakageSafeSplitNear: near-dup variants land in ONE family and split") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, base),
      (2L, base + " " + base), // hamming-0 variant (scale-invariant)
      (3L, base), // exact dup
      (4L, (100 to 160).map(i => s"v$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplitNear(d, "doc_id", "text",
      maxDist = 3).orderBy("doc_id").collect()
    val fam = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("family_id")).toMap
    val spl = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(fam(1L) == 1L && fam(2L) == 1L && fam(3L) == 1L, s"fam=$fam")
    assert(spl(1L) == spl(2L) && spl(2L) == spl(3L))
    assert(fam(4L) == 4L)
    // family routing matches the exact-form convention: bucket =
    // hash60(family_id as string) % 10000
    out.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 0 && b < 10000)
      val s = r.getAs[String]("split")
      assert(if (b < 9000) s == "train" else if (b < 9500) s == "val"
        else s == "test")
    }
  }

  test("familyRegistry reproduces the batch near-split's families on the same snapshot") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> (base + " " + base), 3L -> base,
      4L -> other)
    val reg = Sampling.familyRegistry(d, "doc_id", "text", maxDist = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Sampling.leakageSafeSplitNear(d, "doc_id", "text",
      maxDist = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("family_id")).toMap
    assert(reg === batch)
  }

  test("assignFamiliesIncremental: inherit / mint / zero churn across two ingests") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val novel = (200 to 260).map(i => s"x$i").mkString(" ")
    val novel2 = (300 to 360).map(i => s"y$i").mkString(" ")
    val corpus = docs(1L -> base, 3L -> base, 5L -> other)
    val reg0 = Sampling.familyRegistry(corpus, "doc_id", "text", maxDist = 3)
    val reg0Rows = reg0.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reg0Rows === Set((1L, 1L), (3L, 1L), (5L, 5L)))

    // ingest 1: doc 10 near-dups base → inherits family 1; docs 12+14
    // are an intra-batch novel pair → ONE new family = min batch id 12
    val b1 = docs(10L -> (base + " " + base), 12L -> novel, 14L -> novel)
    val a1 = Sampling.assignFamiliesIncremental(b1, reg0, "doc_id", "text",
      maxDist = 3)
    val a1m = a1.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(a1m === Map(10L -> ((1L, false)), 12L -> ((12L, true)),
      14L -> ((12L, true))))

    // registry extension is a pure union — no re-fingerprinting pass
    val reg1 = reg0.unionByName(a1.select(col("doc_id"), col("family_id"),
      col("simhash")))
    // zero churn BY CONSTRUCTION: the union kept every reg0 row intact
    val reg1Map = reg1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    reg0Rows.foreach { case (id, fam) => assert(reg1Map(id) == fam) }

    // ingest 2: doc 20 near-dups ingest-1's minted family → inherits 12
    // (NOT renumbered to 20); doc 22 still novel
    val b2 = docs(20L -> novel, 22L -> novel2)
    val a2m = Sampling.assignFamiliesIncremental(b2, reg1, "doc_id", "text",
      maxDist = 3).collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(a2m === Map(20L -> ((12L, false)), 22L -> ((22L, true))))
  }

  test("family registry round-trips through parquet — the persisted-artifact shape") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val corpus = docs(1L -> base, 3L -> base)
    val reg = Sampling.familyRegistry(corpus, "doc_id", "text", maxDist = 3)
    val dir = java.nio.file.Files.createTempDirectory("fam_reg").toString
    try {
      reg.write.mode("overwrite").parquet(dir)
      val loaded = spark.read.parquet(dir)
      // assignment against the LOADED registry equals assignment
      // against the live one — no column (incl. the nullable simhash)
      // loses fidelity in the round trip
      val b = docs(10L -> (base + " " + base), 12L -> (null: String))
      val viaLive = Sampling.assignFamiliesIncremental(b, reg,
        "doc_id", "text", maxDist = 3).orderBy("doc_id").collect().toSeq
      val viaLoaded = Sampling.assignFamiliesIncremental(b, loaded,
        "doc_id", "text", maxDist = 3).orderBy("doc_id").collect().toSeq
      assert(viaLive == viaLoaded)
      assert(viaLoaded.map(_.getLong(1)) == Seq(1L, 12L))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("assignFamiliesIncremental: multi-hit component routes to the OLDEST family") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val batch = docs(30L -> base)
    // handcrafted registry: two distinct families whose fingerprints
    // both sit within maxDist of the batch doc (the bridging shape a
    // text fixture can't pin exactly) — the component must inherit
    // min(family_id)=2, and family 9 keeps its rows untouched
    val sh = graft.ext.Dedup.simHash(batch, "doc_id", "text")
      .collect()(0).getLong(1)
    val reg = Seq((2L, 2L, sh), (9L, 9L, sh ^ 1L))
      .toDF("doc_id", "family_id", "simhash")
    val out = Sampling.assignFamiliesIncremental(batch, reg, "doc_id",
      "text", maxDist = 3).collect()
    assert(out.length == 1 && out(0).getLong(1) == 2L &&
      !out(0).getBoolean(2))
  }

  test("assignFamiliesIncremental: NULL-text doc mints its own family, null simhash") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val corpus = docs(1L -> base)
    val reg = Sampling.familyRegistry(corpus, "doc_id", "text", maxDist = 3)
    val nullDoc = docs(40L -> (null: String))
    val out = Sampling.assignFamiliesIncremental(nullDoc, reg,
      "doc_id", "text", maxDist = 3).collect()
    assert(out.length == 1 && out(0).getLong(1) == 40L &&
      out(0).getBoolean(2) && out(0).isNullAt(3))
    // and familySplit routes it deterministically off the family id
    val s = Sampling.familySplit(
      Sampling.assignFamiliesIncremental(nullDoc, reg,
        "doc_id", "text", maxDist = 3)).collect()(0)
    val b = s.getAs[Int]("bucket")
    assert(b >= 0 && b < 10000)
  }

  test("keepScore: fixed calibration over four signals; absent signals score 0") {
    import spark.implicits._
    val base = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val lm = Seq((1L, 8.0), (2L, 24.0), (4L, 8.0))
      .toDF("doc_id", "bits_per_token")
    val rep = Seq((1L, 0.25), (2L, 0.0), (4L, 0.0))
      .toDF("doc_id", "dup_word_frac")
    val pii = Seq((1L, 0, 0, 0, 0), (2L, 1, 1, 1, 1), (3L, 0, 0, 0, 0))
      .toDF("doc_id", "n_emails", "n_phones", "n_ips", "n_id_runs")
    val dom = Seq((1L, false), (2L, true), (3L, false))
      .toDF("doc_id", "blocked")
    val out = TextStats.keepScore(base, "doc_id", lm, rep, pii, dom,
      threshold = 0.5).orderBy("doc_id").collect()
    // doc 1: s_lm=1−8/16=0.5, s_rep=0.75, s_pii=1, s_dom=1
    //        → 0.4·0.5 + 0.3·0.75 + 0.2 + 0.1 = 0.725, keep
    assert(math.abs(out(0).getDouble(5) - 0.725) < 1e-12)
    assert(out(0).getBoolean(6))
    // doc 2: s_lm floors at 0 (24 ≥ 16 bits), s_rep=1, s_pii=1/5,
    //        blocked → s_dom=0 → 0.3 + 0.04 = 0.34, drop
    assert(out(1).getDouble(1) === 0.0)
    assert(math.abs(out(1).getDouble(5) - 0.34) < 1e-12)
    assert(!out(1).getBoolean(6))
    // doc 3: lm/rep signals ABSENT → 0 contribution; clean pii +
    //        unblocked → 0.2 + 0.1 = 0.3, drop
    assert(out(2).getDouble(1) === 0.0 && out(2).getDouble(2) === 0.0)
    assert(math.abs(out(2).getDouble(5) - 0.3) < 1e-12)
    assert(!out(2).getBoolean(6))
    // doc 4: pii/domain signals ABSENT → 0 contribution (NOT the
    // presence-with-zero-findings best score docs 1/3 get); good
    // lm/rep → 0.4·0.5 + 0.3·1.0 = 0.5, keep at threshold
    assert(out(3).getDouble(3) === 0.0 && out(3).getDouble(4) === 0.0)
    assert(math.abs(out(3).getDouble(5) - 0.5) < 1e-12)
    assert(out(3).getBoolean(6))
  }

  test("keepScore: a pii row with NULL sibling counts never yields a NULL score") {
    import spark.implicits._
    // doc 1: present pii row with one non-null count and NULL siblings
    // — the combiner must coalesce per column, not propagate NULL into
    // keep_score (the never-null contract); doc 2: all-null pii row ≡
    // absence, scores 0 on the pii component.
    val base = Seq(1L, 2L).toDF("doc_id")
    val lm = Seq((1L, 8.0), (2L, 8.0)).toDF("doc_id", "bits_per_token")
    val rep = Seq((1L, 0.0), (2L, 0.0)).toDF("doc_id", "dup_word_frac")
    val pii = Seq(
      (1L, Some(4), None: Option[Int], None: Option[Int], None: Option[Int]),
      (2L, None: Option[Int], None: Option[Int], None: Option[Int],
        None: Option[Int]))
      .toDF("doc_id", "n_emails", "n_phones", "n_ips", "n_id_runs")
    val dom = Seq((1L, false), (2L, false)).toDF("doc_id", "blocked")
    val out = TextStats.keepScore(base, "doc_id", lm, rep, pii, dom,
      threshold = 0.5).orderBy("doc_id").collect()
    // doc 1: s_pii = 1/(1+4) = 0.2 → 0.4·0.5 + 0.3 + 0.2·0.2 + 0.1 = 0.64
    assert(math.abs(out(0).getDouble(3) - 0.2) < 1e-12)
    assert(math.abs(out(0).getDouble(5) - 0.64) < 1e-12)
    // doc 2: all-null pii row is absence → s_pii = 0
    assert(out(1).getDouble(3) === 0.0)
    out.foreach(r => assert(!r.isNullAt(5), s"NULL keep_score: $r"))
  }

  test("psiDrift: stable window scores 0, flipped distribution scores 2*0.4*ln(7/3)") {
    import spark.implicits._
    // windows of 100us, 2 bins over [0,10): window 0 = [3 low, 1 high],
    // window 1 = same (stable), window 2 = [1 low, 3 high] (flipped)
    val rows = Seq(
      (0L, 1.0), (10L, 1.0), (20L, 1.0), (30L, 8.0),
      (100L, 1.0), (110L, 1.0), (120L, 1.0), (130L, 8.0),
      (200L, 8.0), (210L, 8.0), (220L, 8.0), (230L, 1.0))
      .map { case (t, v) => ("a", t, v) }
    val out = graft.operators.Diagnostics.psiDrift(
        rows.toDF("g", "ts_us", "v"), Seq("g"), "ts_us", "v",
        windowUs = 100L, lo = 0.0, hi = 10.0, nBins = 2)
      .orderBy("window_id").collect()
    assert(out.length === 2) // windows 1 and 2 have a predecessor
    assert(out(0).getDouble(4) === 0.0)
    // p=(1.5/5, 3.5/5) vs q=(3.5/5, 1.5/5): PSI = 2 * 0.4 * ln(7/3);
    // the emitted statistic is the exact decimal sum re-rounded to a
    // 6-dp double, so the tolerance is the rounding half-step
    val exp = 2.0 * 0.4 * math.log(7.0 / 3.0)
    assert(math.abs(out(1).getDouble(4) - exp) < 1e-6)
    assert(out(1).getLong(2) === 4L && out(1).getLong(3) === 4L)
  }

  test("sourceDivergence: identical sources → 0 bits; disjoint ones diverge") {
    import spark.implicits._
    val df = Seq(
      ("same", "a b"), ("same", "a b"),       // mirrors the corpus mix below
      ("skew", "a a a a")).toDF("source", "text")
    val out = TextStats.sourceDivergence(df, "source", "text")
      .orderBy("source").collect()
    val same = out(0)
    assert(same.getString(0) === "same" && same.getLong(1) === 4L)
    // corpus: a=6/8, b=2/8; p_same = (1/2, 1/2):
    // KL = .5*log2(.5/.75) + .5*log2(.5/.25) = .5*(log2(2/3)+1)
    val expSame = 0.5 * (math.log(2.0 / 3.0) / math.log(2.0) + 1.0)
    assert(math.abs(same.getDouble(3) - expSame) < 1e-6)
    val skew = out(1) // p_skew = (1,0): KL = log2(1/.75) = log2(4/3)
    assert(skew.getLong(2) === 1L) // only "a" contributes a term
    val expSkew = math.log(4.0 / 3.0) / math.log(2.0)
    assert(math.abs(skew.getDouble(3) - expSkew) < 1e-6)
  }
}
