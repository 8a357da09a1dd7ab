package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Laws of the composed ingest path (Ingest): the composition must
  * equal its separately-graded stages chained by hand, stage flags must
  * be mutually consistent, and the stateless prefix must stay a pure
  * per-row function of (text, artifacts).
  */
class IngestSpec extends SparkTestBase {

  private lazy val docs = graft.Tables.load(spark, sfDir, "documents")
  private lazy val corpus = docs.filter(col("doc_id") < 250)
  private lazy val incoming = docs.filter(col("doc_id") >= 250)
  private lazy val stop = TextAnalysis.langMarkers("en")
  private lazy val w =
    (0 until 256).map(j => (j * 2654435761L % 1000L) / 1000.0 - 0.5)
  private lazy val boiler = ChunkDedup
    .boilerplateChunks(corpus, "doc_id", "text", 4, 3)
    .orderBy("chunk").collect().map(_.getString(0)).toSeq

  test("ingestVerdicts equals the hand-chained stages: strip, then " +
    "near-dup against the equally-cleaned corpus, then gate on clean " +
    "text") {
    val got = Ingest.ingestVerdicts(corpus, incoming, "doc_id", "text",
      4, boiler, 0.6, stop, w, -0.1)
    // hand chain from the separately-graded operators
    val cleanedInc = ChunkDedup
      .applyBoilerplate(incoming, "doc_id", "text", 4, boiler)
    val cleanedCorp = ChunkDedup
      .applyBoilerplate(corpus, "doc_id", "text", 4, boiler)
      .select(col("doc_id"), col("text_clean"))
    val flagged = Dedup.minhashNearDupsAgainst(
        cleanedCorp, cleanedInc.select(col("doc_id"), col("text_clean")),
        "doc_id", "text_clean", 0.6)
      .select(col("id_new")).distinct()
      .collect().map(_.getLong(0)).toSet
    val gate = Classifier.composedGate(
      cleanedInc.select(col("doc_id"), col("text_clean")),
      "doc_id", "text_clean", stop, w, -0.1)
    val want = cleanedInc.select("doc_id", "n_chunks", "n_dropped")
      .join(gate, Seq("doc_id"))
      .collect().map { r =>
        val nd = flagged(r.getLong(0))
        (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3), r.getBoolean(4), nd,
          r.getBoolean(5) && !nd)
      }.sortBy(_._1)
    val gotRows = got.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    assert(gotRows.toSeq == want.toSeq)
    // the verdict frame covers EVERY incoming doc exactly once
    assert(got.count() == incoming.count())
    assert(got.select("doc_id").distinct().count() == incoming.count())
  }

  test("flag consistency: final_keep == gate ∧ ¬neardup, and a " +
    "near-dup reject implies a flagged pair existed") {
    val v = Ingest.ingestVerdicts(corpus, incoming, "doc_id", "text",
      4, boiler, 0.6, stop, w, -0.1)
    val bad = v.filter(
      col("final_keep") =!=
        (col("rule_pass") && col("clf_pass") && !col("neardup_reject")))
      .count()
    assert(bad == 0)
    // the composition is not vacuous on this corpus: each stage must
    // actually cut something at sf0.001+ (fixture sanity, not a law)
    assert(v.filter(col("neardup_reject")).count() > 0,
      "near-dup stage cut nothing — fixture lost its cross-half dups")
    assert(v.filter(!col("rule_pass") || !col("clf_pass")).count() > 0,
      "gate stage cut nothing")
    assert(v.filter(col("final_keep")).count() > 0,
      "everything was cut — verdicts degenerate")
  }

  test("statelessPrefix is a pure per-row function: partitioning does " +
    "not change it, and its gate equals composedGate on the cleaned " +
    "text") {
    val a = Ingest.statelessPrefix(incoming, "doc_id", "text", 4,
      boiler, stop, w, -0.1).orderBy("doc_id").collect()
    val b = Ingest.statelessPrefix(incoming.repartition(7), "doc_id",
      "text", 4, boiler, stop, w, -0.1).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    val viaGate = Classifier.composedGate(
      ChunkDedup.applyBoilerplate(incoming, "doc_id", "text", 4, boiler)
        .select(col("doc_id"), col("text_clean")),
      "doc_id", "text_clean", stop, w, -0.1)
      .orderBy("doc_id").collect()
    a.zip(viaGate).foreach { case (p, g) =>
      assert(p.getLong(0) == g.getLong(0))
      assert(p.getBoolean(4) == g.getBoolean(1)) // rule_pass
      assert(p.getBoolean(5) == g.getBoolean(2)) // clf_pass
      assert(p.getBoolean(6) == g.getBoolean(3)) // gate_keep == keep
    }
  }

  test("banding recall safety net: every exact >= 0.6 cleaned pair is " +
    "an LSH candidate at (32 hashes, 8 bands)") {
    // x81's oracle computes EXACT pairs while the operator uses
    // banding — the grade only stays hash-green while banding recall
    // is 1.0 on this corpus (the x68 precedent). This pins that
    // property in CI so a testdata regen that slips a >= 0.6 pair
    // past the bands fails HERE, loudly, instead of as an opaque
    // oracle mismatch in the driver's correctness gate.
    val cleanCorp = ChunkDedup
      .applyBoilerplate(corpus, "doc_id", "text", 4, boiler)
      .select(col("doc_id"), col("text_clean"))
    val cleanInc = ChunkDedup
      .applyBoilerplate(incoming, "doc_id", "text", 4, boiler)
      .select(col("doc_id"), col("text_clean"))
    def sets(d: org.apache.spark.sql.DataFrame, a: String, b: String) =
      d.select(col("doc_id").as(a), graft.functions.SketchFunctions
        .shingleHashSet(col("text_clean"), 3).as(b))
    val exact = sets(cleanInc, "id_new", "sn")
      .crossJoin(sets(cleanCorp, "id_old", "so"))
      .filter(col("sn").isNotNull && col("so").isNotNull &&
        Dedup.setJaccard(col("sn"), col("so")) >= 0.6)
      .select("id_new", "id_old")
    val cands = Dedup
      .bandedFrame(cleanInc, "doc_id", "text_clean", 3, 32, 8)
      .select(col("band"), col("bhash"), col("id").as("id_new"))
      .join(Dedup.bandedFrame(cleanCorp, "doc_id", "text_clean", 3, 32, 8)
        .select(col("band"), col("bhash"), col("id").as("id_old")),
        Seq("band", "bhash"))
      .select("id_new", "id_old").distinct()
    val missed = exact.exceptAll(cands).collect()
    assert(missed.isEmpty,
      s"banding missed ${missed.length} exact >= 0.6 pair(s): " +
        missed.take(5).mkString(", "))
    assert(exact.count() > 0, "no exact pairs — the net pins nothing")
  }

  test("ingestVerdictsIndexed over the persisted bucketed corpus index " +
    "is verdict-identical to ingestVerdicts, and the index tables are " +
    "per-doc frames (append-refresh ≡ rebuild)") {
    Ingest.writeCorpusIndex(corpus, "doc_id", "text", 4, boiler,
      "graft_test_ndidx", buckets = 4)
    try {
      val viaIndex = Ingest.ingestVerdictsIndexed(incoming,
        "graft_test_ndidx", "doc_id", "text", 4, boiler, 0.6, stop, w,
        -0.1)
      val direct = Ingest.ingestVerdicts(corpus, incoming, "doc_id",
        "text", 4, boiler, 0.6, stop, w, -0.1)
      assert(viaIndex.exceptAll(direct).isEmpty &&
        direct.exceptAll(viaIndex).isEmpty,
        "indexed and self-derived verdicts diverged")
      assert(viaIndex.filter(col("neardup_reject")).count() > 0,
        "index path flagged nothing — vacuous equality")
      // append-refresh claim: both tables are pure per-doc frames, so
      // appending a doc's rows ≡ rebuilding with it included — sets has
      // exactly one row per corpus doc, bands exactly `bands` per doc
      // whose cleaned text reaches shingle length
      val nCorpus = corpus.count()
      val sets = spark.table("graft_test_ndidx_sets")
      assert(sets.count() == nCorpus)
      assert(sets.select("id_old").distinct().count() == nCorpus)
      val perDoc = spark.table("graft_test_ndidx_bands")
        .groupBy("id_old").count().select("count").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(perDoc == Set(8L),
        s"expected exactly 8 band rows per signed doc, got $perDoc")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_ndidx_bands")
      spark.sql("DROP TABLE IF EXISTS graft_test_ndidx_sets")
    }
  }

  test("append-refresh ≡ rebuild through the verdict path: appending " +
    "day 1's accepted docs to the index gives day 2 the same verdicts " +
    "as rebuilding the index over corpus ∪ accepted") {
    // The daily cycle the index exists for: refresh once (day 0),
    // verdict day 1's batch, APPEND its survivors
    // (appendAcceptedToCorpusIndex — O(batch)), verdict day 2's batch
    // against the grown index. The pin: day 2's verdicts equal the
    // self-derived path over (corpus ∪ day-1 accepted) — i.e. append
    // lost nothing and duplicated nothing vs a full rebuild.
    val batch1 = docs.filter(col("doc_id") >= 250 && col("doc_id") < 375)
    val batch2base = docs.filter(col("doc_id") >= 375)
    Ingest.writeCorpusIndex(corpus, "doc_id", "text", 4, boiler,
      "graft_test_ndappend", buckets = 4)
    try {
      val verdicts1 = Ingest.ingestVerdictsIndexed(batch1,
        "graft_test_ndappend", "doc_id", "text", 4, boiler, 0.6, stop,
        w, -0.1)
      val acceptedIds = verdicts1.filter(col("final_keep"))
        .select("doc_id").collect().map(_.getLong(0))
      assert(acceptedIds.nonEmpty, "day 1 accepted nothing — the " +
        "append pin would be vacuous")
      val accepted = batch1.filter(col("doc_id").isin(acceptedIds: _*))
      Ingest.appendAcceptedToCorpusIndex(accepted, "doc_id", "text", 4,
        boiler, "graft_test_ndappend")
      // seed one GUARANTEED cross-generation near-dup: a day-2 doc
      // whose text is a day-1 survivor's with one token changed — the
      // append must be what flags it (its partner is not in day 0's
      // corpus, which held doc_id < 250 only)
      val donor = accepted.orderBy("doc_id").limit(1)
        .select("text").collect()(0).getString(0)
      val seeded = spark.range(1).select(lit(900000L).as("doc_id"),
        concat(lit(donor), lit(" perturbed")).as("text"),
        lit("en").as("lang"), lit("seed").as("source"),
        (length(lit(donor)) + 10).cast("long").as("n_chars"))
      val batch2 = batch2base.unionByName(
        seeded.select(batch2base.columns.map(col): _*))
      val viaAppended = Ingest.ingestVerdictsIndexed(batch2,
        "graft_test_ndappend", "doc_id", "text", 4, boiler, 0.6, stop,
        w, -0.1)
      val viaRebuilt = Ingest.ingestVerdicts(
        corpus.unionByName(accepted), batch2, "doc_id", "text", 4,
        boiler, 0.6, stop, w, -0.1)
      assert(viaAppended.exceptAll(viaRebuilt).isEmpty &&
        viaRebuilt.exceptAll(viaAppended).isEmpty,
        "append-refresh and rebuild verdicts diverged")
      assert(viaAppended.filter(col("neardup_reject") &&
          col("doc_id") === 900000L).count() == 1,
        "the seeded cross-generation near-dup was not flagged — the " +
          "append did not reach the candidate join")
      // the grown tables keep the per-doc frame shape (one sets row
      // per doc across BOTH generations — no duplicate ids appeared)
      val sets = spark.table("graft_test_ndappend_sets")
      assert(sets.count() == corpus.count() + accepted.count())
      assert(sets.select("id_old").distinct().count() == sets.count())
      // and the appended files EXTEND the bucket layout: both grown
      // corpus scans still read as bucketed (the exchange-free join
      // shape itself is x82's PlanSpec pin; this re-checks the flag
      // the pin relies on survives an append)
      withSQLConf(
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.enabled" -> "false") {
        val cleanedB2 = ChunkDedup
          .applyBoilerplate(batch2, "doc_id", "text", 4, boiler)
          .select(col("doc_id"), col("text_clean"))
        val planStr = Dedup.minhashNearDupsAgainstIndex(cleanedB2,
            "graft_test_ndappend", "doc_id", "text_clean", 0.6)
          .queryExecution.executedPlan.toString
        assert("Bucketed: true".r.findAllIn(planStr).size == 2,
          s"post-append corpus scans are not both bucketed:\n$planStr")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_ndappend_bands")
      spark.sql("DROP TABLE IF EXISTS graft_test_ndappend_sets")
    }
  }

  test("compactNearDupIndex after N appends: verdicts unchanged, file " +
    "count back to one per bucket, bucketed exchange-free scan shape " +
    "and dial stamps survive, and appends keep working afterwards") {
    val buckets = 4
    Ingest.writeCorpusIndex(corpus, "doc_id", "text", 4, boiler,
      "graft_test_ndcompact", buckets = buckets)
    try {
      def filesOf(tbl: String): Int = {
        val loc = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.defaultTablePath(
            org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(loc).count(s => s.isFile &&
          s.getPath.getName.endsWith(".parquet"))
      }
      // 5 daily appends of disjoint slices — each adds files per bucket
      val slices = (0 until 5).map(i =>
        incoming.filter(pmod(col("doc_id"), lit(5)) === i))
      slices.zipWithIndex.foreach { case (s, i) =>
        Ingest.appendAcceptedToCorpusIndex(s, "doc_id", "text", 4,
          boiler, "graft_test_ndcompact",
          requireNewIds = i == 0) // probe once; slices are disjoint
      }
      val filesBefore = filesOf("graft_test_ndcompact_sets")
      assert(filesBefore > buckets,
        s"appends did not grow the file count ($filesBefore) — the " +
          "compaction pin would be vacuous")
      val day2 = docs.filter(col("doc_id") >= 450) // overlaps appended ids'
        .select(col("doc_id") + 5000000L as "doc_id", col("text"))
      def verdicts() = Dedup.minhashNearDupsAgainstIndex(
          day2, "graft_test_ndcompact", "doc_id", "text", 0.6)
        .orderBy("id_new", "id_old").collect().toSeq
      val before = verdicts()
      assert(before.nonEmpty, "no near-dup pairs against the grown " +
        "index — the equality pin would be vacuous")
      Dedup.compactNearDupIndex(spark, "graft_test_ndcompact")
      // 1) same candidates/verdicts
      assert(verdicts() == before, "compaction changed the join result")
      // 2) files back to exactly one per bucket on both tables
      assert(filesOf("graft_test_ndcompact_sets") == buckets)
      assert(filesOf("graft_test_ndcompact_bands") == buckets)
      // 3) dial stamps survived (a mismatched caller still throws)
      val e = intercept[IllegalArgumentException](
        Dedup.minhashNearDupsAgainstIndex(day2, "graft_test_ndcompact",
          "doc_id", "text", 0.6, shingleK = 5))
      assert(e.getMessage.contains("graft.shingle_k"), e.getMessage)
      // 4) the exchange-free corpus-side shape survives compaction
      withSQLConf(
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.enabled" -> "false") {
        val planStr = Dedup.minhashNearDupsAgainstIndex(day2,
            "graft_test_ndcompact", "doc_id", "text", 0.6)
          .queryExecution.executedPlan.toString
        assert("Bucketed: true".r.findAllIn(planStr).size == 2,
          s"post-compact corpus scans are not both bucketed:\n$planStr")
      }
      // 5) the compacted table still accepts appends (bucket counts and
      // dials read back from the renamed table's metadata)
      val extra = docs.limit(1).select(
        (col("doc_id") + 7000000L).as("doc_id"), col("text"))
      Ingest.appendAcceptedToCorpusIndex(extra, "doc_id", "text", 4,
        boiler, "graft_test_ndcompact")
      assert(filesOf("graft_test_ndcompact_sets") == buckets + 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_ndcompact_bands")
      spark.sql("DROP TABLE IF EXISTS graft_test_ndcompact_sets")
      spark.sql("DROP TABLE IF EXISTS graft_test_ndcompact_bands_compact")
      spark.sql("DROP TABLE IF EXISTS graft_test_ndcompact_sets_compact")
    }
  }

  test("append freshness guard and dial stamps are executable: a " +
    "re-crawled id is refused before the write, and mismatched banding " +
    "dials throw on both append and read") {
    Ingest.writeCorpusIndex(corpus, "doc_id", "text", 4, boiler,
      "graft_test_ndguard", buckets = 4)
    try {
      // the two-generation failure mode, demonstrated and REFUSED: a
      // re-crawled doc arrives under an id the index already holds
      val recrawled = corpus.limit(1)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"))
      val e = intercept[IllegalArgumentException](
        Dedup.appendToNearDupIndex(recrawled, "doc_id", "text",
          "graft_test_ndguard"))
      assert(e.getMessage.contains("already exist"), e.getMessage)
      // nothing was written: the probe runs before either table append
      assert(spark.table("graft_test_ndguard_sets").count()
        == corpus.count())
      // requireNewIds = false restores the unguarded (caller-proven)
      // path — same input now appends
      Dedup.appendToNearDupIndex(
        recrawled.select((col("doc_id") + 1000000L).as("doc_id"),
          col("text")),
        "doc_id", "text", "graft_test_ndguard", requireNewIds = false)
      assert(spark.table("graft_test_ndguard_sets").count()
        == corpus.count() + 1)
      // dial stamps: the family the index was written with travels on
      // the table; a mismatched caller fails loudly on append AND read
      val fresh = recrawled.select(
        (col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val eAppend = intercept[IllegalArgumentException](
        Dedup.appendToNearDupIndex(fresh, "doc_id", "text",
          "graft_test_ndguard", shingleK = 5))
      assert(eAppend.getMessage.contains("graft.shingle_k"),
        eAppend.getMessage)
      val eRead = intercept[IllegalArgumentException](
        Dedup.minhashNearDupsAgainstIndex(incoming, "graft_test_ndguard",
          "doc_id", "text", 0.6, numHashes = 16, bands = 8))
      assert(eRead.getMessage.contains("graft.num_hashes"),
        eRead.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_ndguard_bands")
      spark.sql("DROP TABLE IF EXISTS graft_test_ndguard_sets")
    }
  }

  test("applyBoilerplate is idempotent on already-clean text — the " +
    "safety argument for re-cleaning the corpus with the same list") {
    // Ingest.ingestVerdicts cleans the corpus even though its ingest
    // already applied the then-current list; the scaladoc argues this is
    // safe because re-application is a fixpoint on text_clean. Pin it on
    // the real corpus PLUS seeded boundary-chunk docs (lengths not a
    // multiple of k, a final short chunk equal to a list entry, empty
    // and null text). n_chunks/n_dropped legitimately differ between
    // passes; the TEXT column must not.
    import spark.implicits._
    val edges = Seq(
      (9001L, boiler.headOption.getOrElse("x y z w")), // pure boilerplate
      (9002L, "tail tokens then " +
        boiler.headOption.getOrElse("x y z w")), // boundary-offset hit
      (9003L, "one two three"), // shorter than k
      (9004L, ""), (9005L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val all = docs.select(col("doc_id"), col("text")).unionByName(edges)
    val once = ChunkDedup.applyBoilerplate(all, "doc_id", "text", 4,
        boiler)
      .select(col("doc_id"), col("text_clean"))
    val twice = ChunkDedup.applyBoilerplate(
        once.select(col("doc_id"), col("text_clean").as("text_again")),
        "doc_id", "text_again", 4, boiler)
      .select(col("doc_id"), col("text_clean"))
    val diff = twice.exceptAll(once).unionByName(once.exceptAll(twice))
      .collect()
    assert(diff.isEmpty,
      s"re-cleaning changed ${diff.length} doc(s): " +
        diff.take(3).mkString("; "))
    // and the first pass genuinely dropped something, so the fixpoint
    // claim is exercised, not vacuous
    assert(ChunkDedup.applyBoilerplate(all, "doc_id", "text", 4, boiler)
      .filter(col("n_dropped") > 0).count() > 0)
  }

  test("reserved output column names are guarded") {
    val clash = incoming.withColumn("final_keep", lit(true))
    val e = intercept[IllegalArgumentException](
      Ingest.ingestVerdicts(corpus, clash, "doc_id", "text",
        4, boiler, 0.6, stop, w, -0.1))
    assert(e.getMessage.contains("reserves column name"))
    val clash2 = incoming.withColumn("gate_keep", lit(true))
    val e2 = intercept[IllegalArgumentException](
      Ingest.statelessPrefix(clash2, "doc_id", "text",
        4, boiler, stop, w, -0.1))
    assert(e2.getMessage.contains("reserves column name"))
  }
}
