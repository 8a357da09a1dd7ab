package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ChunkDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(k: Int, maxDocs: Int, rows: (Long, String)*) =
    ChunkDedup.dropSharedChunks(
      rows.toDF("id", "text"), "id", "text", k, maxDocs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("chunks splits a token array into k-word windows, last window " +
    "partial") {
    val out = spark.range(1)
      .select(ChunkDedup.chunks(split(lit("a b c d e f g"), " "), 3).as("c"))
      .head().getSeq[String](0)
    assert(out == Seq("a b c", "d e f", "g"))
  }

  test("a chunk shared by >= maxDocs distinct docs is cut from every " +
    "doc; unique prose survives in original order") {
    // k=2: "nav bar" opens docs 1-3 (boilerplate at threshold 3);
    // each doc's tail is unique and must survive verbatim.
    val out = run(2, 3,
      (1L, "nav bar alpha beta"),
      (2L, "nav bar gamma delta"),
      (3L, "nav bar epsilon zeta"),
      (4L, "eta theta iota kappa"))
    assert(out(1L) == ((2L, 1L, "alpha beta")))
    assert(out(2L) == ((2L, 1L, "gamma delta")))
    assert(out(3L) == ((2L, 1L, "epsilon zeta")))
    assert(out(4L) == ((2L, 0L, "eta theta iota kappa")))
  }

  test("a chunk in only maxDocs-1 docs is kept") {
    val out = run(2, 3,
      (1L, "nav bar alpha beta"),
      (2L, "nav bar gamma delta"))
    assert(out(1L) == ((2L, 0L, "nav bar alpha beta")))
    assert(out(2L) == ((2L, 0L, "nav bar gamma delta")))
  }

  test("repetition inside ONE doc never triggers (distinct-doc count)") {
    val out = run(2, 2,
      (1L, "spam ham spam ham spam ham"),
      (2L, "plain words only here"))
    assert(out(1L) == ((3L, 0L, "spam ham spam ham spam ham")))
  }

  test("a doc that is all boilerplate comes back empty, not missing") {
    val out = run(2, 2,
      (1L, "nav bar"), (2L, "nav bar"), (3L, "real text"))
    assert(out(1L) == ((1L, 1L, "")))
    assert(out(2L) == ((1L, 1L, "")))
    assert(out(3L) == ((1L, 0L, "real text")))
  }

  test("middle-of-doc boilerplate leaves a correctly ordered seam") {
    // the boilerplate chunk sits between two kept chunks; order of the
    // survivors must be the original in-doc order, not collect order
    val out = run(2, 2,
      (1L, "keep one nav bar keep two"),
      (2L, "nav bar other stuff"))
    assert(out(1L) == ((3L, 1L, "keep one keep two")))
    assert(out(2L) == ((2L, 1L, "other stuff")))
  }

  test("scoped dedup: a chunk boilerplate in one source is untouched " +
    "content in another; the global form would cut both") {
    val docs = Seq(
      (1L, "siteA", "nav bar alpha beta"),
      (2L, "siteA", "nav bar gamma delta"),
      (3L, "siteB", "nav bar epsilon zeta"),
      (4L, "siteB", "eta theta iota kappa")).toDF("id", "src", "text")
    val scoped = ChunkDedup
      .dropSharedChunksWithin(docs, "id", "src", "text", 2, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // "nav bar" hits 2 docs inside siteA (cut there) but only 1 inside
    // siteB (kept there)
    assert(scoped(1L) == ((2L, 1L, "alpha beta")))
    assert(scoped(2L) == ((2L, 1L, "gamma delta")))
    assert(scoped(3L) == ((2L, 0L, "nav bar epsilon zeta")))
    assert(scoped(4L) == ((2L, 0L, "eta theta iota kappa")))
    // the global form at the same threshold cuts siteB's copy too
    val global = ChunkDedup.dropSharedChunks(docs, "id", "text", 2, 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(global(3L) == "epsilon zeta")
  }

  test("scoped dedup within a single scope equals the global form on " +
    "that scope (degenerate-scope law)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .withColumn("one", lit("all"))
    val scoped = ChunkDedup
      .dropSharedChunksWithin(docs, "doc_id", "one", "text", 4, 3)
      .drop("one")
    val global = ChunkDedup.dropSharedChunks(docs, "doc_id", "text", 4, 3)
    assert(scoped.exceptAll(global).isEmpty &&
      global.exceptAll(scoped).isEmpty)
  }

  test("reserved working names fail loudly instead of colliding") {
    val e = intercept[IllegalArgumentException] {
      ChunkDedup.dropSharedChunks(
        Seq((1L, "a", "b")).toDF("id", "text", "chunk"),
        "id", "text", 2, 3)
    }
    assert(e.getMessage.contains("reserves"))
  }

  test("NULL text yields (0, 0, \"\") from BOTH forms — restored, not " +
    "dropped, and the two cadences agree") {
    val docs = Seq((1L, Some("nav bar x")), (2L, Some("nav bar y")),
      (3L, None: Option[String])).toDF("id", "text")
    val joint = ChunkDedup.dropSharedChunks(docs, "id", "text", 2, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(joint(3L) == ((0L, 0L, "")))
    assert(joint(1L) == ((2L, 1L, "x")))
    val applied = ChunkDedup.applyBoilerplate(docs, "id", "text", 2,
        Seq("nav bar"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(applied(3L) == ((0L, 0L, "")))
    assert(applied(1L) == ((2L, 1L, "x")))
  }

  test("two-phase law: applyBoilerplate(corpus's own list) equals " +
    "dropSharedChunks on that corpus, row for row") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val list = ChunkDedup
      .boilerplateChunks(docs, "doc_id", "text", 4, 3)
      .collect().map(_.getString(0)).toSeq
    assert(list.nonEmpty, "no boilerplate at sf0.001 — law test is vacuous")
    val applied = ChunkDedup.applyBoilerplate(docs, "doc_id", "text", 4, list)
    val joint = ChunkDedup.dropSharedChunks(docs, "doc_id", "text", 4, 3)
    assert(applied.exceptAll(joint).isEmpty &&
      joint.exceptAll(applied).isEmpty)
  }

  test("applyBoilerplate is a pure per-row projection: no exchange, " +
    "no join, no window in its plan") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val plan = ChunkDedup
      .applyBoilerplate(docs, "doc_id", "text", 4, Seq("nav bar"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("chunks' null contract holds with ANSI off (legacy size(null) " +
    "= -1 must not fabricate phantom chunks)") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val docs = Seq((1L, Some("nav bar x")), (2L, Some("nav bar y")),
        (3L, None: Option[String])).toDF("id", "text")
      // direct probe: a null token array must chunk to null, not to a
      // descending-sequence artifact
      val probe = docs.filter(col("id") === 3L)
        .select(ChunkDedup.chunks(split(col("text"), " "), 2).as("c"))
        .head()
      assert(probe.isNullAt(0))
      // end to end: the null doc is restored as (0, 0, ""), same as ANSI
      val joint = ChunkDedup.dropSharedChunks(docs, "id", "text", 2, 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(joint(3L) == ((0L, 0L, "")))
      assert(joint(1L) == ((2L, 1L, "x")))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("line unit: a line shared by >= maxDocs docs is cut; unique " +
    "lines survive in order, reassembled with newlines") {
    val docs = Seq(
      (1L, "COOKIE NOTICE\nalpha prose\nbeta prose"),
      (2L, "COOKIE NOTICE\ngamma prose"),
      (3L, "COOKIE NOTICE\ndelta prose"),
      (4L, "unique only\nnothing shared")).toDF("id", "text")
    val out = ChunkDedup
      .dropSharedChunksBy(docs, "id", "text", ChunkDedup.Lines, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 1L, "alpha prose\nbeta prose")))
    assert(out(2L) == ((2L, 1L, "gamma prose")))
    assert(out(3L) == ((2L, 1L, "delta prose")))
    assert(out(4L) == ((2L, 0L, "unique only\nnothing shared")))
  }

  test("line unit: empty lines are chunks — shared blank-line chrome " +
    "is cut like any other line; a null doc is (0, 0, \"\")") {
    val docs = Seq(
      (1L, Some("a\n\nb")), (2L, Some("c\n\nd")), (3L, Some("e\n\nf")),
      (4L, None: Option[String])).toDF("id", "text")
    val out = ChunkDedup
      .dropSharedChunksBy(docs, "id", "text", ChunkDedup.Lines, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the empty middle line appears in 3 distinct docs -> boilerplate
    assert(out(1L) == ((3L, 1L, "a\nb")))
    assert(out(2L) == ((3L, 1L, "c\nd")))
    assert(out(3L) == ((3L, 1L, "e\nf")))
    assert(out(4L) == ((0L, 0L, "")))
  }

  test("line unit two-phase law: applyBoilerplateBy(list) equals " +
    "dropSharedChunksBy on the same newline fixture, row for row") {
    val docs = Seq(
      (1L, Some("NAV\nalpha\nFOOTER")),
      (2L, Some("NAV\nbeta\nFOOTER")),
      (3L, Some("NAV\ngamma")),
      (4L, Some("plain\ntext")),
      (5L, None: Option[String])).toDF("id", "text")
    val list = ChunkDedup
      .boilerplateChunksBy(docs, "id", "text", ChunkDedup.Lines, 2)
      .collect().map(_.getString(0)).toSeq
    assert(list.toSet == Set("NAV", "FOOTER"))
    val applied = ChunkDedup
      .applyBoilerplateBy(docs, "id", "text", ChunkDedup.Lines, list)
    val joint = ChunkDedup
      .dropSharedChunksBy(docs, "id", "text", ChunkDedup.Lines, 2)
    assert(applied.exceptAll(joint).isEmpty &&
      joint.exceptAll(applied).isEmpty)
    val m = applied.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(m(1L) == ((3L, 2L, "alpha")))
    assert(m(5L) == ((0L, 0L, "")))
  }

  test("line-unit scoped form: chrome is cut only within its own " +
    "source") {
    val docs = Seq(
      (1L, "siteA", "NAV\nalpha"),
      (2L, "siteA", "NAV\nbeta"),
      (3L, "siteB", "NAV\ngamma"),
      (4L, "siteB", "delta\nepsilon")).toDF("id", "src", "text")
    val out = ChunkDedup.dropSharedChunksWithinBy(
        docs, "id", "src", "text", ChunkDedup.Lines, 2)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out(1L) == "alpha" && out(2L) == "beta")
    assert(out(3L) == "NAV\ngamma") // only 1 doc in siteB has NAV
  }

  test("graded slice sanity: some boilerplate exists at sf0.001 and " +
    "token mass is conserved (kept + dropped = original)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = ChunkDedup.dropSharedChunks(docs, "doc_id", "text", 4, 3)
    val agg = out.agg(
      sum("n_dropped").as("nd"),
      sum(when(col("text_clean") === "", 0)
        .otherwise(size(split(col("text_clean"), " ")))).as("kept_toks"))
      .head()
    assert(agg.getLong(0) > 0, "no boilerplate found — threshold dead")
    val origToks = docs.agg(sum(size(split(col("text"), " "))))
      .head().getLong(0)
    // dropped token mass: rebuild by re-splitting the dropped chunks is
    // not output; instead check kept <= orig and the per-doc identity
    // n_chunks == ceil(tokens/4) on a sample row
    assert(agg.getLong(1) < origToks)
    val one = docs.orderBy("doc_id").limit(1)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .head()
    val chunksOfOne = out.filter(col("doc_id") === one.getLong(0))
      .head().getLong(1)
    assert(chunksOfOne == (one.getInt(1) + 3) / 4)
  }
}
