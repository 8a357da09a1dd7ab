package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private def fps(k: Int, w: Int, rows: (Long, String)*): Map[Long, Set[Long]] =
    Winnow.fingerprints(rows.toDF("id", "text"), "id", "text", k, w)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens yields a " +
    "shared fingerprint, wherever it sits in each doc") {
    // k=3, w=4 -> any common substring of >= 6 tokens must match.
    val common = "the quick brown fox jumps high"
    val out = fps(3, 4,
      (1L, s"alpha beta gamma $common delta epsilon"),
      (2L, s"$common zeta eta theta iota kappa lambda"),
      (3L, "totally different words having nothing in common here"))
    assert((out(1L) & out(2L)).nonEmpty,
      s"no shared fingerprint: ${out(1L)} vs ${out(2L)}")
    assert((out(1L) & out(3L)).isEmpty)
  }

  test("fingerprint density: ~2/(w+1) of gram count, never zero for a " +
    "gram-bearing doc, and exactly one for a single-gram doc") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Winnow.fingerprints(docs, "doc_id", "text", 3, 8)
      .groupBy("doc_id").count()
    assert(out.filter(col("count") === 0).count() == 0)
    val grams = docs.select(size(split(col("text"), " ")).as("n"))
      .agg(sum(greatest(col("n") - lit(2), lit(0)))).head().getLong(0)
    val nFps = Winnow.fingerprints(docs, "doc_id", "text", 3, 8).count()
    // expected density 2/(w+1) = 2/9 of (possibly duplicated) gram
    // positions; distinct-per-doc dedup pulls it below, window clamps
    // push tiny docs up — accept a broad band around it
    assert(nFps > grams / 12 && nFps < grams / 2, s"$nFps of $grams grams")
    val single = fps(3, 4, (1L, "just three tokens"))
    assert(single(1L).size == 1)
  }

  test("docs shorter than k produce no fingerprints; ties collapse " +
    "(an all-identical-gram doc has exactly one fingerprint)") {
    val out = fps(3, 4, (1L, "too short"), (2L, "a a a a a a a a a a"))
    assert(!out.contains(1L))
    assert(out(2L).size == 1)
  }

  test("overlapPairs finds the planted overlap and the doc-frequency " +
    "cap silences boilerplate fingerprints") {
    val boiler = "copyright two thousand twenty six all rights reserved"
    val shared = "unique shared passage about spark physical planning"
    val docs = Seq(
      (1L, s"$boiler one text $shared extra words here"),
      (2L, s"$boiler other document $shared trailing tokens now"),
      (3L, s"$boiler third unrelated thing entirely different content"),
      (4L, s"$boiler fourth also unrelated completely other subject"),
      (5L, s"$boiler fifth again unrelated some more words")).toDF("id", "text")
    // maxDf=2: the boilerplate run (in all 5 docs) is capped out, the
    // shared passage (2 docs) survives -> exactly the (1,2) pair
    val pairs = Winnow.overlapPairs(docs, "id", "text", 3, 4,
        minShared = 1, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }

  test("the native equals the independently-derived HOF twin on the " +
    "graded corpus and on seeded random fuzz (incl. double spaces, " +
    "non-ASCII, repeats)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    for ((k, w) <- Seq((3, 4), (2, 8), (1, 1))) {
      val nat = Winnow.fingerprints(docs, "doc_id", "text", k, w)
      val hof = Winnow.fingerprintsHof(docs, "doc_id", "text", k, w)
      assert(nat.exceptAll(hof).isEmpty && hof.exceptAll(nat).isEmpty,
        s"corpus mismatch at (k=$k, w=$w)")
    }
    val rnd = new scala.util.Random(20260814L)
    val alphabet = Vector("a", "bb", "字", "ω1", "", "x y")
    val fuzz = (1L to 200L).map { id =>
      val words = Seq.fill(rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.size)))
      (id, words.mkString(" "))
    }.toDF("id", "text")
    val nat = Winnow.fingerprints(fuzz, "id", "text", 2, 3)
    val hof = Winnow.fingerprintsHof(fuzz, "id", "text", 2, 3)
    assert(nat.exceptAll(hof).isEmpty && hof.exceptAll(nat).isEmpty)
  }

  test("reserved working names fail loudly instead of colliding") {
    val e = intercept[IllegalArgumentException] {
      Winnow.fingerprints(Seq((1L, "a", 2L)).toDF("id", "text", "fp"),
        "id", "text", 3, 4)
    }
    assert(e.getMessage.contains("reserves"))
    val e2 = intercept[IllegalArgumentException] {
      Winnow.fingerprintsHof(Seq((1L, "a", 2L)).toDF("id", "text", "__hs"),
        "id", "text", 3, 4)
    }
    assert(e2.getMessage.contains("reserves"))
  }

  test("duplicate id rows never produce self-pairs or inflate " +
    "n_shared, and the df cap counts DOCUMENTS, not rows") {
    val shared = "unique shared passage about spark physical planning"
    val rows = Seq(
      (1L, s"one text $shared extra words here"),
      (1L, s"one text $shared extra words here"), // doc 1 delivered twice
      (2L, s"other document $shared trailing tokens now"))
    val dup = rows.toDF("id", "text")
    val pairs = Winnow.overlapPairs(dup, "id", "text", 3, 4,
        minShared = 1, maxDf = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(pairs.forall { case ((a, b), _) => a < b }, pairs.toSeq)
    // n_shared must equal the single-delivery corpus's, not 2x it
    val clean = Winnow.overlapPairs(rows.distinct.toDF("id", "text"),
        "id", "text", 3, 4, minShared = 1, maxDf = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(pairs.sortBy(_._1) sameElements clean.sortBy(_._1),
      s"dup=${pairs.toSeq} clean=${clean.toSeq}")
    // coveragePairs under the same double delivery: one output row per
    // pair (the length join must not fan out), identical coverage
    val covDup = Winnow.coveragePairs(dup, "id", "text", 3, 4, 1, 2)
      .collect()
    val covClean = Winnow.coveragePairs(rows.distinct.toDF("id", "text"),
      "id", "text", 3, 4, 1, 2).collect()
    assert(covDup.length == covClean.length &&
      covDup.map(_.toSeq).toSet == covClean.map(_.toSeq).toSet,
      s"dup=${covDup.toSeq} clean=${covClean.toSeq}")
  }

  test("fingerprintPositions is consistent with fingerprints (same fp " +
    "set per doc) and positions point at the selected grams") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(200)
    val byFp = Winnow.fingerprints(docs, "doc_id", "text", 3, 4)
    val byPos = Winnow.fingerprintPositions(docs, "doc_id", "text", 3, 4)
      .select(col("doc_id"), col("fp")).distinct()
    assert(byFp.exceptAll(byPos).isEmpty && byPos.exceptAll(byFp).isEmpty)
    // positions are 1-based gram indices: hash of the gram AT pos
    // equals fp for every row (recompute via the SQL-grid formula)
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
    val check = Winnow.fingerprintPositions(docs, "doc_id", "text", 3, 4)
      .join(toks, "doc_id")
      .select(col("fp"),
        conv(substring(md5(array_join(
          slice(col("ts"), col("pos"), lit(3)), " ")), 1, 8), 16, 10)
          .cast("long").as("refp"))
    assert(check.filter(col("fp") =!= col("refp")).count() == 0)
  }

  test("coveragePairs: a planted shared passage yields the right span " +
    "coverage on both sides, and the pair set matches overlapPairs") {
    val shared = "unique shared passage about spark physical planning " +
      "and adaptive execution strategies" // 12 tokens
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon zeta"),
      (2L, s"$shared eta theta iota kappa lambda mu nu xi"),
      (3L, "totally different words having nothing in common here"))
      .toDF("id", "text")
    val cov = Winnow.coveragePairs(docs, "id", "text", 3, 4,
      minShared = 1, maxDf = 10)
    val rows = cov.collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    val r = rows.head
    val (covA, covB) = (r.getDouble(3), r.getDouble(4))
    // the shared 12-token run is ~2/3 of each 18/20-token doc; shared
    // fingerprints cover a sub-span of it, never more than the run plus
    // k-1 boundary tokens, never less than one k-gram
    assert(covA > 0.1 && covA <= (12.0 + 2) / 18, s"cov_a $covA")
    assert(covB > 0.1 && covB <= (12.0 + 2) / 20, s"cov_b $covB")
    // pair universe identical to overlapPairs at the same parameters
    val op = Winnow.overlapPairs(docs, "id", "text", 3, 4, 1, 10)
      .select("id_a", "id_b", "n_shared")
    assert(cov.select("id_a", "id_b", "n_shared").exceptAll(op).isEmpty &&
      op.exceptAll(cov.select("id_a", "id_b", "n_shared")).isEmpty)
  }

  test("coveragePairs coverage is exact on a hand-computed fixture") {
    // k=1, w=1: every token is its own fingerprint at its own position
    // -> coverage = |shared distinct tokens' positions| / n_tokens,
    // i.e. fraction of token occurrences whose token the other doc has
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f g h")).toDF("id", "text")
    val r = Winnow.coveragePairs(docs, "id", "text", 1, 1,
      minShared = 1, maxDf = 10).head()
    assert(r.getLong(2) == 2)           // shared fps: c, d
    assert(r.getDouble(3) == 0.5)       // 2 of 4 tokens covered in doc 1
    assert(r.getDouble(4) == 0.3333)    // round(2/6, 4) in doc 2
  }

  test("non-positive k or w fail at construction, through every " +
    "surface (operator, Column API, SQL)") {
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Winnow.fingerprints(docs, "id", "text", 0, 4)
    }
    intercept[IllegalArgumentException] {
      graft.functions.SketchFunctions.winnowFingerprints(col("text"), 3, 0)
    }
  }
}
