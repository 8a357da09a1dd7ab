package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS local fingerprinting scheme): hash every
  * k-gram, slide a window of w consecutive hashes, keep each window's
  * minimum (rightmost on ties), dedupe. The guarantee that makes this
  * better than "sample every Nth hash": any shared substring of at
  * least w+k-1 tokens between two documents yields at least one SHARED
  * fingerprint, while the fingerprint count per doc stays ~2/(w+1) of
  * the gram count — bounded, position-robust partial-overlap detection,
  * the piece whole-document schemes (minhash: set resemblance; simhash:
  * global distance; x17's rolling fingerprint: one hash per doc) don't
  * give.
  *
  * Cross-engine determinism: gram hashes ride the md5-prefix grid
  * (Split.hashBucket's construction — first 8 md5 hex chars as a long
  * in [0, 2^32)), so DuckDB replays the exact selection; ties (equal
  * hash in one window = equal gram text, md5 collisions aside) resolve
  * by the standard rightmost-min rule, identically in both engines.
  *
  * Scale shape: fingerprint extraction is ONE compiled pass per row
  * (Sketches.winnowFingerprints — tokenize, hash, window-select,
  * dedupe in a tight loop; no explode of raw grams, no shuffle of
  * gram text, no interpreted HOF lambdas). Matching is the LSH-bucket
  * pattern (minhashCandidates): ONE shuffle of (fp, id) into buckets,
  * pairs streamed per bucket via explodeMemberPairs, with a
  * doc-frequency cap on fingerprints — a fingerprint in > maxDf docs
  * is boilerplate (x56's phenomenon seen through this lens) and would
  * otherwise pair quadratically; excluding over-shared fingerprints is
  * the standard winnowing-index practice and bounds bucket fan-out.
  */
object Winnow {

  /** Per-position k-gram hashes of a PRE-SPLIT token array on the
    * [0, 2^32) md5-prefix grid (takes the array, not the text — a
    * lambda re-evaluates outer expressions per element, so split-in-
    * lambda would be O(len²); see ChunkDedup.chunks).
    */
  private[operators] def gramHashes(toks: Column, k: Int): Column =
    transform(
      sequence(lit(0), size(toks) - lit(k)),
      i => conv(substring(md5(
          array_join(slice(toks, (i + lit(1)).cast("int"), lit(k)), " ")
            .cast(StringType)), 1, 8), 16, 10).cast("long"))

  /** Distinct winnowing fingerprints per document: (idCol, fp). Every
    * window of `w` consecutive gram hashes contributes its minimum
    * (rightmost on ties); documents with fewer than w hashes but at
    * least one gram contribute the minimum of what they have (the
    * standard short-document clamp, so no gram-bearing doc is
    * fingerprint-less); documents shorter than k tokens produce no
    * rows. Runs the compiled one-pass native
    * (Sketches.winnowFingerprints) — the HOF twin below exists as the
    * independently-derived spec the native is fuzz-checked against.
    */
  def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1, s"gram width must be >= 1, got $k")
    require(w >= 1, s"window width must be >= 1, got $w")
    require(!docs.columns.contains("fp"),
      "fingerprints reserves column name 'fp'; rename the input column")
    docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol),
        explode(graft.functions.SketchFunctions.winnowFingerprints(
          col(textCol), k, w)).as("fp"))
  }

  /** The interpreted HOF formulation of `fingerprints` — kept as the
    * independently-derived twin the native is checked against
    * (WinnowSpec equivalence + fuzz); not the production path.
    */
  private[operators] def fingerprintsHof(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    // this path (unlike the native one) materializes working columns,
    // so the guard lives HERE, next to the selects that would clobber
    Seq("fp", "__hs", "__toks").foreach(n =>
      require(!docs.columns.contains(n),
        s"fingerprintsHof reserves column name '$n'; rename the input column"))
    val sel = {
      val hs = col("__hs")
      val nwin = greatest(size(hs) - lit(w - 1), lit(1))
      transform(sequence(lit(0), nwin - lit(1)), j => {
        val win = slice(hs, (j + lit(1)).cast("int"), lit(w))
        val minv = array_min(win)
        // rightmost occurrence of the min inside the window (1-based)
        val ridx = size(win) -
          array_position(reverse(win), minv).cast("int") + lit(1)
        element_at(hs, (j + ridx).cast("int"))
      })
    }
    docs
      .filter(size(split(col(textCol), " ")) >= k && col(idCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), gramHashes(col("__toks"), k).as("__hs"))
      .select(col(idCol), explode(array_distinct(sel)).as("fp"))
  }

  /** Position-carrying winnowing fingerprints: (idCol, fp, pos), pos
    * the 1-based gram index of the selected window minimum (the token
    * span covered is [pos, pos+k-1]). Distinct (fp, pos) pairs per
    * document — a fingerprint occurring at several positions keeps them
    * all, which is what span coverage needs; `fingerprints` stays the
    * cheaper surface for callers that only bucket.
    */
  def fingerprintPositions(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1, s"gram width must be >= 1, got $k")
    require(w >= 1, s"window width must be >= 1, got $w")
    Seq("fp", "pos").foreach(n => require(!docs.columns.contains(n),
      s"fingerprintPositions reserves column name '$n'; rename the input column"))
    docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol),
        explode(graft.functions.SketchFunctions.winnowFingerprintPositions(
          col(textCol), k, w)).as("__s"))
      .select(col(idCol), col("__s.fp").as("fp"), col("__s.pos").as("pos"))
  }

  /** Matched-coverage pairs — the MOSS-report half of the scheme
    * (Schleimer et al. §4): for every overlapPairs pair, what FRACTION
    * of each document's tokens is covered by the spans of the shared
    * fingerprints. Output: (id_a, id_b, n_shared, cov_a, cov_b) with
    * cov = |union of [pos, pos+k-1] spans over shared fingerprints| /
    * doc token count, rounded to 4 decimals. n_shared, the df cap, and
    * the pair set match overlapPairs exactly (same distinct-(id, fp)
    * pairing, same pre-shuffle cap).
    *
    * Scale shape: the pair stream is the same capped bucket explode as
    * overlapPairs (the df cap still runs BEFORE the bucket shuffle);
    * coverage then joins the qualifying (a, b, fp) rows back to the
    * position table on the (id, fp) key — equi-joins on bounded
    * streams (pairs are minShared-filtered first, so the span explode
    * only runs for reported pairs) — and the span union is computed
    * exactly by exploding each span's k token indices and counting
    * distinct per pair side: k is small (3-8 grams), so the exploded
    * mass is k × matched positions, bounded by k × fingerprint density
    * (~2/(w+1)) × doc length, only for qualifying pairs. An
    * interval-merge window per pair would save that constant k but add
    * a per-pair sort; the explode stays inside codegen.
    */
  def coveragePairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int, maxDf: Int): DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"bad (minShared=$minShared, maxDf=$maxDf)")
    // fpos is lazily checkpointed: it has THREE consumers (the distinct
    // pair table and the two per-side coverage joins), and each gram of
    // every document pays an md5 inside the fingerprint native — the
    // round-21 x64 plan re-ran that explode FIFTEEN times across the
    // consumer subtrees (the pair table's own two consumers compound).
    // The checkpointed frame is the fingerprint-position table,
    // ~2/(w+1) of the gram count — bounded well below the corpus.
    // (overlapPairs deliberately keeps recompute-over-reshuffle for its
    // ONE duplicated pass of the cheaper positionless native; here the
    // pass is heavier and the fan-out is 3x compounding.)
    val fpos = fingerprintPositions(docs, idCol, textCol, k, w)
      .localCheckpoint(false)
    val fps = fpos.select(col(idCol), col("fp")).distinct()
    val good = fps.groupBy("fp")
      .agg(countDistinct(col(idCol)).as("__dfc"))
      .filter(col("__dfc").between(2, maxDf))
      .select("fp")
    // bucket expansion keeping the fp: (a, b, fp) one row per shared
    // surviving fingerprint — same shape as Dedup.explodeMemberPairs
    // but the bucket key rides along for the coverage join back
    val buckets = fps.join(good, "fp")
      .groupBy("fp")
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
    // pf keeps lazy double-computation for its two consumers (the
    // n_shared aggregate and the qualifying join probe): both read the
    // CHECKPOINTED fingerprints, so the duplicate is two cheap
    // bucket-explode passes that overlap inside one job — a pf
    // checkpoint was measured round 21 at parity (median 2.0s both
    // ways at sf0.1) and refused for the extra job barrier.
    val pf = buckets
      .select(col("fp"), col("ids"), posexplode(col("ids")).as(Seq("__i", "a")))
      .select(col("fp"), col("a"),
        explode(slice(col("ids"), col("__i") + lit(2), size(col("ids"))))
          .as("b"))
    val qualified = pf.groupBy("a", "b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    val pfq = pf.join(qualified.select("a", "b"), Seq("a", "b"))
    // per-side covered-token counts: join matched (a, b, fp) rows to
    // that side's positions, explode each span's k indices, count
    // distinct — the exact union of overlapping spans
    def covered(side: String): DataFrame =
      pfq.join(fpos.toDF("__pid", "__pfp", "__pos"),
          col(side) === col("__pid") && col("fp") === col("__pfp"))
        .select(col("a"), col("b"),
          explode(sequence(col("__pos"), col("__pos") + lit(k - 1)))
            .as("__tok"))
        .groupBy("a", "b")
        .agg(countDistinct(col("__tok")).as(s"__cov_$side"))
    // distinct: a document delivered twice (the overlapPairs dup-id
    // scenario) must not duplicate output rows through the length join
    val lens = docs.select(col(idCol),
      size(split(col(textCol), " ")).as("__n")).distinct()
    qualified
      .join(covered("a"), Seq("a", "b"))
      .join(covered("b"), Seq("a", "b"))
      .join(lens.toDF("a", "__na"), "a")
      .join(lens.toDF("b", "__nb"), "b")
      .select(col("a").as("id_a"), col("b").as("id_b"), col("n_shared"),
        round(col("__cov_a").cast("double") / col("__na"), 4).as("cov_a"),
        round(col("__cov_b").cast("double") / col("__nb"), 4).as("cov_b"))
  }

  /** Partial-overlap candidate pairs: (id_a, id_b, n_shared) for every
    * document pair sharing at least `minShared` fingerprints, ignoring
    * fingerprints present in more than `maxDf` distinct documents
    * (boilerplate — they would pair everything with everything).
    * id_a < id_b; deterministic.
    */
  def overlapPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int, maxDf: Int): DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"bad (minShared=$minShared, maxDf=$maxDf)")
    val fps = fingerprints(docs, idCol, textCol, k, w)
    // The df cap runs BEFORE the bucket shuffle: the count aggregate
    // combines map-side (a viral boilerplate fingerprint reaches its
    // reducer as one row per map task, not one per document), and the
    // join back drops capped fingerprints before any id list exists —
    // the first cut filtered AFTER collect_list, which shuffled a
    // whole site-wide-boilerplate bucket to one reducer just to
    // discard it. countDistinct (not a row count) keeps the cap exact
    // under duplicate id rows, and collect_set (not collect_list)
    // makes the bucket itself dup-safe — matching the oracle's
    // DISTINCT (doc_id, fp) — so a duplicated document can never
    // produce an (a, a) self-pair or inflate n_shared. The probe side
    // re-runs the fingerprint pass rather than sharing an exchange
    // with the count branch (recompute-over-reshuffle, the ChunkDedup
    // call: the pass is cheap compiled map work).
    val good = fps.groupBy("fp")
      .agg(countDistinct(col(idCol)).as("__dfc"))
      .filter(col("__dfc").between(2, maxDf))
      .select("fp")
    val buckets = fps.join(good, "fp")
      .groupBy("fp")
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
    Dedup.explodeMemberPairs(buckets, "ids")
      .groupBy(col("a").as("id_a"), col("b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
