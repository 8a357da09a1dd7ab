package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate nearest neighbors: a k-NN GRAPH built by
  * NN-descent (Dong et al., "Efficient k-nearest neighbor graph
  * construction for generic similarity measures", WWW 2011) and a
  * beam-expansion search over it — the alternative ANN family the
  * round-15 blocked-kNN refusal named: IVF cell blocking cannot be
  * both faithful and cheap on quasi-orthogonal structure because
  * fidelity there is a property of per-point NEIGHBORHOODS, not of
  * global cells; a k-NN graph stores exactly those neighborhoods.
  *
  * Spark-first shapes:
  *  - construction is iterated relational algebra: candidate edges =
  *    current ∪ reversed ∪ neighbors-of-neighbors (one self-join),
  *    scored with the compiled cosine native, pruned to the best k
  *    per node by one (sim desc, nbr) rank window. Every iteration is
  *    a fixed number of joins/aggregations over (id, nbr) pairs —
  *    shuffle keys are node ids, so a hot node never serializes more
  *    than its own candidate list, and lineage is cut per round
  *    (localCheckpoint) exactly like Components.minLabel.
  *  - search is a driver-coordinated beam loop (hops are inherently
  *    sequential): the frontier frame carries (query_id, id) rows —
  *    |queries| × beam — joined against the graph for expansion and
  *    against the corpus for scoring; queries are bounded by contract
  *    (the x08/x70 broadcast class), so every per-hop frame is
  *    index-sized, never corpus-sized.
  *
  * Determinism: the ring init (ringInit) is id-order arithmetic, all
  * similarities are rounded to 6 decimals before ranking (x08's
  * discipline), and every rank breaks ties on the neighbor id — so a
  * single refinement step is exactly SQL-replayable (graded as x78)
  * and the full build is deterministic run-to-run.
  *
  * Reference scope: the reference engine (nisacharan/sql_engine,
  * sqlengine.py) has no vector surface at all; this family extends
  * the repo's LLM-pipeline ambitions (SURVEY §7.4), not the
  * reference surface.
  */
object GraphAnn {

  private def reserve(df: DataFrame, entry: String, names: String*): Unit =
    names.foreach(c => require(!df.columns.contains(c),
      s"GraphAnn.$entry reserves column name '$c'; rename the input"))

  /** Deterministic starter graph: nodes in id order form a ring, and
    * node at position r points at positions (r + j·stride) mod n for
    * j = 1..min(k, n-1) — id-order arithmetic both engines replay
    * exactly. A stride > 1 spreads initial edges across the ring
    * (pure successors would start every neighborhood maximally
    * clustered); it must be PRIME, and rings it divides fall back to
    * stride 1, so targets are always distinct and non-self. Output:
    * (id, nbr), min(k, n-1) rows per node.
    */
  /** Primality check for the ring stride — distinctness of the ring
    * targets r + j·s mod n for j = 1..min(k, n-1) needs gcd(s, n) = 1,
    * and for PRIME s that reduces to the one SQL-cheap test
    * `n % s != 0` (per-ring fallback to stride 1, which is coprime to
    * everything). A composite stride would need a full gcd per ring.
    */
  private def requirePrimeStride(stride: Int): Unit =
    require(stride >= 2 &&
      (2 to math.sqrt(stride.toDouble).toInt).forall(stride % _ != 0),
      s"stride must be a prime >= 2, got $stride (coprimality with " +
        "every ring size is checked as a cheap modulus only for primes)")

  /** The shared ring-target construction over a ranked frame carrying
    * (__r = 0-based rank within its ring, __n = ring size): neighbors
    * j = 1..min(k, n-1) at rank r + j·s mod n, with s falling back to
    * 1 for rings whose size the prime stride divides (n = s, 2s, …
    * would otherwise collapse targets onto self/duplicates — a
    * 7-member cell under stride 7 emitted ZERO edges, caught by the
    * round-16 self-review). Coprime stride + j ≤ n-1 make every
    * target distinct and non-self by construction.
    */
  private def ringTargets(ranked: DataFrame, k: Int, stride: Int)
      : DataFrame = {
    val eff = when(pmod(col("__n"), lit(stride)) === 0, lit(1L))
      .otherwise(lit(stride.toLong))
    ranked
      .withColumn("__j", explode(when(col("__n") > 1,
          sequence(lit(1L), least(lit(k.toLong), col("__n") - 1L)))
        .otherwise(array().cast("array<bigint>"))))
      .withColumn("__r2", pmod(col("__r") + col("__j") * eff, col("__n")))
  }

  /** The (id, __r, __n) densification frame ringInit checkpoints —
    * exposed pre-checkpoint so the spec can pin that its plan carries
    * no unpartitioned window (the checkpoint hides the subtree from
    * downstream plans).
    */
  private[graft] def ringRanked(corpus: DataFrame, idCol: String,
      shards: Int): DataFrame = {
    val ids = corpus.select(col(idCol))
    Ranking.globalOrdinal(ids, Seq(col(idCol)), "__r", shards)
      .crossJoin(broadcast(ids.agg(count(lit(1)).as("__n"))))
  }

  def ringInit(corpus: DataFrame, idCol: String, k: Int,
      stride: Int = 7): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    requirePrimeStride(stride)
    reserve(corpus, "ringInit", "__r", "__n", "__j", "__r2", "nbr")
    val spark = corpus.sparkSession
    val shards = spark.sessionState.conf.numShufflePartitions
    // id densification via the sharded global ordinal (Ranking.scala's
    // three-pass shape: range-repartition, rank within shard, offset by
    // shard sizes) — NOT row_number over an unpartitioned window, which
    // would serialize the whole corpus through one task. The ranked
    // frame is lazily checkpointed because TWO consumers read it (the
    // ring-target arithmetic and the rank->id lookup join): without the
    // cut, column pruning can rewrite the branches differently, break
    // canonical equality of the shared range exchange, and let each
    // branch sample DIFFERENT range boundaries — silently inconsistent
    // ranks (the Novelty/selectByTokenBudget failure class).
    val ranked = ringRanked(corpus, idCol, shards).localCheckpoint(false)
    ringTargets(ranked, k, stride)
      .select(col(idCol), col("__r2"))
      .join(
        ranked.select(col("__r").as("__r2"), col(idCol).as("nbr")),
        Seq("__r2"))
      .select(col(idCol), col("nbr"))
  }

  /** IVF-bootstrapped starter graph: the ring construction applied
    * WITHIN each node's IVF cell (rank-within-cell arithmetic), so the
    * initial neighborhood already carries whatever locality the coarse
    * quantizer found, and NN-descent refines from there instead of
    * from global noise — the standard practice when the
    * neighbor-of-neighbor premise is too weak to bootstrap from a
    * random graph (measured: on the quasi-orthogonal ×100 slice a
    * ring-init graph stays near-random after 12 rounds while this
    * init starts at IVF quality). Nodes alone in their cell get ONE
    * global-fallback edge to the smallest non-self corpus id — an
    * edgeless node could never re-enter, because NN-descent candidates
    * (current ∪ reversed ∪ neighbors-of-neighbors) derive only from
    * existing edges, so a zero-degree node stays permanently absent
    * from the graph and unreachable by beam expansion; every other
    * node gets min(k, cellSize-1) distinct within-cell edges
    * (sequence(1, 0)'s DESCENDING-array trap and the stride-divides-
    * cell-size collapse are both guarded in ringTargets).
    */
  def cellRingInit(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Double])], k: Int,
      stride: Int = 7): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    requirePrimeStride(stride)
    reserve(corpus, "cellRingInit",
      "__r", "__n", "__j", "__r2", "nbr", "cell")
    val assigned = Similarity.ivfAssign(
      corpus.select(col(idCol), col(vecCol)), vecCol, centroids)
      .select(col(idCol), col("cell"))
    val ranked = assigned
      .withColumn("__r", row_number().over(Window
        .partitionBy(col("cell")).orderBy(col(idCol))) - 1)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("cell"))))
    val inCell = ringTargets(ranked, k, stride)
      .select(col(idCol), col("cell"), col("__r2"))
      .join(
        ranked.select(col("cell"), col("__r").as("__r2"),
          col(idCol).as("nbr")),
        Seq("cell", "__r2"))
      .select(col(idCol), col("nbr"))
    // singleton-cell fallback: one deterministic edge to the globally
    // smallest non-self id (a 1-row broadcast of the two smallest ids),
    // so every node has degree >= 1 and can re-enter through reverse
    // edges — ringTargets emits nothing for __n = 1
    val mins = corpus.select(col(idCol)).orderBy(col(idCol)).limit(2)
      .agg(min(col(idCol)).as("__m1"), max(col(idCol)).as("__m2"))
    val singles = ranked.filter(col("__n") === 1)
      .crossJoin(broadcast(mins))
      .select(col(idCol),
        when(col(idCol) === col("__m1"), col("__m2"))
          .otherwise(col("__m1")).as("nbr"))
      .filter(col(idCol) =!= col("nbr"))
    inCell.unionByName(singles)
  }

  /** One NN-descent refinement round: candidates = current edges ∪
    * reversed edges ∪ neighbors-of-neighbors, scored, best k per node
    * by (sim desc, nbr id) kept. Monotone in neighborhood quality:
    * the current edge set is always among the candidates, so a
    * node's kept-edge similarity profile never degrades (spec-pinned).
    * Output: (id, nbr, sim), sim rounded to 6 decimals.
    */
  def nnDescentStep(graph: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    reserve(corpus, "nnDescentStep", "nbr", "sim", "__rn", "__vq", "__vn")
    val edges = graph.select(col(idCol), col("nbr"))
    val rev = edges.select(col("nbr").as(idCol), col(idCol).as("nbr"))
    val hop2 = edges.select(col(idCol), col("nbr").as("__mid"))
      .join(edges.select(col(idCol).as("__mid"), col("nbr")), Seq("__mid"))
      .select(col(idCol), col("nbr"))
    val cand = edges.union(rev).union(hop2)
      .filter(col(idCol) =!= col("nbr"))
      .distinct()
    val vecs = corpus.select(col(idCol), col(vecCol))
    val scored = cand
      .join(vecs.toDF(idCol, "__vq"), Seq(idCol))
      .join(vecs.toDF("nbr", "__vn"), Seq("nbr"))
      .select(col(idCol), col("nbr"),
        round(Similarity.cosine(col("__vq"), col("__vn")), 6).as("sim"))
    scored
      .withColumn("__rn", row_number().over(Window
        .partitionBy(col(idCol))
        .orderBy(col("sim").desc, col("nbr"))))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("nbr"), col("sim"))
  }

  /** Full NN-descent build from the ring init: `iters` refinement
    * rounds, lineage cut per round (the Components.minLabel pattern —
    * an uncut plan doubles per round and the optimizer re-derives
    * every prior join). Output: (id, nbr, sim), k rows per node (fewer
    * only if the corpus itself has < k+1 rows).
    */
  def nnDescent(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    var g = ringInit(corpus, idCol, k)
    var out: DataFrame = null
    var i = 0
    while (i < iters) {
      out = nnDescentStep(g, corpus, idCol, vecCol, k).localCheckpoint()
      g = out.select(col(idCol), col("nbr"))
      i += 1
    }
    out
  }

  /** Beam search over a prebuilt k-NN graph for a bounded query set:
    * seed each query with its best `beam` nodes from a deterministic
    * 1-in-`sampleMod` hash sample of the corpus (md5 of the id — the
    * Split.assign family), then `hops` rounds of expand-through-graph
    * + score + keep-best-`beam`, accumulating every scored visit;
    * final answer is each query's best k visited nodes. Every
    * intermediate frame is |queries| × beam (× k during expansion) —
    * index-sized. Fidelity dial = (beam, hops): with enough hops and
    * beam ≥ component size the search degenerates to scoring every
    * reachable node (the probe-everything analogue; spec-pinned on a
    * small slice).
    *
    * Caller-provided `seeds` contract: a (query_id, id) frame; it is
    * deduplicated defensively (duplicate seed rows would ride the
    * accumulator as duplicate visited rows and crowd the final top-k
    * window), and every query_id in `queries` MUST appear in it — a
    * query with no seed rows has an empty walk and returns zero rows
    * (by design: the hybrid's probe-seeded caller always covers every
    * query; there is no silent fallback to the hash sample).
    */
  def graphTopK(graph: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, queries: Seq[(Long, Array[Double])],
      k: Int, beam: Int, hops: Int, sampleMod: Int = 64,
      seeds: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && beam >= k && hops >= 0 && sampleMod >= 1,
      s"need beam >= k >= 1, hops >= 0 ($beam, $k, $hops)")
    require(queries.nonEmpty, "need at least one query")
    reserve(corpus, "graphTopK",
      "query_id", "qvec", "sim", "rank", "__rn")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qdf = broadcast(
      queries.map { case (qid, q) => (qid, q.toSeq) }
        .toDF("query_id", "qvec"))
    val vecs = corpus.select(col(idCol), col(vecCol))
    def score(cand: DataFrame): DataFrame = cand
      .join(vecs, Seq(idCol))
      .join(qdf, Seq("query_id"))
      .select(col("query_id"), col(idCol),
        round(Similarity.cosine(col(vecCol), col("qvec")), 6).as("sim"))
    def best(scored: DataFrame, n: Int): DataFrame = scored
      .withColumn("__rn", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col(idCol))))
      .filter(col("__rn") <= n)
      .select(col("query_id"), col(idCol), col("sim"))
    // entry points: caller-provided (query_id, id) pairs — e.g. the
    // members of each query's nprobe nearest IVF cells, the hybrid
    // that gives the walk a starting point INSIDE the right
    // neighborhood when global similarity carries no gradient toward
    // it — or the default deterministic 1-in-sampleMod hash sample
    // crossed with every query. The sample is unioned with the first
    // `beam` ids so a small corpus where the 1-in-sampleMod filter
    // matches nothing (P ≈ (1 - 1/64)^n — ~21% at n=100) still seeds
    // every query instead of silently returning zero rows; distinct()
    // because a duplicated seed would ride the accumulator as a
    // duplicate visited row and crowd the final top-k window (the
    // same defect class the hop loop's distinct-before-exceptAll
    // guards against)
    val seedCand = seeds.map(_.select(col("query_id"), col(idCol))
        .distinct())
      .getOrElse(vecs
        .filter(pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8),
          16, 10).cast("long"), lit(sampleMod)) === 0)
        .select(col(idCol))
        .unionByName(vecs.select(col(idCol)).orderBy(col(idCol))
          .limit(beam))
        .distinct()
        .crossJoin(qdf.select(col("query_id"))))
    // visited accumulates EVERY scored (query, node) pair — the full
    // scored expansion is unioned in, and best() prunes only the
    // FRONTIER — so a scored-but-below-beam node can never be dropped
    // from the answer set or redundantly re-scored on a later hop;
    // each hop's leg is checkpointed, cutting the union lineage to a
    // shallow tree of materialized legs (minLabel pattern)
    var visited = score(seedCand).localCheckpoint()
    var frontier = best(visited, beam).select(col("query_id"), col(idCol))
    var h = 0
    while (h < hops) {
      // distinct BEFORE the multiset subtract: several frontier nodes
      // sharing a neighbor give (q, nbr) multiplicity > 1, and
      // exceptAll removes only `visited`'s multiplicity-1 copy — the
      // leftovers would re-enter as DUPLICATE visited rows and crowd
      // real nodes out of the final top-k window (caught by the
      // dial experiment: recall at hops=5 measured BELOW hops=3,
      // impossible for a monotone accumulator)
      val expanded = frontier
        .join(graph.select(col(idCol), col("nbr")), Seq(idCol))
        .select(col("query_id"), col("nbr").as(idCol))
        .distinct()
        .exceptAll(visited.select(col("query_id"), col(idCol)))
      val newly = score(expanded).localCheckpoint()
      visited = visited.unionByName(newly)
      frontier = best(newly, beam).select(col("query_id"), col(idCol))
      h += 1
    }
    best(visited, k)
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col(idCol))).cast("int"))
      .select(col("query_id"), col("rank"), col(idCol), col("sim"))
  }
}
