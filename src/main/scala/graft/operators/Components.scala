package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the last mile of near-dup
  * dedup: candidate pairs (x05/x06-style) only RELATE documents; keeping
  * one document per duplicate CLUSTER needs the transitive closure
  * (a~b, b~c => keep one of {a,b,c}).
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Every node starts labelled with itself; each round every node takes
  * the minimum of its own label, its neighbors' labels, and its LABEL'S
  * label (the pointer jump — following the representative's own
  * representative halves chain lengths every round). Propagation alone
  * converges in diameter rounds; the jump makes it O(log diameter), so
  * the iteration cap is a formality for any physically possible graph
  * (2^25 diameter) rather than a correctness cliff for long chains.
  * Near-dup graphs are dense cliques that finish in 2-3 rounds either
  * way. Each round is two joins + one aggregate, all shuffles on the
  * node id; lineage is cut with localCheckpoint every round so the plan
  * does not grow exponentially across iterations (the classic iterative-
  * Spark trap).
  *
  * The reference has nothing transitive at all (its only "join" is the
  * materialized cross product, /root/reference/sqlengine.py:120-135);
  * this is extension surface, oracle-checked against DuckDB's recursive
  * CTE in x32.
  */
object Components {

  /** Label every node with the minimum node id of its connected
    * component. `nodes`: one column `id`; `edges`: columns (`a`, `b`) —
    * undirected, any orientation, self-loops and duplicates tolerated.
    * Returns (id, cluster) with cluster = min id reachable (including
    * itself, so isolated nodes label themselves).
    *
    * Precondition: edge endpoints ⊆ `nodes` — an edge mentioning an id
    * absent from `nodes` contributes propagation through that id's LABEL
    * (it has none) and is effectively ignored; callers derive `edges`
    * from the same frame as `nodes` (as x32 does), which satisfies this
    * by construction. Throws if maxIter rounds pass without convergence
    * rather than returning a partially-propagated labelling.
    */
  def minLabel(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    // symmetric adjacency: propagate across the edge in both directions
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("cluster"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    // Checkpoint blocks superseded inside the loop are freed eagerly:
    // each round caches one copy of the label table, so a run that never
    // unpersisted would hold rounds+2 cached tables at once — on a real
    // cluster that evicts working storage blocks, and across a 90-query
    // bench loop it accumulates into JVM-wide memory pressure.
    while (!converged && it < maxIter) {
      // each node's best neighbor label this round
      val nbrBest = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid"))
        .agg(min(col("cluster")).as("nbr_cluster"))
      val propagated = labels
        .join(nbrBest, labels("id") === nbrBest("nid"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_cluster"), col("cluster")))
            .as("cluster"))
      // pointer jump: my representative's representative is at least as
      // small as mine (labels only ever decrease), so chase one hop
      val reps = propagated
        .select(col("id").as("rid"), col("cluster").as("rcluster"))
      val next = propagated
        .join(reps, propagated("cluster") === reps("rid"), "left")
        .select(propagated("id"),
          least(propagated("cluster"),
            coalesce(col("rcluster"), propagated("cluster"))).as("cluster"))
        .localCheckpoint(true)
      // round 1 always changes something on any graph with an edge, so
      // the convergence probe (a join + count action) starts at round 2;
      // an edgeless input just pays one extra no-op round
      val changed =
        if (it == 0) 1L
        else next.join(labels.withColumnRenamed("cluster", "old"), "id")
          .filter(col("cluster") =!= col("old")).count()
      // `next` is materialized (eager checkpoint) and the probe above was
      // the last reader of the previous round's table — free it now.
      labels.unpersist()
      labels = next
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    if (!converged)
      // Partially-propagated labels are silently WRONG clusterings; with
      // pointer jumping maxIter=25 covers diameter 2^25, so hitting the
      // cap means a pathological input, not a tuning problem.
      throw new IllegalStateException(
        s"Components.minLabel did not converge in $maxIter rounds")
    // The returned frame is backed by the final checkpoint block (its
    // lineage is cut, so it must stay cached to remain readable); it is
    // freed by the ContextCleaner once the caller drops the reference.
    labels
  }

  /** Dedup keep-list from near-dup pairs: one row per cluster with the
    * keeper (min id) and the cluster size. Docs with no near-dup partner
    * form singleton clusters and are always kept.
    */
  def dedupClusters(nodes: DataFrame, pairs: DataFrame): DataFrame =
    minLabel(nodes, pairs)
      .groupBy("cluster")
      .agg(count(lit(1)).as("cluster_size"))
}
