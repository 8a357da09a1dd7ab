package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev measurement tool (round 22): A/B the round-22 Components.minLabel
  * (changed-count observe + endgame stability probe) against a frozen
  * verbatim copy of the round-21 form (label-sum observe), interleaved
  * rep-by-rep in ONE JVM on the exact x57 graph so host drift cancels.
  * JVM-per-phase wall A/Bs on this host swing 1.5-3x with neighbor load;
  * this tool is how the round-22 record separated the real per-call cost
  * of the __old tagging (~0.04 s/round of plan/codegen weight at sf0.1,
  * probe never firing on clique graphs) from that noise. The old copy is
  * FROZEN evidence, not a code path — nothing outside this tool calls it.
  */
object CCAB {
  // the round-21 minLabel, verbatim (convergence = label-sum equality)
  def minLabelOld(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25, jumpsPerRound: Int = 1): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("cluster"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    var prevSum: Option[java.math.BigDecimal] = None
    while (!converged && it < maxIter) {
      val nbr = sym
        .join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("cluster"))
      val propagated = labels.unionByName(nbr)
        .groupBy(col("id"))
        .agg(min(col("cluster")).as("cluster"))
      var jumped = propagated
      var jmp = 0
      while (jmp < jumpsPerRound) {
        val reps = jumped
          .select(col("id").as("rid"), col("cluster").as("rcluster"))
        jumped = jumped
          .join(reps, jumped("cluster") === reps("rid"), "left")
          .select(jumped("id"),
            least(jumped("cluster"),
              coalesce(col("rcluster"), jumped("cluster"))).as("cluster"))
        jmp += 1
      }
      val obs = new org.apache.spark.sql.Observation(s"ccab_old_$it")
      val next = jumped
        .observe(obs, sum(col("cluster")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("lsum"))
        .localCheckpoint(true)
      labels.unpersist()
      labels = next
      val lsum = Option(obs.get("lsum").asInstanceOf[java.math.BigDecimal])
      converged = lsum match {
        case None => true
        case some => prevSum == some
      }
      prevSum = lsum
      it += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(s"no converge in $maxIter")
    labels
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.builder("local[32]", 32)
      .appName("graft-ccab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 150)
    val pairs = graft.operators.Dedup
      .blockedJaccardPairs(docs, "doc_id", "text", "lang", 0.5)
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .localCheckpoint(true) // shared input: A/B times ONLY minLabel
    val nodes = docs.select(col("doc_id").as("id")).localCheckpoint(true)
    // warmup both paths (codegen caches)
    graft.operators.Components.minLabel(nodes, pairs).unpersist()
    minLabelOld(nodes, pairs).unpersist()
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.operators.Components.minLabel(nodes, pairs).unpersist()
      val tNew = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      minLabelOld(nodes, pairs).unpersist()
      val tOld = (System.nanoTime() - t1) / 1e9
      println(f"CCAB rep$r new=$tNew%.3f old=$tOld%.3f")
    }
    spark.stop()
  }
}
