package graft.tools

/** Dev tool: wall-time one graded query in isolation, repeated —
  * `runMain graft.tools.TimeQ <queryName> [sfDir] [reps]`. Bench runs
  * the whole suite in fixed order, so a single query's number there
  * carries its neighbors' cache/GC wake; this is the A/B tool for
  * optimizing ONE query (first rep includes planning+codegen, later
  * reps are the steady state).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("x41_importance_weights")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.builder("local[32]", 32)
      .appName("graft-timeq").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to reps) {
      // Bench.materialize, not count(): same primitive as the graded
      // bench, so an A/B here predicts the driver's number (count lets
      // the optimizer elide the work being optimized — see Bench). The
      // query fn runs INSIDE the timed region, exactly like Bench's
      // loop: eager operators (x45's checkpointed stages, x32's label
      // rounds) do their real work at construction, and timing only
      // the materialize would read back cached blocks and miss it.
      val t0 = System.nanoTime()
      graft.Bench.materialize(graft.SparkEntry.queries(name)(spark, dir))
      println(f"TIMEQ $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
