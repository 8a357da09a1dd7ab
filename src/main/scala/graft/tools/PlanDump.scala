package graft.tools

/** Dev tool: print the executed physical plan of any graded query —
  * `runMain graft.tools.PlanDump <queryName> [sfDir]`. The fast feedback
  * loop for the ".explain and iterate until it's the plan you'd want"
  * discipline.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("s19_window_topk")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[4]", 4)
      .appName("graft-plandump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.executedPlan.toString)
    // AQE finalizes stage reuse (ReusedExchange/ReusedQueryStage) only
    // at runtime — execute, then print the plan that actually ran
    df.collect()
    println("=== final (post-AQE) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
