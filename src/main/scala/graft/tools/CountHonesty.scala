package graft.tools

/** Dev audit: for every graded query, wall-time `count()` against full
  * row materialization (`queryExecution.toRdd.foreach`) — the gap is
  * work the optimizer ELIDES under count (pruned projections over a
  * scan, row-preserving outer joins against aggregated-unique keys,
  * dropped final sorts). A large ratio means a count()-based benchmark
  * of that query measures a corpus scan, not the operator
  * (`runMain graft.tools.CountHonesty [sfDir] [namePrefix]`).
  */
object CountHonesty {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefix = args.lift(1).getOrElse("")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .appName("graft-count-honesty").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- graft.SparkEntry.queries.keys.toSeq.sorted
         if name.startsWith(prefix)) {
      val fn = graft.SparkEntry.queries(name)
      try {
        fn(spark, dir).count() // warm plans/codegen/page cache
        var t0 = System.nanoTime()
        fn(spark, dir).count()
        val cnt = (System.nanoTime() - t0) / 1e9
        // warm and timed runs use SEPARATE DataFrame instances: timing
        // a foreach on the rdd that the warm pass already ran would
        // re-read its shuffle files and measure nothing
        fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
        t0 = System.nanoTime()
        fn(spark, dir).queryExecution.toRdd.foreach(_ => ())
        val forced = (System.nanoTime() - t0) / 1e9
        println(f"""{"q":"$name","count_sec":$cnt%.3f,"forced_sec":$forced%.3f,"ratio":${forced / math.max(cnt, 1e-9)}%.1f}""")
      } catch {
        case e: Exception =>
          println(s"""{"q":"$name","err":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}
