package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` for graded queries to files —
  * `runMain graft.tools.ExplainDump <outDir> <suffix> <q1> [q2 ...]`
  * produces `<outDir>/<query>_<suffix>.txt` per query. The optimization
  * rounds commit these as plans/rNN/<query>_{before,after}.txt so plan
  * claims (Exchange counts, join strategies, PushedFilters) are
  * checkable without running Spark. Runs at the bench configuration
  * (local[32], 32 shuffle partitions) so the dumped plan is the one the
  * bench executes. Both the pre-execution formatted plan and the final
  * post-AQE executed plan are captured: AQE finalizes join strategies
  * and stage reuse only at runtime.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainDump <outDir> <suffix> <query> [query ...] " +
        "[-- <sfDir>]")
    val (names, sfDir) = args.drop(2).span(_ != "--") match {
      case (ns, Array("--", dir)) => (ns.toSeq, dir)
      case (ns, _) => (ns.toSeq, "/root/testdata/sf0.1")
    }
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val spark = graft.GraftSession.builder("local[32]", 32)
      .appName("graft-explaindump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val formatted =
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      // run it so AQE finalizes strategies, then capture the real plan
      graft.Bench.materialize(df)
      val fin = df.queryExecution.executedPlan.toString
      val body = formatted + "\n=== final post-AQE executed plan ===\n" + fin
      Files.write(outDir.resolve(s"${name}_${args(1)}.txt"),
        body.getBytes(StandardCharsets.UTF_8))
      println(s"wrote ${name}_${args(1)}.txt")
    }
    spark.stop()
  }
}
