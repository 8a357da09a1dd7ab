package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: isolate the per-stage cost of the n-gram explode on
  * LONG documents — `runMain graft.tools.Probe [tokensPerDoc]`. The
  * boilergrams A/B measured ~24µs/gram on 400-token docs vs ~2.3µs on
  * ~150-token docs; this breaks the pipeline into stages to find the
  * superlinear step (real web docs are 10^3-10^4 tokens, so a
  * doc-length superlinearity would matter at 100 TB).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val nTok = args.headOption.map(_.toInt).getOrElse(400)
    val spark = graft.GraftSession.builder("local[32]", 32)
      .appName("graft-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val reps = nTok / 8
    val boiler = docs01.withColumn("text",
      array_join(array_repeat(
        array_join(slice(split(col("text"), " "), 1, 8), " "), reps), " "))
      .localCheckpoint()
    def t(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    t("tokens_split")(boiler.select(
      size(graft.operators.TextAnalysis.tokens(col("text"))).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    t("shingles_explode")(boiler.select(
      explode(graft.operators.Dedup.shingles(col("text"), 4)).as("gram"))
      .count())
    t("shingles_md5")(boiler.select(col("doc_id"),
      explode(graft.operators.Dedup.shingles(col("text"), 4)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("g")).count())
    t("plus_repartition_dedup")(boiler.select(col("doc_id"),
      explode(graft.operators.Dedup.shingles(col("text"), 4)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("g"))
      .repartition(col("doc_id")).dropDuplicates("doc_id", "g").count())
    t("rolling_hash")(boiler.select(
      graft.operators.TextAnalysis.rollingHash(col("text")).as("h"))
      .agg(count(col("h"))).collect()(0).getLong(0))
    t("char_ngrams")(boiler.select(
      size(graft.operators.Dedup.charNgrams(col("text"), 3)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0))
    spark.stop()
  }
}
