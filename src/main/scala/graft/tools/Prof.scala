package graft.tools

import org.apache.spark.sql.functions._
import graft.operators._

/** Dev-only stage profiler for the sketch pipelines: times each stage of
  * the slowest bench queries in isolation so optimization targets the
  * real bottleneck instead of the guessed one. Aggregate-and-collect
  * forcing (not .count()) so Catalyst cannot prune the probed stage out
  * of the plan. Not part of the driver contract.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .appName("graft-prof").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.3f  $name (n=$n)")
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.cache().count()
    time("scan only")(docs.count())
    time("tokens")(docs.select(explode(TextAnalysis.tokens(col("text")))).count())
    val sig = Dedup.withMinhashSignature(docs, "text", "sig", 3, 32)
    time("minhash sig (forced)")(
      sig.agg(sum(element_at(col("sig"), 1))).collect().length.toLong)
    time("minhash sig again")(
      sig.agg(sum(element_at(col("sig"), 1))).collect().length.toLong)
    // the exact banded frame the engine buckets on (shared builder — a
    // hand-copied twin here would silently drift from Dedup's real shape)
    val banded = Dedup.bandedFrame(docs, "doc_id", "text", 3, 32, 8)
    time("banded (forced)")(
      banded.agg(sum(pmod(col("bhash"), lit(1000000)))).collect().length.toLong)
    time("buckets")(banded.groupBy("band", "bhash")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count())
    time("minhash candidates")(Dedup.minhashCandidates(
      docs, "doc_id", "text").count())
    // the verify-side per-doc shingle-set materialization in isolation
    // (native hash-set pass — what minhashNearDups joins back); the HOF
    // string formulation it replaced measured ~4x slower here
    time("shingle hash sets (forced)")(docs.select(
      graft.functions.SketchFunctions.shingleHashSet(col("text"), 3).as("s"))
      .agg(sum(size(col("s")))).collect().length.toLong)
    time("minhash neardups")(Dedup.minhashNearDups(
      docs, "doc_id", "text", 0.6).count())
    time("simhash sig (forced)")(docs.select(
      graft.functions.SketchFunctions.simhash64(col("text")).as("sh"))
      .agg(sum(pmod(col("sh"), lit(1000000)))).collect().length.toLong)
    time("simhash neardups")(Dedup.simhashNearDups(
      docs, "doc_id", "text", 6).count())
    docs.unpersist()
    spark.stop()
  }
}
