package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only A/B: cost of the internal digest choice on the real gram
  * mass (guide §1: measure before changing). Compares the current
  * unhex(md5(gram)) 16-byte digest against a 2x-xxhash64 128-bit pair
  * over the exact explode the decontaminate/novelty/chunk-dedup family
  * runs, with the same aggregate forcing (sum over a digest byte /
  * hash) so Catalyst cannot prune the hash out.
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .appName("graft-hashbench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents")
    def grams(n: Int) = {
      val toks = split(col("text"), " ")
      docs.select(col("doc_id"), toks.as("__toks"))
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), size(col("__toks")) - lit(n)),
          i => array_join(slice(col("__toks"), (i + lit(1)).cast("int"),
            lit(n)), " "))).as("gram"))
    }
    def time(name: String)(f: => Any): Unit = {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = f
        println(f"${(System.nanoTime() - t0) / 1e9}%8.3f  $name rep$rep ($r)")
      }
    }
    val g = grams(4)
    time("explode only (count)")(g.agg(count(lit(1))).collect()(0).getLong(0))
    time("md5 hex string")(g.select(md5(col("gram")).as("d"))
      .agg(sum(length(col("d")))).collect()(0))
    time("unhex(md5) 16B")(g.select(unhex(md5(col("gram"))).as("d"))
      .agg(sum(length(col("d")))).collect()(0))
    time("xxhash64 x2")(g.select(pmod(xxhash64(col("gram")), lit(1000L)).as("d1"),
        pmod(xxhash64(lit(1), col("gram")), lit(1000L)).as("d2"))
      .agg(sum(col("d1") + col("d2"))).collect()(0))
    time("xxhash64 x1")(g.select(pmod(xxhash64(col("gram")), lit(1000L)).as("d1"))
      .agg(sum(col("d1"))).collect()(0))
    // the downstream consumer shape: distinct (id, digest) then count
    time("distinct md5")(g.select(col("doc_id"), md5(col("gram")).as("d"))
      .repartition(col("doc_id")).dropDuplicates("doc_id", "d")
      .agg(count(lit(1))).collect()(0))
    time("distinct xx2")(g.select(col("doc_id"), xxhash64(col("gram")).as("d1"),
        xxhash64(lit(1), col("gram")).as("d2"))
      .repartition(col("doc_id")).dropDuplicates("doc_id", "d1", "d2")
      .agg(count(lit(1))).collect()(0))
    spark.stop()
  }
}
