package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only margin probe (deleted before commit): for every doc pair,
  * exact shingle-Jaccard vs simhash Hamming distance — picks a safe
  * blocking radius for x07.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32)
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = graft.Tables.load(spark, d, "documents")
      val sets = docs.select(col("doc_id").as("id"),
        graft.functions.SketchFunctions.shingleHashSet(col("text"), 3).as("sh"),
        graft.functions.SketchFunctions.simhash64(col("text")).as("sim"))
      val a = sets.toDF("id_a", "sh_a", "sim_a")
      val b = sets.toDF("id_b", "sh_b", "sim_b")
      val pairs = a.join(b, col("id_a") < col("id_b")
          && size(col("sh_a")) * 10 >= size(col("sh_b")) * 4
          && size(col("sh_b")) * 10 >= size(col("sh_a")) * 4)
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jac"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("ham"))
        .filter(col("jac") >= 0.35)
        .cache()
      for (t <- Seq(0.4, 0.5, 0.6, 0.7, 0.8)) {
        val r = pairs.filter(col("jac") >= t)
          .agg(count(lit(1)).as("n"), max(col("ham")).as("max_ham"),
            min(col("jac")).as("min_jac")).collect()(0)
        println(s"[$sf] J>=$t n=${r.get(0)} max_ham=${r.get(1)} min_jac=${r.get(2)}")
      }
      // precision side: highest-J pair NOT in the near-dup band
      val lo = pairs.filter(col("jac") < 0.4)
        .agg(count(lit(1)).as("n"), max(col("jac")).as("max_lo_jac"),
          min(col("ham")).as("min_lo_ham")).collect()(0)
      println(s"[$sf] J in [0.35,0.4): n=${lo.get(0)} max_jac=${lo.get(1)} min_ham=${lo.get(2)}")
      pairs.unpersist()
    }
    spark.stop()
  }
}
