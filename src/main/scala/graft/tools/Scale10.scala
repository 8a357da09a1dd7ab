package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.operators.{Components, Dedup, Ranking, Similarity}

/** The 1000x thought experiment, measured one decade further: generates
  * a 10x slice of the sf0.1 documents/embeddings corpora and re-times
  * the headline dedup/ANN/vocab pipelines on both, so SCALE.md's
  * "near-flat scaling" claim rests on an extra measured decade
  * (500 -> 5,000 -> 50,000 docs) instead of stopping at sf0.1.
  *
  * The x10 corpus is NOT naive duplication — 10 copies of every row
  * would plant ~45 near-dup partners per document and blow the pair
  * output up quadratically, measuring a different (adversarial)
  * workload. Instead each replica is a disjoint shard of the same
  * statistical shape:
  *  - documents: replica r suffixes every token with "_r" — token
  *    counts, lengths, and language mix are preserved, the vocabulary
  *    grows 10x (as a real corpus's would), and replicas share no
  *    shingles, so near-dup structure per replica matches the original.
  *  - embeddings: replica r flips a deterministic per-replica sign
  *    pattern across coordinates — WITHIN a replica every pairwise
  *    dot product is bit-identical to the original (sign flips cancel:
  *    (s_i a_i)(s_i b_i) = a_i b_i), while cross-replica similarities
  *    are scrambled to noise, so the near-dup pair mass scales 10x.
  *
  * Usage: runMain graft.tools.Scale10 [outDir]  (default
  * target/scale10). Generates the slice if absent, then times the
  * pipelines on sf0.1 and on the slice, one JSON line per (dir,
  * pipeline), warm timing (second of two runs).
  */
object Scale10 {

  private val SRC = "/root/testdata/sf0.1"

  private def gen(spark: SparkSession, outDir: String): Unit = {
    val reps = spark.range(0, 10).select(col("id").cast("int").as("rep"))

    val docs = spark.read.parquet(s"$SRC/documents.parquet")
    docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("rep") * 10000L).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_"), col("rep").cast(StringType))), " "))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$SRC/embeddings.parquet")
    emb.crossJoin(reps)
      .select(
        (col("vec_id") + col("rep") * 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * when(pmod(xxhash64(col("rep"), i), lit(2L)) === 0, lit(1.0f))
            .otherwise(lit(-1.0f))).cast("float")).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  /** The five headline pipelines, full-corpus (no doc_id bounds — the
    * graded queries cap rows for oracle size; scaling is measured on
    * the unbounded operator shapes the captions advertise).
    */
  private def pipelines(spark: SparkSession, dir: String)
      : Seq[(String, () => Long)] = {
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Seq(
      "minhash_neardups" -> (() =>
        Dedup.minhashNearDups(docs, "doc_id", "text", 0.6).count()),
      "simhash_md5_neardups" -> (() =>
        Dedup.simhashMd5NearDups(docs, "doc_id", "text", 6).count()),
      // (4,4) is the graded x10 setting; (8,8) widens each band to 8
      // sign bits (all 64 coords) — the selectivity dial a concentrated
      // sign distribution needs at scale (collision rate per band drops
      // with the square of the concentration)
      "embed_neardups_4x4" -> (() =>
        Similarity.signBandNearDupPairs(emb, 0.3).count()),
      "embed_neardups_8x8" -> (() =>
        Similarity.signBandNearDupPairs(emb, 0.3,
          bands = 8, rowsPerBand = 8).count()),
      "vocab_encode" -> (() => {
        val toks = docs.select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        val vocab = Ranking.globalOrdinal(
          toks.groupBy("tok").agg(count(lit(1)).as("cnt")),
          Seq(col("cnt").desc, col("tok").asc), "tok_id",
          shards = spark.sparkContext.defaultParallelism)
          .select("tok", "tok_id")
        toks.join(vocab, "tok")
          .groupBy("doc_id")
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("pos"), col("tok_id")))),
              e => e.getField("tok_id").cast(StringType)), " ").as("ids"))
          .count()
      }),
      "dedup_clusters" -> (() => {
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 0.6)
          .select(col("id_a").as("a"), col("id_b").as("b"))
        Components.minLabel(docs.select(col("doc_id").as("id")), pairs)
          .count()
      }),
      "repetition_signals" -> (() =>
        graft.operators.Repetition.signals(docs, "doc_id", "text").count()),
      "importance_weights" -> (() =>
        graft.operators.Importance.weights(
          docs, docs.filter(col("source") === "src0"),
          "doc_id", "text").count()),
      "bpe_pairs" -> (() =>
        graft.operators.Bpe.topPairs(graft.operators.Bpe.pairCounts(
          graft.operators.Bpe.initSymbols(
            graft.operators.Bpe.wordFreqs(docs, "text"))), 20).count()))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/scale10")
    // optional extra args: run only these pipelines (dev loop)
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-scale10")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$outDir/documents.parquet").isDirectory) {
      gen(spark, outDir)
      println(s"""{"generated":"$outDir"}""")
    }
    def f(v: Double) = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    for (dir <- Seq(SRC, outDir); (name, run) <- pipelines(spark, dir)
         if only.isEmpty || only(name)) {
      run() // warm: plans, codegen, page cache
      val t0 = System.nanoTime()
      val rows = run()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"dir":"$dir","pipeline":"$name","sec":${f(sec)},"rows":$rows}""")
    }
    spark.stop()
  }
}
