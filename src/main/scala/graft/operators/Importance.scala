package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data selection via hashed n-gram importance weights — the DSIR
  * technique (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): score every raw-corpus document by how much
  * its hashed n-gram distribution looks like a small high-quality target
  * corpus, then sample the raw corpus proportionally to the score.
  *
  * Determinism: the gram→bucket hash is the md5-prefix fold (the same
  * cross-engine fold as s46/x07/x39), bucket counts are exact integers,
  * and each per-gram ratio is computed as exactly two int→double casts,
  * two IEEE multiplications and one IEEE division — all correctly
  * rounded, hence bit-identical in any engine — then quantized with
  * floor(1e6·r) to an integer so the per-document SUM is exact and
  * order-independent. (A log-likelihood ratio would be the textbook
  * form, but ln is not correctly rounded in either JVM or C runtimes —
  * the quantized linear ratio is the determinism-preserving variant; it
  * is monotone in the same per-gram evidence.)
  *
  * Scale shape at 100 TB:
  *  - the two histograms are ≤ `buckets` rows BY CONSTRUCTION, whatever
  *    the corpus size — broadcasting them is structurally safe (unlike
  *    the x25 vocabulary join, whose size grew with the data);
  *  - the target corpus is small and read once; the raw corpus is read
  *    twice (fit the raw distribution, then score) — inherent to
  *    importance weighting, both passes embarrassingly parallel;
  *  - scoring is explode → two broadcast joins → one hash-aggregate on
  *    the doc id: no global state, no windows, no big-side shuffle
  *    beyond the id-keyed aggregate.
  */
object Importance {

  /** md5-prefix bucket of a gram: uniform over [0, buckets). */
  private def bucketOf(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 15), 16, 10).cast(LongType),
      lit(buckets.toLong))

  /** (b, c): occurrences per hash bucket of word n-grams in `docs`.
    * fanOut first: a thin input arrives as one scan task, which would
    * pin the per-gram md5 hashing to a single core (the Dedup rule —
    * a big, properly-split input passes through untouched).
    */
  private def hashedGramCounts(
      docs: DataFrame, textCol: String, n: Int, buckets: Int,
      cName: String): DataFrame =
    Dedup.fanOut(docs)
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .select(bucketOf(col("gram"), buckets).as("b"))
      .groupBy("b").agg(count(lit(1)).as(cName))

  /** Per-document importance weights of `raw` against `target`.
    * Laplace-smoothed (add-one per bucket) so empty buckets score
    * finitely. Documents shorter than n tokens emit no grams and are
    * absent (they carry no n-gram evidence to weigh).
    * Output: (idCol, n_grams, score_ppm, avg_ratio) where score_ppm =
    * Σ_grams floor(1e6 · ((ct+1)(Nr+B)) / ((cr+1)(Nt+B))) and avg_ratio
    * = score_ppm / (n_grams · 1e6).
    */
  def weights(
      raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, n: Int = 2,
      buckets: Int = 64): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    require(buckets >= 1, "buckets must be >= 1")
    // output names AND the internal working names (b/gram/ppm — an id
    // column named like one of them would fail later with an opaque
    // ambiguous/duplicate-column analysis error instead of this message)
    Seq("n_grams", "score_ppm", "avg_ratio", "b", "gram", "ppm").foreach(c =>
      require(idCol != c, s"Importance.weights reserves column name '$c'"))
    val ht = hashedGramCounts(target, textCol, n, buckets, "ct")
    val hr = hashedGramCounts(raw, textCol, n, buckets, "cr")
    // The quantized ratio depends ONLY on the bucket, so evaluate it
    // once per bucket on the ≤`buckets`-row histogram — the corpus-side
    // stream then pays a single broadcast join against a (b, ppm) table
    // instead of two histogram joins, two scalar cross-joins, and
    // per-gram float arithmetic. The totals Nt/Nr are window sums over
    // the histograms THEMSELVES, not separate ht.agg/hr.agg consumers:
    // a second consumer of each histogram re-runs its whole corpus
    // explode subtree unless exchange reuse happens to fire (it did
    // not — the round-21 x41 plan showed FIVE gram explodes for the
    // two corpora; two were exactly these totals), and the
    // single-consumer window form removes that failure class outright —
    // the Novelty first-seen lesson applied to the histograms. Each
    // unpartitioned window is a single task over exactly `buckets` rows
    // BY CONSTRUCTION (bounded like the broadcasts, not corpus-sized).
    // Both histograms hang as broadcast left joins off a COMPLETE
    // `buckets`-row spine (every bucket id is pmod-bounded into
    // [0, buckets)), so the post-join window sums see every bucket of
    // both corpora and Nt/Nr are exact even when the two histograms
    // share no bucket at all — the round-21 form summed Nt on ht before
    // the join and rebroadcast it to unmatched raw rows via max(),
    // which read 0 under zero overlap (ADVICE r21 #1). Spine-only and
    // target-only rows are dropped AFTER the totals (their buckets
    // contain no raw gram, so the scoring join could never match them).
    val bl = lit(buckets.toLong)
    val totW = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val ratio =
      ((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") *
        (col("nr") + bl).cast("double")) /
      ((col("cr") + lit(1L)).cast("double") *
        (col("nt") + bl).cast("double"))
    val spine = raw.sparkSession.range(0, buckets.toLong)
      .select(col("id").as("b"))
    val bucketPpm = spine
      .join(broadcast(ht), Seq("b"), "left")
      .join(broadcast(hr), Seq("b"), "left")
      .withColumn("nt", sum(coalesce(col("ct"), lit(0L))).over(totW))
      .withColumn("nr", sum(coalesce(col("cr"), lit(0L))).over(totW))
      .filter(col("cr").isNotNull)
      .select(col("b"), floor(ratio * lit(1e6)).as("ppm"))
    val grams = Dedup.fanOut(raw)
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .select(col(idCol), bucketOf(col("gram"), buckets).as("b"))
    grams.join(broadcast(bucketPpm), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("ppm")).as("score_ppm"))
      .select(col(idCol), col("n_grams"), col("score_ppm"),
        (col("score_ppm").cast("double") / (col("n_grams") * lit(1e6)))
          .as("avg_ratio"))
  }
}
