package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus novelty in presentation order: for each document, how much of
  * it the corpus has not seen before — the fraction of its distinct
  * word n-grams whose FIRST occurrence (minimum doc id) is this
  * document. Curation teams read the resulting curve (novelty vs
  * position) to decide when a source is mined out: a crawl whose late
  * documents are 95% previously-seen grams has stopped adding
  * information, however many rows it still ships.
  *
  * Relation to neighbors: x47 (crossDocDupFraction) scores how much of
  * a doc is duplicated ANYWHERE else — symmetric, order-free; this one
  * is ordered and attributes every shared gram to exactly one document
  * (the first), so novelty fractions are a corpus-wide budget: each
  * distinct gram counts as novel exactly once.
  *
  * Scale shape (Decontaminate's one-exchange lesson applied): the raw
  * (id, gram-digest) stream is hash-partitioned ONCE on the digest;
  * that single clustering serves the per-(id, digest) distinct (a
  * partitioning on a subset of the grouping keys co-locates every
  * group) AND the first-occurrence attribution, which is a
  * digest-partitioned window (min(id) over partitionBy(digest)) rather
  * than an aggregate + self-join: the window reads the exchange ONCE,
  * so there is no second consumer whose plan must stay canonically
  * equal for exchange reuse (the first cut used aggregate+join and an
  * inferred IsNotNull silently doubled the corpus explode — see
  * SCALE.md round 15; this formulation removes that failure class
  * instead of guarding it), and at real scale it does one sort of the
  * digest mass where the join form degrades to hash-agg PLUS
  * sort-merge-join once the firsts table outgrows a broadcast.
  * Measured: ~equal at sf0.1, 1.6x faster at the x10 slice, ~10%
  * slower at x100-local where the firsts table still fits a hash
  * join. Catalyst inserts no further exchange until the final per-doc
  * aggregate on the id. No raw gram string is ever shuffled — 16-byte
  * md5 digests only (the Dedup.exact rule).
  */
object Novelty {

  /** (idCol, n_grams, n_novel, novelty_frac) for every input document:
    * distinct word n-grams, how many of them first appear here (min id
    * order), and their ratio (0.0 for docs too short to have a gram).
    */
  def firstSeenFraction(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"gram width must be >= 1, got $n")
    Seq("__g", "__g2", "__gram", "__toks", "__first",
        "n_grams", "n_novel", "novelty_frac").foreach(c =>
      require(!docs.columns.contains(c),
        s"firstSeenFraction reserves column name '$c'; rename the input column"))
    // gram construction over a PRE-SPLIT token column: a lambda body
    // re-evaluates outer expressions per element, so slicing
    // split(text) inside the transform would re-tokenize the document
    // once per gram — O(len²), the longdocs quadratic class (see
    // ChunkDedup.chunks)
    def grams(toks: Column) = transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => array_join(slice(toks, (i + lit(1)).cast("int"), lit(n)), " "))
    // Null ids can never be attributed a first occurrence; dropping
    // them here keeps them out of the gram mass (the final left join
    // restores every doc row regardless). Historical note: when this
    // operator used aggregate+join for first-seen, this explicit
    // filter was also load-bearing for exchange reuse (see scaladoc);
    // the window formulation no longer depends on that.
    val flat = docs
      .filter(size(split(col(textCol), " ")) >= n && col(idCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), explode(grams(col("__toks"))).as("__gram"))
      .select(col(idCol), xxhash64(col("__gram")).as("__g"),
        xxhash64(lit(1), col("__gram")).as("__g2"))
      .repartition(col("__g"), col("__g2"))
    val dflat = flat.distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__g", "__g2")
    val per = dflat
      .withColumn("__first", min(col(idCol)).over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(col("n_novel").cast("double") / col("n_grams"), lit(0.0))
          .as("novelty_frac"))
  }
}
