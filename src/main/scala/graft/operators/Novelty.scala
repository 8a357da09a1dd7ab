package graft.operators

import org.apache.spark.sql.DataFrame
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
  * group), the min-id-per-digest aggregate, AND the join of the two —
  * Catalyst inserts no further exchange until the final per-doc
  * aggregate on the id. The first-occurrence branch reads the digest
  * exchange twice (aggregate + join probe); exchange reuse computes it
  * once (pinned in PlanSpec, the globalOrdinal/x25 contract). No raw
  * gram string is ever shuffled — 16-byte md5 digests only (the
  * Dedup.exact rule).
  */
object Novelty {

  /** (idCol, n_grams, n_novel, novelty_frac) for every input document:
    * distinct word n-grams, how many of them first appear here (min id
    * order), and their ratio (0.0 for docs too short to have a gram).
    */
  def firstSeenFraction(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"gram width must be >= 1, got $n")
    Seq("__g", "__first", "n_grams", "n_novel", "novelty_frac").foreach(c =>
      require(!docs.columns.contains(c),
        s"firstSeenFraction reserves column name '$c'; rename the input column"))
    val toks = split(col(textCol), " ")
    val grams = transform(
      sequence(lit(0), size(toks) - lit(n)),
      i => array_join(slice(toks, (i + lit(1)).cast("int"), lit(n)), " "))
    // The explicit isNotNull mirrors the constraint the final left
    // join INFERS onto the aggregate branch (IsNotNull on its join
    // key): without it the two readers of this exchange differ by that
    // one inferred filter, canonical equality fails, and the corpus
    // explode+shuffle silently runs twice (observed in the sf0.001
    // plan before this line existed — two REPARTITION_BY_COL
    // exchanges, two Generates). With it, both branches are
    // byte-identical and exchange reuse computes the gram mass once
    // (pinned in PlanSpec).
    val flat = docs
      .filter(size(toks) >= n && col(idCol).isNotNull)
      .select(col(idCol), explode(grams).as("__gram"))
      .select(col(idCol), unhex(md5(col("__gram"))).as("__g"))
      .repartition(col("__g"))
    val dflat = flat.distinct()
    val firsts = dflat.groupBy("__g").agg(min(col(idCol)).as("__first"))
    val per = dflat.join(firsts, "__g")
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
