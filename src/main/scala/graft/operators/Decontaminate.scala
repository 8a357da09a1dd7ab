package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share any
  * word n-gram with an evaluation/benchmark corpus, the standard
  * leakage guard run before LLM pretraining (cf. the n-gram overlap
  * filters described in the GPT-3 and PaLM dataset papers).
  *
  * Scale shape at 100 TB:
  *  - both sides explode to n-grams map-side (a codegen'd
  *    transform+explode over the token array — no UDFs), and
  *    immediately reduce each gram to a 16-byte md5 digest so no raw
  *    n-gram string is ever shuffled (same never-shuffle-raw-text rule
  *    as Dedup.exact);
  *  - the eval side is a benchmark (10^3-10^5 docs — tiny next to the
  *    corpus), so after its distinct it is broadcast by AQE's size
  *    estimate. The join is NOT hint-forced: a pathological
  *    benchmark-larger-than-memory still plans as a shuffled hash join
  *    on the digest instead of OOMing the executors (the x25 lesson);
  *  - per-doc dedup of (id, digest) and the hit count are one
  *    hash-aggregate each with map-side partials.
  */
object Decontaminate {

  /** (id, n_hits): distinct contaminated n-grams per training document,
    * for every training doc sharing at least one word n-gram with
    * `eval`. Documents shorter than n tokens produce no grams (cannot
    * be flagged).
    */
  def overlapHits(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val evalG = eval
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .select(md5(col("gram")).as("g"))
      .distinct()
    val trainG = train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .select(col(idCol), md5(col("gram")).as("g"))
      .distinct()
    trainG.join(evalG, "g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The training corpus with every flagged document removed — the
    * pipeline's actual output. One anti-join on the id.
    */
  def clean(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    train.join(
      overlapHits(train, eval, idCol, textCol, n).select(idCol),
      Seq(idCol), "left_anti")
}
