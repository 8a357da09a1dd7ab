package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Domain mixing: temperature-scaled sampling weights per corpus domain
  * (source), the step that decides how much of each domain a training
  * run draws — w_s ∝ tokens_s^α normalized over domains, with the
  * common α = 1/2 ("unigram^(1/2)"-style smoothing: upweights small
  * domains relative to their raw share).
  *
  * α is fixed at 1/2 because sqrt is the one power IEEE 754 requires
  * correctly rounded — JVM and DuckDB produce the identical double, so
  * the weights are oracle-checkable bit-for-bit. (General pow() is
  * libm-dependent and would need a measured-margin argument instead.)
  *
  * Scale shape: one hash-aggregate over the corpus (map-side partials;
  * the shuffle carries one row per domain — tens of rows), then all
  * arithmetic on the tiny per-domain frame; the normalizing total is a
  * broadcast 1-row scalar. Nothing here grows with corpus size except
  * the first aggregate.
  */
object Mix {

  /** Per-domain mixing weights and deterministic sampling rates:
    * (domain, n_docs, tokens, weight, rate) where
    * weight = sqrt(tokens)/Σ_s sqrt(tokens_s) and
    * rate = min(1, targetTokens·weight/tokens) — the per-domain keep
    * probability that makes the sampled mixture hit `targetTokens`
    * total tokens in expectation at the computed weights.
    *
    * The sqrt values are snapped to DECIMAL(18,6) before the
    * normalizing sum so the total is exact and order-independent in
    * any engine (the repo-wide exact-decimal-sum convention); the
    * final divisions are double-by-double on identical inputs.
    */
  def weights(
      docs: DataFrame, domainCol: String, tokensPerDoc: Column,
      targetTokens: Long): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    val per = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokensPerDoc).cast(LongType).as("tokens"))
      .withColumn("__w",
        round(sqrt(col("tokens").cast(DoubleType)), 6)
          .cast(DecimalType(18, 6)))
    val tot = per.agg(sum(col("__w")).as("__tot"))
    per.crossJoin(broadcast(tot))
      .withColumn("weight",
        round(col("__w").cast(DoubleType) / col("__tot").cast(DoubleType),
          6))
      .withColumn("rate",
        round(least(lit(1.0),
          lit(targetTokens.toDouble) * col("weight")
            / col("tokens").cast(DoubleType)), 6))
      .drop("__w", "__tot")
  }
}
