package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-based document filtering with PER-RULE verdicts — the
  * Gopher-style heuristic gate (word-count bounds, mean-word-length
  * bounds, type-token-ratio floor, stop-word floor) that precedes
  * model-based quality scoring in a training-data pipeline. Unlike a
  * bare `keep` boolean, emitting each rule's flag is what lets a
  * pipeline publish per-filter removal statistics and tune one rule
  * without re-deriving the others (the FineWeb/Gopher reporting shape).
  *
  * Every rule is exact rational arithmetic on token counts (the
  * TextAnalysis building blocks): integer-vs-integer or
  * integer-ratio-vs-literal comparisons whose double forms are exact,
  * so any engine reproduces the verdicts bit-for-bit — no rounding
  * anywhere.
  *
  * 100 TB shape: pure per-row projection, no shuffle, no state — the
  * flags compute inside whole-stage codegen on the scan, and a
  * downstream `filter(col("keep"))` pushes nothing extra: the corpus
  * streams through once.
  */
object FilterRules {

  /** Inclusive rule bounds. Ratio floors compare against exact
    * count-ratio doubles; choose literals with exact binary forms when
    * bit-stability across engines matters (0.5, 0.25, …) or accept
    * that both engines parse the same literal to the same double —
    * either way the comparison is deterministic.
    */
  final case class Bounds(
      minTokens: Int, maxTokens: Int,
      minAvgTokenLen: Double, maxAvgTokenLen: Double,
      minTypeTokenRatio: Double,
      minStopRatio: Double)

  /** Gopher-ish defaults tuned to the synthetic corpus's ranges so
    * every rule both passes and fails somewhere at every SF.
    */
  val defaults: Bounds = Bounds(20, 80, 3.0, 4.5, 0.5, 0.05)

  /** The four rule columns + conjunction over a bare text column —
    * the ONE definition both apply (per-rule reporting) and the
    * streaming composed gate (Classifier.composedGate) build from, so
    * the two cadences can never drift.
    */
  private def rules(text: org.apache.spark.sql.Column,
      stopwords: Seq[String], b: Bounds)
      : (org.apache.spark.sql.Column, Seq[org.apache.spark.sql.Column]) = {
    val n = TextAnalysis.tokenCount(text)
    val rLen = n >= b.minTokens && n <= b.maxTokens
    val avg = TextAnalysis.avgTokenLen(text)
    val rWordLen = avg >= b.minAvgTokenLen && avg <= b.maxAvgTokenLen
    val rTtr = TextAnalysis.distinctTokenCount(text).cast("double") / n >=
      b.minTypeTokenRatio
    val rStop = TextAnalysis.wordRatio(text, stopwords) >= b.minStopRatio
    (n, Seq(rLen, rWordLen, rTtr, rStop))
  }

  /** The composite keep verdict as a bare column (null text -> null,
    * same as apply's keep).
    */
  def keepColumn(text: org.apache.spark.sql.Column,
      stopwords: Seq[String], b: Bounds = defaults)
      : org.apache.spark.sql.Column =
    rules(text, stopwords, b)._2.reduce(_ && _)

  /** (idCol, n_tokens, r_len, r_wordlen, r_ttr, r_stop, keep). */
  def apply(
      docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], b: Bounds = defaults): DataFrame = {
    Seq("n_tokens", "r_len", "r_wordlen", "r_ttr", "r_stop", "keep")
      .foreach(c => require(idCol != c,
        s"FilterRules reserves output column name '$c'; rename the input"))
    val (n, Seq(rLen, rWordLen, rTtr, rStop)) =
      rules(col(textCol), stopwords, b)
    docs.select(
      col(idCol), n.as("n_tokens"),
      rLen.as("r_len"), rWordLen.as("r_wordlen"),
      rTtr.as("r_ttr"), rStop.as("r_stop"),
      (rLen && rWordLen && rTtr && rStop).as("keep"))
  }
}
