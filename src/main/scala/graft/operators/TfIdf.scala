package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TF-IDF keyword extraction: the per-document top-k salient terms,
  * the standard summarization/routing signal (and the classic sparse
  * retrieval score) over a training corpus.
  *
  * score(d, t) = tf(d,t) · ln(N / df(t)) — raw term frequency times
  * the unsmoothed inverse document frequency. Deterministic compare
  * conventions: the score is rounded to 4 decimals BEFORE the rank
  * window orders on it (rounded-desc, then term asc — a total order,
  * since a term appears once per document), so a libm 1-ulp difference
  * between engines cannot flip a rank unless two terms' true scores
  * collide to the same 4-decimal grid point — in which case the term
  * tiebreak decides identically everywhere.
  *
  * 100 TB shape: tf is one hash-aggregate on (doc, term) with map-side
  * partials over the exploded tokens; df is a second hash-aggregate
  * over the (already distinct) tf pairs on term alone; N is a one-row
  * aggregate broadcast by crossJoin (the Mix/Importance totals
  * pattern). The tf⋈df join keys on term — vocabulary-sized right
  * side, so AQE broadcasts it while the vocab fits and sort-merges
  * when it does not; either way the fact side shuffles at most once.
  * The top-k window partitions by document — millions of independent
  * partitions, no global sort, no skew beyond document length.
  */
object TfIdf {

  /** Top-k terms per document: (idCol, term, tf, df, score, rn),
    * rn in [1, k] by (score desc, term asc) within the document.
    */
  def topTerms(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    Seq("term", "tf", "df", "n_docs", "score", "rn").foreach(c =>
      require(idCol != c,
        s"TfIdf.topTerms reserves output column name '$c'; rename the input"))
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // one row per (doc, term) already, so df is a plain count
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast(DoubleType) /
          col("df").cast(DoubleType)), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rn"))
  }
}
