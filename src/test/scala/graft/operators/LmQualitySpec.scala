package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** LmQuality.bigramLogLikelihood against hand-computed add-one-smoothed
  * bigram log-likelihoods on a corpus small enough to do by hand.
  */
class LmQualitySpec extends SparkTestBase {

  import scala.math.log

  private def run(docs: (Long, String)*): Map[Long, (Long, Double)] = {
    import spark.implicits._
    LmQuality.bigramLogLikelihood(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  /** The operator's integer micro-nat pipeline, replayed in Scala. */
  private def microAvg(terms: Seq[Double]): Double =
    terms.map(t => math.round(t * 1e6)).sum.toDouble / terms.size / 1e6

  test("hand-computed corpus: counts, smoothing, vocabulary") {
    // corpus: "a b a b" + "a b c"
    //   unigrams: a->3, b->3, c->1            V = 3
    //   bigrams:  "a b"->3, "b a"->1, "b c"->1
    val out = run(1L -> "a b a b", 2L -> "a b c")
    // doc 1 transitions: ab, ba, ab ->
    //   ln(4/6), ln(2/6), ln(4/6)
    val d1 = microAvg(Seq(log(4.0 / 6), log(2.0 / 6), log(4.0 / 6)))
    // doc 2 transitions: ab, bc -> ln(4/6), ln(2/6)
    val d2 = microAvg(Seq(log(4.0 / 6), log(2.0 / 6)))
    assert(out(1L)._1 == 3L)
    assert(out(2L)._1 == 2L)
    assert(out(1L)._2 == d1)
    assert(out(2L)._2 == d2)
    // doc 1 repeats the corpus's dominant transition more -> scores higher
    assert(out(1L)._2 > out(2L)._2)
  }

  test("an unseen-heavy document scores below a formulaic one") {
    // "x y" appears once (its own doc); "a b" is corpus-dominant
    val out = run(1L -> "a b a b a b", 2L -> "a b", 3L -> "x y")
    assert(out(3L)._2 < out(2L)._2)
  }

  test("single-token and empty-transition documents score 0 with 0 transitions") {
    val out = run(1L -> "hello", 2L -> "a b")
    assert(out(1L) == (0L, 0.0))
    assert(out(2L)._1 == 1L)
  }

  test("transition-count law: per-doc n_trans sums to the corpus's " +
    "total bigram mass (sum of len-1 over docs)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val got = LmQuality.bigramLogLikelihood(docs, "doc_id", "text")
      .agg(sum("n_trans")).collect()(0).getLong(0)
    val expect = docs
      .select((size(split(col("text"), " ")) - 1).cast("long").as("t"))
      .agg(sum(when(col("t") > 0, col("t")).otherwise(0L)))
      .collect()(0).getLong(0)
    assert(got == expect)
  }

  test("graded slice sanity: all docs scored, scores negative, exact dups tie") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = LmQuality.bigramLogLikelihood(docs, "doc_id", "text").cache()
    try {
      assert(out.count() == docs.count())
      // every doc here has >= 2 tokens, so all carry transitions and a
      // genuine (negative) log-likelihood
      assert(out.filter(col("n_trans") === 0 || col("avg_ll") >= 0.0)
        .count() == 0)
      // byte-identical documents must score byte-identically: group by
      // text, assert one distinct score per group
      val dupScores = docs.join(out, "doc_id")
        .groupBy("text").agg(countDistinct("avg_ll").as("k"))
        .filter(col("k") > 1).count()
      assert(dupScores == 0)
    } finally out.unpersist()
  }
}
