package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class FilterRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val stop = TextAnalysis.langMarkers("en")

  private def flags(text: String,
      b: FilterRules.Bounds = FilterRules.defaults) = {
    val r = FilterRules(Seq((1L, text)).toDF("id", "text"),
      "id", "text", stop, b).collect().head
    (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
      r.getBoolean(6))
  }

  test("each rule fails independently and keep is their conjunction") {
    val b = FilterRules.Bounds(3, 5, 2.0, 5.0, 0.5, 0.2)
    // passes all: 4 tokens, avg len (3+3+5+3)/4=3.5, ttr 1, stop 1/4
    assert(flags("the fox zebra cat", b) == (true, true, true, true, true))
    // too short
    assert(flags("the fox", b)._1 == false)
    // too long
    assert(flags("the a b c d e", b)._1 == false)
    // avg token length out of bounds (all 1-char tokens)
    assert(flags("a b c d", b)._2 == false)
    // repetition: ttr 2/5 < 0.5
    assert(flags("the the the the fox", b)._3 == false)
    // no stopwords at all
    assert(flags("fox cat dog bird", b)._4 == false)
  }

  test("keep is false whenever any flag is false on the graded corpus, " +
    "and every rule both passes and fails somewhere") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = FilterRules(docs, "doc_id", "text", stop)
    val bad = out.filter(col("keep") =!=
      (col("r_len") && col("r_wordlen") && col("r_ttr") && col("r_stop")))
    assert(bad.count() == 0)
    for (c <- Seq("r_len", "r_wordlen", "r_ttr", "r_stop")) {
      val n = out.filter(col(c)).count()
      assert(n > 0 && n < out.count(), s"$c never varies on the corpus")
    }
  }
}
