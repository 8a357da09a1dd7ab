package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class QualitySelectSpec extends SparkTestBase {
  import spark.implicits._

  private def scored(rows: (Long, String, Double)*) =
    rows.toDF("id", "grp", "score")

  private def keeps(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.filter(col("keep")).select("id").collect().map(_.getLong(0)).toSet

  test("topFraction keeps the best tertile per group, ties at the cut " +
    "included") {
    // group a: 6 rows, ceil(6/3) = 2 -> cut = 2nd best = 0.8; the tie
    // at 0.8 rides along (3 kept). group b: 3 rows, cut = best-of-1.
    val out = QualitySelect.topFraction(scored(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.8),
      (4L, "a", 0.7), (5L, "a", 0.6), (6L, "a", 0.5),
      (7L, "b", 0.4), (8L, "b", 0.3), (9L, "b", 0.2)),
      "id", "score", "grp", 3)
    assert(keeps(out) == Set(1L, 2L, 3L, 7L))
  }

  test("groups smaller than the denominator keep their single best row") {
    val out = QualitySelect.topFraction(
      scored((1L, "solo", 0.1), (2L, "duo", 0.5), (3L, "duo", 0.6)),
      "id", "score", "grp", 3)
    assert(keeps(out) == Set(1L, 3L))
  }

  test("reserved working names fail loudly instead of colliding") {
    val e = intercept[IllegalArgumentException] {
      QualitySelect.topFraction(
        scored((1L, "a", 0.1)).withColumnRenamed("id", "cut"),
        "cut", "score", "grp", 3)
    }
    assert(e.getMessage.contains("reserves"))
  }

  test("thresholdApprox lands within a row of the exact selection on " +
    "the graded slice (the scale path tracks the oracle path)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val sc = docs.select(col("doc_id"), col("lang"),
      round(TextAnalysis.qualityScore(
        col("text"), TextAnalysis.langMarkers("en")), 4).as("score"))
    val exact = QualitySelect
      .topFraction(sc, "doc_id", "score", "lang", 3)
      .filter(col("keep")).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = QualitySelect
      .thresholdApprox(sc, "doc_id", "score", "lang", 3)
      .filter(col("keep")).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    // at accuracy 10000 on ~hundred-doc groups the sketch cut should
    // reproduce the exact cut (ties aside) — allow a tiny band
    for ((lang, n) <- exact)
      assert(math.abs(approx(lang) - n) <= math.max(2L, n / 10),
        s"$lang: exact kept $n, approx kept ${approx(lang)}")
  }
}
