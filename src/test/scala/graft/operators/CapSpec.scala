package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CapSpec extends SparkTestBase {
  import spark.implicits._

  private def scored(rows: (Long, String, Double)*) =
    rows.toDF("id", "grp", "score")

  test("capPerGroup keeps exactly the best `cap` rows per group, ties " +
    "broken by id — a hard budget, no ties-ride-along") {
    val out = QualitySelect.capPerGroup(scored(
      (1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.8),
      (4L, "a", 0.7), (5L, "b", 0.1)),
      "id", "score", "grp", 2)
    val keeps = out.filter(col("keep")).select("id")
      .collect().map(_.getLong(0)).toSet
    // the 0.8 tie resolves to id 2; id 3 is over budget despite the tie
    assert(keeps == Set(1L, 2L, 5L))
    assert(out.count() == 5) // verdict per row, nothing dropped
  }

  test("groups under the cap keep everything; reserved names collide " +
    "loudly") {
    val out = QualitySelect.capPerGroup(
      scored((1L, "solo", 0.1)), "id", "score", "grp", 10)
    assert(out.filter(col("keep")).count() == 1)
    intercept[IllegalArgumentException] {
      QualitySelect.capPerGroup(
        scored((1L, "a", 0.1)).withColumnRenamed("id", "rn"),
        "rn", "score", "grp", 1)
    }
  }

  test("on the graded corpus every source lands at most `cap` kept " +
    "documents and full sources land exactly `cap`") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val sc = docs.select(col("doc_id"), col("source"),
      round(TextAnalysis.qualityScore(
        col("text"), TextAnalysis.langMarkers("en")), 4).as("score"))
    val kept = QualitySelect.capPerGroup(sc, "doc_id", "score", "source", 15)
      .filter(col("keep")).groupBy("source").count().collect()
    assert(kept.forall(_.getLong(1) <= 15))
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.foreach { r =>
      val want = math.min(15L, sizes(r.getString(0)))
      assert(r.getLong(1) == want, s"${r.getString(0)}: ${r.getLong(1)}")
    }
  }
}
