package graft.operators

import graft.SparkTestBase

class ImportanceSpec extends SparkTestBase {

  import spark.implicits._

  // target vocabulary: fruit; off-target: metals. Disjoint token sets so
  // the on-target doc's gram buckets carry target mass and the
  // off-target doc's (md5 is fixed: this is deterministic, not flaky)
  // at most hash-collision mass.
  private val target = Seq(
    (100L, "apple banana cherry date apple banana"),
    (101L, "banana cherry apple date cherry apple"))
    .toDF("doc_id", "text")

  private val raw = target.union(Seq(
    (1L, "apple banana cherry date"),
    (2L, "iron copper zinc lead"),
    (3L, "tin")) // 1 token -> no bigrams -> absent
    .toDF("doc_id", "text"))

  private def weights() =
    Importance.weights(raw, target, "doc_id", "text", n = 2, buckets = 64)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("docs shorter than n tokens are absent; n_grams = tokens - 1") {
    val w = weights()
    assert(w.keySet == Set(100L, 101L, 1L, 2L))
    assert(w(1L)._1 == 3L && w(2L)._1 == 3L && w(100L)._1 == 5L)
  }

  test("on-target documents outscore off-target ones") {
    val w = weights()
    assert(w(1L)._3 > w(2L)._3,
      s"target-vocab doc should outweigh disjoint-vocab doc: $w")
    assert(w(100L)._3 > w(2L)._3)
  }

  test("avg_ratio is exactly the quantized sum over grams") {
    weights().values.foreach { case (n, ppm, avg) =>
      assert(ppm > 0L)
      assert(avg == ppm.toDouble / (n * 1e6))
    }
  }

  test("an empty target still scores finitely (add-one smoothing)") {
    val w = Importance.weights(
      raw, target.filter("doc_id < 0"), "doc_id", "text", 2, 64)
      .collect()
    assert(w.length == 4 && w.forall(_.getLong(2) > 0L))
  }

  test("reserved output names and invalid params are refused") {
    intercept[IllegalArgumentException] {
      Importance.weights(
        raw.withColumnRenamed("doc_id", "score_ppm"), target,
        "score_ppm", "text")
    }
    intercept[IllegalArgumentException] {
      Importance.weights(raw, target, "doc_id", "text", n = 0)
    }
    // internal working names are reserved too — without the guard an id
    // column named 'b' dies later with an ambiguous-column analysis error
    intercept[IllegalArgumentException] {
      Importance.weights(
        raw.withColumnRenamed("doc_id", "b"), target, "b", "text")
    }
  }
}
