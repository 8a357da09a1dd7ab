package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** SemanticDedup.clusters on hand-built vectors with known geometry:
  * two centroids split the space, similar-direction vectors group,
  * transitive chains close, and cross-cell near-parallel vectors do
  * NOT pair (the SemDeDup contract: blocking is by cell).
  */
class SemanticDedupSpec extends SparkTestBase {

  private val centroids = Seq(
    0 -> Array(1.0, 0.0, 0.0, 0.0),
    1 -> Array(0.0, 1.0, 0.0, 0.0))

  private def corpus(rows: (Long, Array[Float])*) = {
    val schema = StructType(Seq(
      StructField("vid", LongType),
      StructField("emb", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v.toSeq) }),
      schema)
  }

  private def run(rows: (Long, Array[Float])*): Map[Long, (Long, Boolean)] =
    SemanticDedup.clusters(corpus(rows: _*), "vid", "emb", centroids, 0.9)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap

  test("parallel vectors in one cell cluster; orthogonal ones do not") {
    val out = run(
      1L -> Array(1f, 0.1f, 0f, 0f),    // cell 0
      2L -> Array(1f, 0.11f, 0f, 0f),   // cell 0, ~parallel to 1
      3L -> Array(1f, 0f, 0.9f, 0f),    // cell 0, far from 1/2
      4L -> Array(0f, 1f, 0f, 0f))      // cell 1, isolated
    assert(out(1L) == (1L, true))
    assert(out(2L) == (1L, false)) // dup of 1, dropped
    assert(out(3L) == (3L, true))
    assert(out(4L) == (4L, true))
  }

  test("transitive chains close: a~b, b~c => one cluster, min id kept") {
    // unit-ish vectors stepping 10 degrees apart in the (x, z) plane:
    // adjacent pairs are cos(10deg) ~ 0.985 >= 0.9, the ends are
    // cos(20deg) ~ 0.94 — all in cell 0, one cluster via transitivity
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, 0f, math.sin(r).toFloat, 0f)
    }
    val out = run(5L -> at(0), 6L -> at(10), 7L -> at(20))
    assert(out == Map(
      5L -> (5L, true), 6L -> (5L, false), 7L -> (5L, false)))
  }

  test("near-parallel vectors in DIFFERENT cells never pair") {
    // 44deg and 46deg off x toward y: cosine 0.9994 but they straddle
    // the cell boundary — blocking-by-cell means no comparison happens
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
    }
    val out = run(8L -> at(44), 9L -> at(46))
    assert(out == Map(8L -> (8L, true), 9L -> (9L, true)))
  }

  test("malformed vectors fail loudly instead of becoming kept singletons") {
    val e = intercept[IllegalArgumentException] {
      run(10L -> Array(1f, 0f, 0f, 0f), 11L -> Array(1f, 0f))
    }
    assert(e.getMessage.contains("failed centroid assignment"))
  }

  test("duplication law: an exact copy of every vector clusters with " +
    "its original and never becomes a keeper") {
    // threshold 0.95 exceeds the corpus's max genuine within-cell
    // cosine (~0.51 probed across SFs), so the ONLY pairs are
    // (original, copy): cos(v, v) = 1, same cell by determinism of
    // assignment. Every original keeps; every copy labels to its
    // original.
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val n = 100000L
    val doubled = emb.union(
      emb.select((col("vid") + n).as("vid"), col("emb")))
    val cents = emb.orderBy("vid").limit(8).collect().zipWithIndex
      .map { case (r, i) =>
        (i, r.getSeq[Float](1).map(_.toDouble).toArray) }.toSeq
    val out = SemanticDedup.clusters(doubled, "vid", "emb", cents, 0.95)
      .cache()
    try {
      assert(out.filter(col("id") < n && !col("keep")).count() == 0,
        "an original lost keeper status to its own copy")
      assert(out.filter(col("id") >= n &&
        (col("keep") || col("cluster") =!= col("id") - n)).count() == 0,
        "a copy kept, or labelled to something other than its original")
    } finally out.unpersist()
  }

  test("graded slice sanity: clusters form and keeps are the min ids") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val cents = emb.filter(pmod(col("vec_id"), lit(97)) === 0)
      .orderBy("vec_id").limit(16).collect().zipWithIndex
      .map { case (r, i) =>
        (i, r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      }.toSeq
    val out = SemanticDedup
      .clusters(emb, "vec_id", "embedding", cents, 0.4)
      .cache()
    try {
      assert(out.count() == emb.count()) // every vector labelled
      // a representative is always its own cluster, and every cluster's
      // representative is kept exactly once
      assert(out.filter(col("keep") && col("id") =!= col("cluster"))
        .count() == 0)
      val clusters = out.select("cluster").distinct().count()
      assert(out.filter(col("keep")).count() == clusters)
      // the threshold-0.4 pair set is non-trivial at sf0.001 (probed:
      // 24 pairs) so at least one non-singleton cluster must exist
      assert(out.filter(!col("keep")).count() > 0)
    } finally out.unpersist()
  }
}
