package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Laws of the end-to-end text retrieval composition (Retrieval):
  * with every cell probed it must equal brute force over the same
  * featurized frame (the ivfPqTopK equivalence-law pattern), at the
  * graded dials its recall must hold the measured floor, and the
  * bootstrap guards must fail loudly instead of degenerating.
  */
class RetrievalSpec extends SparkTestBase {

  private lazy val docs = graft.Tables.load(spark, sfDir, "documents")

  test("with nprobe = nlist, moreLikeThis equals brute-force top-k over " +
    "the same featurized frame row-for-row (blocking changes WHICH rows " +
    "are compared, never the scoring)") {
    // rebuild the operator's own featurization to get the exact frame +
    // centroid count it used — same dials as x86
    val emb = TfIdf.hashedVec(docs, "doc_id", "text", 64, fastHash = false)
      .localCheckpoint(false)
    val nlist = emb.filter(pmod(col("doc_id"), lit(97L)) === 0)
      .orderBy("doc_id").limit(16).count().toInt
    val got = Retrieval.moreLikeThis(docs, "doc_id", "text",
        queryIds = Seq(0L, 1L, 2L), dim = 64, centroidStride = 97,
        maxCentroids = 16, nprobe = nlist, k = 5, fastHash = false)
      .select("qid", "rank", "id", "sim")
    val want = Similarity.bruteForceTopK(
        emb.filter(col("doc_id") < 3)
          .select(col("doc_id").as("qid"), col("embedding").as("qvec")),
        emb.select(col("doc_id").as("id"), col("embedding").as("vec")),
        k = 5)
      .select("qid", "rank", "id", "sim")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "all-cells-probed retrieval diverged from brute force")
    assert(got.count() == 15, "equivalence pinned on an empty frame")
  }

  test("graded-dial recall floor: nprobe=2 of the stride sample keeps " +
    ">= 60% of the brute-force top-5 on this corpus (the IVF recall " +
    "dial is approximate BY DESIGN; the floor catches collapse, the " +
    "scale flows measure the curve)") {
    val emb = TfIdf.hashedVec(docs, "doc_id", "text", 64, fastHash = false)
      .localCheckpoint(false)
    val got = Retrieval.moreLikeThis(docs, "doc_id", "text",
        queryIds = Seq(0L, 1L, 2L), dim = 64, centroidStride = 97,
        maxCentroids = 16, nprobe = 2, k = 5, fastHash = false)
      .select("qid", "id")
    val exact = Similarity.bruteForceTopK(
        emb.filter(col("doc_id") < 3)
          .select(col("doc_id").as("qid"), col("embedding").as("qvec")),
        emb.select(col("doc_id").as("id"), col("embedding").as("vec")),
        k = 5)
      .select("qid", "id")
    val hit = got.intersect(exact).count().toDouble
    val recall = hit / exact.count()
    assert(recall >= 0.6, s"retrieval recall collapsed: $recall")
  }

  test("searchTextTopK: a query equal to a document's full text " +
    "produces the IDENTICAL vector — cosine exactly 1.0 with that " +
    "document and it ranks first; unseen-token queries still search") {
    import spark.implicits._
    val queries = docs.filter(col("doc_id") < 3)
      .select((col("doc_id") + 1000000L).as("qid"), col("text").as("qtext"))
    val nlist = TfIdf.hashedVec(docs, "doc_id", "text", 64,
        fastHash = false)
      .filter(pmod(col("doc_id"), lit(97L)) === 0)
      .orderBy("doc_id").limit(16).count().toInt
    // all cells probed: the law must not depend on the recall dial
    val got = Retrieval.searchTextTopK(docs, "doc_id", "text",
        queries, "qid", "qtext", dim = 64, centroidStride = 97,
        maxCentroids = 16, nprobe = nlist, k = 5, fastHash = false)
      .select("qid", "rank", "id", "sim").collect()
    for (q <- Seq(0L, 1L, 2L)) {
      val top = got.filter(r => r.getLong(0) == q + 1000000L)
        .minBy(_.getInt(1))
      assert(top.getLong(2) == q && top.getDouble(3) == 1.0,
        s"query $q: expected its source doc at rank 1 with sim 1.0, " +
          s"got id ${top.getLong(2)} sim ${top.getDouble(3)}")
    }
    // a query of tokens the corpus never saw (every bucket df = 0)
    // still featurizes (idf = ln(N+1)) and returns k results
    val alien = Seq((5000000L, "zzqx9 wwvk7 qqpl3 mmnr5")).toDF(
      "qid", "qtext")
    val alienGot = Retrieval.searchTextTopK(docs, "doc_id", "text",
      alien, "qid", "qtext", dim = 64, centroidStride = 97,
      maxCentroids = 16, nprobe = 2, k = 5, fastHash = false)
    assert(alienGot.count() == 5, "unseen-token query did not search")
  }

  test("bootstrap guards fail loudly: starved centroid pool and empty " +
    "query set refuse instead of degenerating") {
    val e1 = intercept[IllegalArgumentException](
      Retrieval.moreLikeThis(docs.limit(3), "doc_id", "text",
        queryIds = Seq(0L), dim = 64, centroidStride = 97,
        maxCentroids = 16, nprobe = 2, k = 5))
    assert(e1.getMessage.contains("centroid pool starved"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Retrieval.moreLikeThis(docs, "doc_id", "text",
        queryIds = Seq.empty, dim = 64, centroidStride = 97,
        maxCentroids = 16, nprobe = 2, k = 5))
    assert(e2.getMessage.contains("at least one query id"), e2.getMessage)
  }
}
