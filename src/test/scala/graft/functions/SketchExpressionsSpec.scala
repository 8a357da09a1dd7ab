package graft.functions

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The native one-pass sketch expressions must be bit-identical to their
  * higher-order-function executable specs in Dedup.
  */
class SketchExpressionsSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .filter(col("doc_id") < 100)

  test("SimHash64 expression equals the HOF spec on real documents") {
    val diff = docs.select(
      Dedup.simhash(col("text")).as("spec"),
      SketchFunctions.simhash64(col("text")).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(diff == 0)
  }

  test("MinHashSignature expression equals the HOF spec on real documents") {
    val diff = docs.select(
      Dedup.minhashSignatureHof(col("text"), 3, 32).as("spec"),
      SketchFunctions.minhashSignature(col("text"), 3, 32).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(diff == 0)
  }

  test("parity holds on degenerate whitespace (empty tokens skipped)") {
    import spark.implicits._
    val df = Seq("a  b", " a b ", "a b  c", "   ").toDF("text")
    val diff = df.select(
      Dedup.simhash(col("text")).as("spec"),
      SketchFunctions.simhash64(col("text")).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(diff == 0)
    val mh = df.select(
      Dedup.minhashSignatureHof(col("text"), 2, 8).as("spec"),
      SketchFunctions.minhashSignature(col("text"), 2, 8).as("native"))
      .filter(!(col("spec") <=> col("native"))).count()
    assert(mh == 0)
  }

  test("null and short-text behavior") {
    import spark.implicits._
    val df = Seq(Some("a b"), None, Some("a b c d")).toDF("text")
    val r = df.select(
      SketchFunctions.minhashSignature(col("text"), 3, 8).as("sig"),
      SketchFunctions.simhash64(col("text")).as("sh")).collect()
    assert(r(0).isNullAt(0)) // 2 tokens < k=3
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
    assert(!r(2).isNullAt(0) && r(2).getSeq[Long](0).length == 8)
  }

  test("simhash of single-token text is that token's hash bits sign") {
    import spark.implicits._
    val r = Seq("hello").toDF("text")
      .select(SketchFunctions.simhash64(col("text")),
        xxhash64(col("text"))).collect()(0)
    // with one token, votes are the token's bits: simhash == token hash
    assert(r.getLong(0) == r.getLong(1))
  }
}
