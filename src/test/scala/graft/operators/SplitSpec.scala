package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SplitSpec extends SparkTestBase {
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  test("assign is a pure function of the id: append-only growth never " +
    "reassigns an existing document") {
    val splits = Seq("train" -> 800, "val" -> 100, "test" -> 100)
    val small = Split.assign(ids(500), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = Split.assign(ids(2000), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, s) <- small) assert(grown(id) == s, s"id $id moved")
  }

  test("band masses track the per-mille weights on a uniform id set") {
    val n = 20000
    val counts = Split.assign(ids(n), "id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 is uniform; 3 sigma on a 2000-expectation binomial is ~130
    assert(math.abs(counts("train") - 16000L) < 400, counts.toString)
    assert(math.abs(counts("val") - 2000L) < 200, counts.toString)
    assert(math.abs(counts("test") - 2000L) < 200, counts.toString)
  }

  test("weights must be positive per-mille summing to 1000, and the " +
    "output name must be free") {
    intercept[IllegalArgumentException] {
      Split.assign(ids(1), "id", Seq("a" -> 999))
    }
    intercept[IllegalArgumentException] {
      Split.assign(ids(1), "id", Seq("a" -> 1000, "b" -> 0))
    }
    intercept[IllegalArgumentException] {
      Split.assign(ids(1).withColumn("split", lit("x")), "id",
        Seq("a" -> 1000))
    }
  }

  test("stratifiedSample keeps a subset per stratum at ~the target " +
    "rate, leaves default strata whole, and is id-stable") {
    val docs = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "en" else "zh")).toDF("id", "lang")
    val kept = Split.stratifiedSample(docs, "id", "lang",
      Map("en" -> 250), 1000)
    val counts = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("zh") == 2000L) // default per-mille 1000 keeps all
    assert(math.abs(counts("en") - 500L) < 150, counts.toString)
    // membership is a pure id function: rerun on a shuffled frame
    val again = Split.stratifiedSample(
      docs.orderBy(rand(7)), "id", "lang", Map("en" -> 250), 1000)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("split assignment and stratified membership agree with the " +
    "oracle's integer-cutoff formulation on the graded table") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Split.assign(docs.select(col("doc_id")), "doc_id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    // replay the cutoffs with independent arithmetic
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long")
    val expect = docs.select(col("doc_id"),
      when(h < (800L << 32) / 1000L, "train")
        .when(h < (900L << 32) / 1000L, "val")
        .otherwise("test").as("e"))
    val joined = out.join(expect, "doc_id")
    assert(joined.filter(col("split") =!= col("e")).count() == 0)
    assert(out.count() == docs.count())
  }
}
