package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ShuffleOrderSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")

  test("round-robin sharding is balanced (loads differ by at most 1) " +
    "and positions are dense per worker") {
    val a = ShuffleOrder.assign(docs, "doc_id", workers = 4, shards = 4)
    val loads = a.groupBy("worker").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loads.keySet == Set(0L, 1L, 2L, 3L))
    assert(loads.values.max - loads.values.min <= 1)
    // pos is exactly 0..load-1 within each worker
    val bad = a.groupBy("worker")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("nd"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1 ||
        col("nd") =!= col("n"))
    assert(bad.count() == 0)
    // no doc lost or duplicated
    assert(a.count() == docs.count())
    assert(a.select("doc_id").distinct().count() == docs.count())
  }

  test("sharded assignment is byte-identical to the single-task global " +
    "window it replaces, at several shard counts") {
    val key = conv(substring(md5(col("doc_id").cast(StringType)), 1, 15),
      16, 10).cast(LongType)
    val spec = docs
      .withColumn("ord",
        row_number().over(Window.orderBy(key, col("doc_id"))) - 1)
      .select(col("doc_id"), pmod(col("ord").cast(LongType), lit(3L))
        .as("worker"), expr("CAST(ord AS BIGINT) div 3").as("pos"))
    for (sh <- Seq(1, 3, 7)) {
      val got = ShuffleOrder.assign(docs, "doc_id", workers = 3, shards = sh)
      assert(got.except(spec).count() == 0 && spec.except(got).count() == 0,
        s"mismatch vs global window at shards=$sh")
    }
  }

  test("reserved output column names are refused, not silently replaced") {
    intercept[IllegalArgumentException] {
      ShuffleOrder.assign(docs.withColumn("worker", lit(1)), "doc_id", 4, 4)
    }
  }
}
