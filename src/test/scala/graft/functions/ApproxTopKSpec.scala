package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ApproxTopKSpec extends SparkTestBase {
  import spark.implicits._

  private def topOf(df: org.apache.spark.sql.DataFrame, k: Int,
      cap: Int): Seq[(String, Long, Long)] =
    df.agg(ApproxTopK.approxTopK(col("v"), k, cap).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.item", "e.count", "e.error")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("exact regime: capacity >= distinct gives true counts, zero error") {
    val data = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
    val got = topOf(data.toDF("v").repartition(7), 3, 16)
    assert(got == Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 20L, 0L)))
  }

  test("lossy regime: heavy hitter survives eviction with bounded error") {
    // one heavy item among many singletons, sketch capacity 8
    val data = Seq.fill(500)("HEAVY") ++ (1 to 300).map(i => s"rare_$i")
    val got = topOf(scala.util.Random.shuffle(data).toDF("v"), 1, 8)
    val (item, count, err) = got.head
    assert(item == "HEAVY")
    assert(count >= 500, s"count $count must overestimate")
    assert(count - err <= 500, "count - error is a lower bound")
  }

  test("partitioning does not change the exact-regime result") {
    val data = (Seq.fill(9)("x") ++ Seq.fill(5)("y") ++ Seq.fill(2)("z"))
    val a = topOf(data.toDF("v").repartition(1), 3, 8)
    val b = topOf(data.toDF("v").repartition(5), 3, 8)
    assert(a == b)
  }

  test("ties order by item for a total order") {
    val data = Seq("b", "a", "b", "a", "c")
    val got = topOf(data.toDF("v"), 3, 8)
    assert(got == Seq(("a", 2L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }
}
