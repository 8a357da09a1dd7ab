package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkTestBase {

  private lazy val ev = graft.Tables.load(spark, sfDir, "events")

  test("bucketed interval join equals the naive inequality join") {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"),
        col("ts").as("cts"))
    val w = 600000000L
    val naive = p.join(c, col("user_id") === col("cu") &&
        abs(unix_micros(col("ts")) - unix_micros(col("cts"))) <= w)
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = IntervalJoin.join(p, c.withColumnRenamed("cu", "user_id")
        .withColumnRenamed("cts", "ts"),
      "user_id", "ts", "ts", Seq("cid"), w)
      .select(col("pid"), col("match_cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "test needs at least one matching pair")
    assert(bucketed == naive)
  }

  test("no nested-loop join in the bucketed plan") {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"), col("ts"))
    val plan = IntervalJoin.join(p, c, "user_id", "ts", "ts", Seq("cid"),
      600000000L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan)
  }
}
