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

  test("joinNearest keeps exactly the k nearest in-window matches per " +
    "left row — a subset of the unbounded join, ranked by |dt| with " +
    "deterministic ties") {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val w = 600000000L
    val k = 2
    val full = IntervalJoin.join(p, c, "user_id", "ts", "ts",
        Seq("event_id", "value"), w)
      .select(col("event_id"), col("ts_us"), col("match_event_id"),
        col("match_ts_us")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val capped = IntervalJoin.joinNearest(p, c, "user_id", "ts", "ts",
        Seq("event_id", "value"), w, "event_id", k)
      .select(col("event_id"), col("match_event_id"), col("match_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(capped.nonEmpty)
    // per left row: at most k matches, ranks are 1..n, and they are the
    // k smallest |dt| of the unbounded join's matches for that row
    capped.groupBy(_._1).foreach { case (pid, ms) =>
      assert(ms.length <= k)
      assert(ms.map(_._3).sorted.toSeq == (1 to ms.length))
      val all = full(pid)
      val expected = all.map { case (lus, cid, cts) =>
        (math.abs(lus - cts), cts, cid) }.sorted.take(k).map(_._3).toSet
      assert(ms.map(_._2).toSet == expected,
        s"purchase $pid kept ${ms.map(_._2).toSet}, expected $expected")
    }
    // total output is bounded by construction
    assert(capped.length <= full.size * k)
  }

  test("joinNearest is run-to-run deterministic when the payload carries " +
    "the unique right-row id (the documented tie-break contract)") {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    def run(clicks: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      IntervalJoin.joinNearest(p, clicks, "user_id", "ts", "ts",
          Seq("event_id", "value"), 600000000L, "event_id", 2)
        .select(col("event_id"), col("match_event_id"), col("match_rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = run(c)
    // second run over a REPARTITIONED right side: row arrival order into
    // the rank window changes, the kept (match, rank) set must not
    val b = run(c.repartition(7, col("event_id")))
    assert(a.nonEmpty)
    assert(a == b, s"rank instability: ${a.diff(b)} vs ${b.diff(a)}")
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
