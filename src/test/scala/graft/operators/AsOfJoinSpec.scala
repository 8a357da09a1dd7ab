package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, 10L, ts("2024-01-01 10:00:05"), "t1"),
    (2L, 10L, ts("2024-01-01 10:00:00"), "t2"), // exactly at quote q1
    (3L, 10L, ts("2024-01-01 09:59:59"), "t3"), // before any quote
    (4L, 20L, ts("2024-01-01 10:00:10"), "t4")
  ).toDF("trade_id", "acct", "ts", "tag")

  private lazy val quotes = Seq(
    (10L, ts("2024-01-01 10:00:00"), 100.0), // q1
    (10L, ts("2024-01-01 10:00:04"), 101.0), // q2
    (20L, ts("2024-01-01 10:00:01"), 200.0)
  ).toDF("acct", "ts", "px")

  private def result = AsOfJoin.join(trades, quotes, "acct", "ts", "ts",
    Seq("px")).select("trade_id", "asof_px", "asof_ts_us")
    .collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

  test("picks the latest quote at or before each trade") {
    assert(result(1L) == Some(101.0)) // 10:00:04 quote
    assert(result(2L) == Some(100.0)) // equal timestamps match
    assert(result(3L) == None)        // nothing before -> null
    assert(result(4L) == Some(200.0))
  }

  test("tolerance nulls out stale matches") {
    val r = AsOfJoin.join(trades, quotes, "acct", "ts", "ts", Seq("px"),
      toleranceUs = 1000000L) // 1s lookback
      .select("trade_id", "asof_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(r(1L) == Some(101.0)) // 1s gap: still in tolerance
    assert(r(2L) == Some(100.0)) // 0s gap
    assert(r(4L) == None)        // 9s gap: stale
  }

  test("a newer right row with NULL payload shadows an older non-null one") {
    // quotes: (10:00:00, 100.0), (10:00:04, null). Trade at 10:00:05 must
    // match the 10:00:04 quote and get px = NULL — not resurrect 100.0.
    val quotesWithNull = Seq(
      (10L, ts("2024-01-01 10:00:00"), Some(100.0)),
      (10L, ts("2024-01-01 10:00:04"), None)
    ).toDF("acct", "ts", "px")
    val r = AsOfJoin.join(
      trades.filter($"trade_id" === 1L), quotesWithNull,
      "acct", "ts", "ts", Seq("px"))
      .select("asof_px", "asof_ts_us").collect()(0)
    assert(r.isNullAt(0), "older non-null payload leaked past newer null")
    assert(r.getLong(1) ==
      ts("2024-01-01 10:00:04").getTime * 1000L)
  }

  test("payload column named 'ts' does not collide with internals") {
    // both sides call their time column ts AND the payload is also a ts
    val q2 = quotes.withColumn("ts2", col("ts"))
    val r = AsOfJoin.join(trades, q2, "acct", "ts", "ts", Seq("ts2", "px"))
      .select("trade_id", "asof_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(r(1L) == Some(101.0) && r(3L) == None)
  }

  test("equal-timestamp right rows resolve to the largest payload " +
    "(deterministic tiebreak)") {
    // two quotes at the SAME (acct, ts): without a total window order the
    // match would be partition-order dependent. The contract: max payload
    // tuple wins, on every partitioning.
    val dupQuotes = Seq(
      (10L, ts("2024-01-01 10:00:04"), 101.0),
      (10L, ts("2024-01-01 10:00:04"), 99.0),
      (10L, ts("2024-01-01 10:00:04"), 103.0)
    ).toDF("acct", "ts", "px")
    (1 to 4).foreach { parts =>
      val r = AsOfJoin.join(
        trades.filter($"trade_id" === 1L).repartition(parts),
        dupQuotes.repartition(parts), "acct", "ts", "ts", Seq("px"))
        .select("asof_px").collect()(0).getDouble(0)
      assert(r == 103.0, s"tiebreak not deterministic at $parts partitions")
    }
  }

  test("plans with exactly one exchange (union-merge, not join)") {
    val df = AsOfJoin.join(trades, quotes, "acct", "ts", "ts", Seq("px"))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected single shuffle:\n$plan")
  }
}
