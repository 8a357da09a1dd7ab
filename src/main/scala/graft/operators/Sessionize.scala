package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (gaps-and-islands) in batch: a session is a run of
  * events per user with inter-event gaps below `gapSeconds`.
  *
  * Classic two-window formulation: flag rows whose gap from the previous
  * event exceeds the threshold, running-sum the flags into a session
  * ordinal, then aggregate per (user, session). Exactly one shuffle on
  * user_id (both windows and the final group share the partitioning, so
  * Catalyst reuses the exchange). The streaming twin of this operator
  * lives in graft.streaming (session_window / flatMapGroupsWithState).
  */
object Sessionize {

  def sessions(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 1)
          .when(unix_micros(col("ts")) - unix_micros(col("prev_ts"))
            > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy(col("user_id"), col("session_seq"))
      .agg(
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        // 2-decimal money double -> exact decimal sum -> double (see Q.scala)
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Hot-key-safe sessionization, identical output to `sessions` (the
    * SessionizeSpec equivalence property and the x43 oracle both pin
    * it): `sessions` puts every event of a user through ONE window task,
    * so a bot/system account holding 1-10% of a day's events serializes
    * that fraction of the corpus on one core — AQE's skew handling
    * splits skewed JOIN partitions, not windows, so the mitigation has
    * to be structural. This is the session-salting-by-time-bucket shape:
    *
    *  1. per (user, chunkSeconds-sized time bucket): plain
    *     gaps-and-islands sessionization, windowed on (user_id, chunk) —
    *     the hot user's events spread across its chunks. One exchange of
    *     events on (user_id, chunk); the per-chunk session aggregate
    *     reuses it (grouping keys are a superset of the partitioning).
    *  2. per user: the per-chunk sessions are disjoint time intervals,
    *     and two ADJACENT-in-time sessions merge iff the event gap
    *     between them (next.start - prev.end) is within the threshold —
    *     for sessions split by a chunk boundary that difference IS the
    *     real inter-event gap, and for sessions separated inside one
    *     chunk it exceeds the gap by construction, so one more
    *     gaps-and-islands pass over the SESSION rows (ordered by start)
    *     reproduces exactly the plain session numbering. This window is
    *     user-keyed again, but it carries sessions + touched chunks per
    *     user, not events — the hot user's serial work drops from its
    *     event count to its session count (a continuously-active bot is
    *     few sessions over many chunks).
    *
    * Sparse-bot bound (measured, SCALE.md round-10): a bot whose pings
    * are spaced just OVER the gap yields sessions == events, so phase
    * 2's per-user window carries the bot's full event count again — the
    * pathological input for this decomposition. The degradation is
    * bounded and still beats the plain operator: phase 2 sorts narrow
    * fixed-width interval rows (5 numeric columns) where plain's window
    * sorts full-width event rows, so on the ×100 slice with a 1M-event
    * super-gap bot, chunked stays flat (4.0s uniform → 3.9s bot) while
    * plain degrades 60% (2.7s → 4.3s, medians of 3 warm runs). A
    * session_seq assignment via per-chunk counts + prefix-sum
    * offsets could cap the serial work below O(bot sessions), but no
    * measured input justifies those extra exchanges — the corner's
    * equivalence is pinned in SessionizeSpec.
    *
    * Per-session value sums stay exact DECIMAL through the merge (sum of
    * per-chunk decimal partials equals the plain decimal sum — decimal
    * addition is exact and associative) and cast to double once at the
    * end, so outputs are bit-identical to `sessions`.
    */
  def sessionsChunked(events: DataFrame, gapSeconds: Long,
      chunkSeconds: Long): DataFrame = {
    require(chunkSeconds >= 1, "chunkSeconds must be >= 1")
    val gapUs = gapSeconds * 1000000L
    val chunkUs = chunkSeconds * 1000000L
    val byUserChunk = Window.partitionBy("user_id", "__chunk")
      .orderBy("ts", "event_id")
    // phase 1: plain sessionize within each (user, chunk); an event's
    // chunk is a pure row-local expression, ties (equal ts) cannot
    // straddle chunks, so within-chunk ordering equals `sessions`'
    val local = events
      .withColumn("__us", unix_micros(col("ts")))
      .withColumn("__chunk", expr(s"__us div ${chunkUs}L"))
      .withColumn("__prev", lag(col("__us"), 1).over(byUserChunk))
      .withColumn("__new",
        when(col("__prev").isNull, 1)
          .when(col("__us") - col("__prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("__lseq", sum(col("__new")).over(byUserChunk
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__chunk"), col("__lseq"))
      .agg(min(col("__us")).as("__start"), max(col("__us")).as("__end"),
        count(lit(1)).as("__n"),
        sum(col("value").cast("decimal(18,2)")).as("__sum"))
    // phase 2: merge across chunk boundaries — gaps-and-islands over
    // the per-chunk session intervals (disjoint, so start-ordered)
    val byUser = Window.partitionBy("user_id").orderBy("__start")
    val merged = local
      .withColumn("__pend", lag(col("__end"), 1).over(byUser))
      .withColumn("__newS",
        when(col("__pend").isNull, 1)
          .when(col("__start") - col("__pend") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("__newS")).over(byUser
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    merged.groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("__start")).as("session_start_us"),
        max(col("__end")).as("session_end_us"),
        sum(col("__n")).as("n_events"),
        sum(col("__sum")).cast("double").as("sum_value"))
  }
}
