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
}
