package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval (range) join: pair left rows with right rows of the same key
  * whose timestamps lie within ±window of the left timestamp.
  *
  * Spark's planner turns `a JOIN b ON |a.ts - b.ts| <= w` into a
  * broadcast-nested-loop or cartesian — O(n·m) per key. This operator
  * buckets time into window-sized cells: a left row in cell c can only
  * match right rows in cells {c-1, c, c+1}, so each left row explodes to
  * 3 (cell, key) probes and the match becomes a plain equi-join + final
  * range filter — O(n + matches) with one shuffle, the standard
  * interval-join shape (cf. stream-stream interval joins in Flink/Spark
  * Structured Streaming).
  */
object IntervalJoin {

  /** @param left  rows with (key, leftTs); all columns kept
    * @param right rows with (key, rightTs); `payload` columns attached
    * @param windowUs half-width of the match window in microseconds
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      windowUs: Long): DataFrame = {
    val lUs = unix_micros(col(leftTs))
    val rUs = unix_micros(col(rightTs))
    // left explodes to its cell ± 1 so any right row within ±window
    // shares a probe cell
    val l = left.withColumn("__lus", lUs)
      .withColumn("__cell",
        explode(array((-1 to 1).map(o =>
          expr(s"(__lus div ${windowUs}L) + $o")): _*)))
    val r = right.select(
      (col(key).as("__rkey") +: rUs.as("__rus") +:
        expr(s"(unix_micros(${rightTs}) div ${windowUs}L)").as("__rcell") +:
        payload.map(c => col(c).as(s"match_$c"))): _*)
    l.join(r, col(key) === col("__rkey") && col("__cell") === col("__rcell")
        && abs(col("__lus") - col("__rus")) <= windowUs)
      .drop("__cell", "__rkey", "__rcell")
      .withColumnRenamed("__lus", s"${leftTs}_us")
      .withColumnRenamed("__rus", s"match_ts_us")
  }

  /** The capped interval join: each left row keeps only its `k` NEAREST
    * in-window matches (by |Δt|, ties broken by match timestamp then the
    * match payload columns in order).
    *
    * DETERMINISM CONTRACT: the tie-break order is total — and therefore
    * the kept match SET is run-to-run stable — only when `payload`
    * carries a column unique per right row (its event/row id). This
    * cannot be `require`d mechanically (uniqueness is a data property,
    * not a schema one), so it is a caller obligation: omit the unique id
    * and two right rows with identical (|Δt|, ts, payload...) rank
    * arbitrarily, which a hash-compared pipeline would intermittently
    * fail on. IntervalJoinSpec pins run-to-run stability of the kept set
    * with the id present.
    *
    * This is the production answer to hot-key output blowup: SCALE.md's
    * skew measurement shows a bot user holding 10% of events turning the
    * unbounded join's output quadratic in its density (12.3k -> 18.5M
    * pairs on the ×100 slice) — semantically correct, but downstream
    * rarely wants half a million co-occurrences for one bot when the
    * question is "what click preceded this purchase". The cap bounds
    * output at k·|left| BY CONSTRUCTION. The ranking window partitions
    * on the UNIQUE left-row id (`leftIdCol`), so its groups are
    * match-list-sized — per-left-row, not per-user — and a hot user
    * cannot serialize it.
    *
    * @param leftIdCol a column unique per left row (e.g. its event id)
    */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      windowUs: Long, leftIdCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val joined = join(left, right, key, leftTs, rightTs, payload, windowUs)
    val ord: Seq[Column] =
      abs(col(s"${leftTs}_us") - col("match_ts_us")) +:
        col("match_ts_us") +: payload.map(c => col(s"match_$c"))
    val w = Window.partitionBy(leftIdCol).orderBy(ord.map(_.asc): _*)
    joined.withColumn("match_rank", row_number().over(w))
      .filter(col("match_rank") <= k)
  }
}
