package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * the same key whose timestamp is <= the left timestamp (equal included),
  * optionally within a tolerance.
  *
  * Spark has no native as-of join; the preference ladder (compose > custom
  * Expression > custom Strategy) lands on COMPOSE here, because the
  * union-merge formulation is already the optimal distributed shape:
  * tag both sides, union, and run one window over (key) ordered by
  * (ts, side) carrying the last right payload forward. Exactly ONE
  * shuffle on the key — the same cost a hand-written SparkPlan would pay —
  * and both inputs stream through without materializing a per-key buffer
  * beyond the window frame. A sort-merge custom operator would save only
  * the union column padding, not a shuffle.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `payload` columns are attached)
    * @param key       equi-key column name present on both sides
    * @param leftTs    event-time column on left
    * @param rightTs   event-time column on right
    * @param payload   right-side columns to carry (emitted as
    *                  `asof_<name>`, null when no match)
    * @param toleranceUs match only if leftTs - rightTs <= tolerance (µs);
    *                  <=0 means unbounded lookback
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceUs: Long = 0L): DataFrame = {
    val lCols = left.columns
    // one unioned relation: side 0 = right (sorts before left on ties so
    // an equal-timestamp right row is visible to the left row)
    val commonTs = "__asof_us"
    val r = right.select(
      (col(key).as(key) +:
        unix_micros(col(rightTs)).as(commonTs) +:
        lit(0).as("__side") +:
        payload.map(c => col(c).as(s"__p_$c"))) ++
        lCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
    val l = left.select(
      (col(key) +:
        unix_micros(col(leftTs)).as(commonTs) +:
        lit(1).as("__side") +:
        payload.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__p_$c")) ) ++
        lCols.filterNot(_ == key).map(col): _*)
    val unioned = r.unionByName(l)

    // Carry (ts, payload...) as ONE struct: the struct is non-null for
    // every right row even when a payload FIELD is null, so the matched
    // timestamp and its payload always come from the same right row (a
    // per-column last(ignoreNulls) would resurrect an older non-null
    // payload past a newer null one).
    // internal field names are prefixed so a payload column named "ts"
    // (or anything else) cannot collide inside the struct
    val rightStruct = when(col("__side") === 0,
      struct(col(commonTs).as("__asof_ts") +:
        payload.map(c => col(s"__p_$c").as(s"__pf_$c")): _*))
    // (ts, side) alone is not a total order when several right rows share
    // a (key, ts): last() would then pick a partition-order-dependent row.
    // Adding the payload struct as the final sort key makes ties resolve
    // to the LARGEST payload tuple, deterministically on every engine and
    // partition count. Left rows carry a null struct (sorts first within
    // their tie group — harmless, they only consume).
    val w = Window.partitionBy(key).orderBy(col(commonTs), col("__side"),
        rightStruct)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(rightStruct, ignoreNulls = true).over(w))
      .withColumn("asof_ts_us", col("__match.__asof_ts"))
    val withPayload = payload.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__match.__pf_$c"))
    }.drop("__match")

    val matched = withPayload.filter(col("__side") === 1)
    val bounded =
      if (toleranceUs <= 0) matched
      else matched.withColumn("__stale",
        col(commonTs) - col("asof_ts_us") > toleranceUs)
        .select((matched.columns.map {
          case c if c.startsWith("asof_") =>
            when(col("__stale"), lit(null)).otherwise(col(c)).as(c)
          case c => col(c)
        }): _*)
    bounded
      .withColumnRenamed(commonTs, s"${leftTs}_us")
      .drop((payload.map(c => s"__p_$c") :+ "__side"): _*)
  }
}
