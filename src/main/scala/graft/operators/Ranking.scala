package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordinal (0-based dense row number by a total
  * order) without the single-task window `row_number().over(
  * Window.orderBy(...))` plans — the classic driver-scale bottleneck: a
  * corpus vocabulary is 10^8-10^9 tokens at 100 TB and an unpartitioned
  * window sorts all of it through ONE task.
  *
  * Scale shape (three cheap passes, no global window):
  *  1. range-repartition the frame by the sort key into `shards` ordered
  *     ranges (Spark samples boundaries; S tasks of ~N/S rows each);
  *  2. rank locally inside each range (a window PARTITIONED by the range
  *     id — parallel across shards);
  *  3. offset each shard's local ranks by the total size of the shards
  *     before it (an exclusive prefix-sum window over the S-row size
  *     frame — unpartitioned, but a single task over S ~ parallelism
  *     rows BY CONSTRUCTION, the same bounded-summary exemption the
  *     repo's other tiny windows use — broadcast back).
  *
  * The result is byte-identical to the global row_number whatever
  * boundaries the range sampler picks, PROVIDED `order` is a total order
  * (no ties): range partitions are disjoint and ordered by partition id,
  * so offset + local rank is the true global rank. With ties the split
  * of tied rows across a boundary — like row_number itself — would be
  * nondeterministic; callers must include a unique tiebreak column.
  *
  * Cost note: steps 2 and 3 reference the ranked frame twice more, so
  * the INITIAL plan triplicates `df`'s lineage — but the three
  * subtrees share one canonical range exchange and AQE's stage reuse
  * (on by default) computes it once and wires ReusedExchange into the
  * other branches; the expensive upstream (for a vocab: the full-corpus
  * token explode + count) runs exactly once. Verified on the x25 final
  * plan (2 scans total, not 4) and pinned in PlanSpec so a refactor
  * that breaks canonical-equality of the branches can't silently
  * reintroduce the recompute.
  */
object Ranking {

  def globalOrdinal(
      df: DataFrame, order: Seq[Column], outCol: String,
      shards: Int): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    // Correctness here leans on all three branches (local rank, sizes,
    // offsets) reading ONE materialization of the range exchange:
    // RangePartitioner SAMPLES its boundaries with an RDD-id-derived
    // seed, so with exchange reuse disabled each branch could draw
    // different boundaries and the offsets join would produce wrong
    // ranks with no error. Reuse is on by default (and covers both the
    // AQE stage cache and the non-AQE ReuseExchange rule); fail loudly
    // rather than silently mis-rank if someone turns it off.
    require(df.sparkSession.conf.get("spark.sql.exchange.reuse", "true")
      .toBoolean,
      "globalOrdinal requires spark.sql.exchange.reuse=true: its three " +
        "branches must share one range exchange (sampled boundaries are " +
        "only consistent across branches when the exchange is reused)")
    // The temp names below silently shadow same-named input columns
    // (withColumn replaces); refuse corrupt-the-caller inputs up front.
    Seq("__pid", "__lrank", "__off", outCol).foreach(n =>
      require(!df.columns.contains(n),
        s"globalOrdinal reserves column name '$n'; rename the input column"))
    val parted = df.repartitionByRange(shards, order: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__lrank",
      row_number().over(Window.partitionBy("__pid").orderBy(order: _*)))
    val sizes = local.groupBy("__pid").agg(count(lit(1)).as("__n"))
    // Exclusive prefix sum over the ≤shards-row sizes frame. The window
    // is unpartitioned, which is exactly the shape this operator exists
    // to avoid — but over S ~ parallelism rows it is one trivial task
    // (the bounded-summary exemption), and it replaces the previous
    // triangular self-join + re-aggregate (two more operators and a
    // broadcast-side exchange on every plan that ranks; round-22 A/B on
    // x25 below).
    val offs = sizes.withColumn("__off",
      coalesce(sum(col("__n")).over(Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), "__pid")
      .withColumn(outCol, col("__off") + col("__lrank") - 1)
      .drop("__pid", "__lrank", "__off")
  }

  /** Distributed EXCLUSIVE prefix sum of `value` by a total `order` —
    * globalOrdinal's three-pass shape generalized from counting rows to
    * summing a value. The motivating use is corpus layout: each
    * document's starting token/byte offset in the packed corpus formed
    * by concatenating documents in `order` (x58) — at 100 TB that is a
    * prefix sum over 10^9+ rows, which the naive
    * `sum().over(Window.orderBy(...))` would funnel through ONE task.
    *
    * Same machinery and same contracts as globalOrdinal: range-shard,
    * local window inside each shard (partitioned — parallel), shard
    * totals offset by a triangular join of the S-row size frame,
    * broadcast back. Requires exchange reuse ON (the three branches
    * must see one set of sampled range boundaries) and a TOTAL order
    * (with ties, the rows frame makes tied rows' offsets depend on
    * their nondeterministic relative order). `value`'s type is
    * preserved by sum's usual widening; callers here use Long counts,
    * which stay Long.
    */
  def globalPrefixSum(
      df: DataFrame, order: Seq[Column], value: Column,
      outCol: String, shards: Int): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    require(df.sparkSession.conf.get("spark.sql.exchange.reuse", "true")
      .toBoolean,
      "globalPrefixSum requires spark.sql.exchange.reuse=true: its three " +
        "branches must share one range exchange (sampled boundaries are " +
        "only consistent across branches when the exchange is reused)")
    Seq("__pid", "__v", "__lsum", "__off", outCol).foreach(n =>
      require(!df.columns.contains(n),
        s"globalPrefixSum reserves column name '$n'; rename the input column"))
    val parted = df.repartitionByRange(shards, order: _*)
      .withColumn("__v", value)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__lsum",
      coalesce(
        sum(col("__v")).over(Window.partitionBy("__pid").orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val sizes = parted.groupBy("__pid").agg(sum(col("__v")).as("__n"))
    // same bounded exclusive-prefix-sum window as globalOrdinal's
    // offsets (see the comment there)
    val offs = sizes.withColumn("__off",
      coalesce(sum(col("__n")).over(Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), "__pid")
      .withColumn(outCol, col("__off") + col("__lsum"))
      .drop("__pid", "__v", "__lsum", "__off")
  }
}
