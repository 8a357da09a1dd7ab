package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the hand tools for when AQE's runtime
  * skew-join splitting isn't available (aggregations, or joins whose
  * skew AQE can't see at plan time).
  *
  * Measured against AQE on the zipfian slice (SCALE.md round-11): for
  * a plain equi-join AQE's targeted split WINS (1.25s vs saltedJoin's
  * 2.02s vs 3.69s unmitigated) — prefer it where it applies. These
  * stay because (a) aggregation skew has no AQE rule (saltedCountSum
  * is the only groupBy mitigation), and (b) AQE's byte-based trigger
  * (256MB/5x defaults) needs runtime stats, thresholds matched to the
  * data scale, and AQE on — saltedJoin guarantees the spread
  * structurally, whatever the deployment.
  *
  * - saltedAggregate: two-phase aggregation. Phase 1 groups on
  *   (key, salt) so one hot key's rows spread over `salts` reducers;
  *   phase 2 merges the partials per key. Works for any algebraic
  *   aggregate expressed as (partial, merge) pairs.
  * - saltedJoin: explode the small side `salts` times with every salt
  *   value; salt the big side randomly-but-deterministically (hash of a
  *   unique column) — each hot key's rows land on `salts` tasks instead
  *   of one.
  *
  * Salting is deterministic (hash-based, not rand()) so results stay
  * reproducible run to run — required by the oracle hash-compare and by
  * any retry-based fault tolerance (a recomputed task must produce the
  * same rows).
  */
object Skew {

  /** Deterministic salt in [0, salts) from a unique discriminator col. */
  def saltOf(unique: Column, salts: Int): Column =
    pmod(xxhash64(unique), lit(salts))

  /** Two-phase count+sum per key with salting.
    * Returns (key, n, total) — semantically identical to
    * df.groupBy(key).agg(count, sum) but hot keys fan out over `salts`
    * partial groups first.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      unique: String, salts: Int): DataFrame =
    df.withColumn("__salt", saltOf(col(unique), salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))

  /** Skew-safe inner equi-join: `big` join `small` on key. The small side
    * is replicated `salts` times (explode), the big side salted
    * deterministically from `bigUnique`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigUnique: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltOf(col(bigUnique), salts))
    val repSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(repSmall,
      saltedBig(key) === repSmall(key) &&
        saltedBig("__salt") === repSmall("__salt"))
      .drop(repSmall(key)).drop(saltedBig("__salt")).drop(repSmall("__salt"))
  }
}
