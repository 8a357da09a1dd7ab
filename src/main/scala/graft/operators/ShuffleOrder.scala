package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic corpus shuffle + round-robin worker sharding: the
  * last step before a training run, which wants every worker to read a
  * pseudorandom, disjoint, balanced slice of the corpus in a
  * reproducible order.
  *
  * Order = a hash of the document id (seedless, reproducible), made a
  * total order with the id as tiebreak; position = the global ordinal
  * in that order via Ranking.globalOrdinal — the range-sharded rank,
  * NOT an unpartitioned row_number window, so the sort parallelizes
  * across the cluster instead of funneling 100 TB through one task.
  * Round-robin assignment (worker = ord mod W, pos = ord div W) makes
  * worker loads differ by at most one document, whatever the hash
  * distribution does.
  *
  * The hash is the md5-prefix fold (cross-engine, same technique as
  * s46/x07) so the oracle reproduces the order bit-for-bit; production
  * would swap in xxhash64 — same plan, cheaper hash, no SQL twin.
  */
object ShuffleOrder {

  /** (input columns…, worker, pos): worker in [0, workers), pos = the
    * document's read position within its worker's slice.
    */
  def assign(
      docs: DataFrame, idCol: String, workers: Int,
      shards: Int): DataFrame = {
    require(workers >= 1, "workers must be >= 1")
    Seq("__skey", "__ord", "worker", "pos").foreach(n =>
      require(!docs.columns.contains(n),
        s"ShuffleOrder.assign reserves column name '$n'; rename the input"))
    val keyed = docs.withColumn("__skey",
      conv(substring(md5(col(idCol).cast(StringType)), 1, 15), 16, 10)
        .cast(LongType))
    Ranking.globalOrdinal(
      keyed, Seq(col("__skey"), col(idCol)), "__ord", shards)
      .withColumn("worker", pmod(col("__ord"), lit(workers.toLong)))
      // integer div, not /+floor: ordinals exceed 2^53 exactness at
      // full corpus scale (same rule as Pack's cumulative mass)
      .withColumn("pos", expr(s"`__ord` div $workers"))
      .drop("__skey", "__ord")
  }
}
