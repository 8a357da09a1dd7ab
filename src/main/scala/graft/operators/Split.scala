package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic corpus partitioning by content-stable hash: the
  * train/val/test split and the per-stratum downsample, the two
  * assignment steps every training-data pipeline runs last (and must be
  * able to re-run byte-identically months later, on a corpus that has
  * since grown — which is why neither step may depend on row order,
  * sampling RNG state, or corpus size).
  *
  * Both operators map a document's id through the md5-prefix fold
  * (the cross-engine hash family of ShuffleOrder/s46/x07: first 8 hex
  * chars of md5 as an integer in [0, 2^32)) and compare against
  * PRECOMPUTED INTEGER thresholds: per-mille weights become exact
  * cutoffs (w << 32)/1000 in Long arithmetic, so there is no floating
  * division anywhere and the oracle replays the assignment bit-for-bit.
  * A document's bucket is a pure function of its id and the weight
  * vector — append-only corpus growth never reassigns an existing
  * document, the property that keeps eval sets stable across corpus
  * versions (the reason real pipelines hash-split rather than
  * randomSplit, whose assignment shifts with partition boundaries).
  *
  * 100 TB shape: one map-side projection — no shuffle, no state, no
  * driver participation; the comparison constant-folds into whole-stage
  * codegen. Production would swap xxhash64 for the md5 prefix (same
  * plan, cheaper hash, no SQL twin) exactly as ShuffleOrder documents.
  */
object Split {

  /** Uniform hash of a key onto the [0, 2^32) integer grid. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType)

  /** Exact integer threshold for a cumulative per-mille weight:
    * ceil-free Long arithmetic on the 2^32 grid, no doubles.
    */
  private def cutoff(cumPerMille: Long): Long = (cumPerMille << 32) / 1000L

  /** Adds `split` — the label of the hash band the key falls in.
    * `splits` are (label, perMilleWeight), summing to 1000; bands are
    * contiguous [cutoff(prev), cutoff(cum)) ranges in declaration
    * order, so the label is a pure function of (id, weights).
    */
  def assign(
      docs: DataFrame, idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2.toLong).sum == 1000L,
      "split weights are per-mille and must sum to 1000")
    require(splits.forall(_._2 > 0), "every split weight must be > 0")
    require(!docs.columns.contains("split"),
      "Split.assign reserves column name 'split'; rename the input")
    val h = hashBucket(col(idCol))
    // fold from the last band backward: h < cutoff(cum_k) -> label_k
    val cums = splits.scanLeft(0L)(_ + _._2).tail
    val assigned = splits.zip(cums).init.foldRight(
      lit(splits.last._1): Column) { case (((label, _), cum), rest) =>
      when(h < cutoff(cum), label).otherwise(rest)
    }
    docs.withColumn("split", assigned)
  }

  /** Deterministic stratified downsample: keep a row iff its id hashes
    * under its stratum's per-mille threshold. `fractions` maps stratum
    * value -> per-mille keep rate; absent strata keep `defaultPerMille`.
    * Upsampling a minority stratum is the SAME map (per-mille > 1000
    * keeps everything); rebalancing toward target proportions is a
    * weight-vector choice, not a new operator.
    */
  def stratifiedSample(
      docs: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Int], defaultPerMille: Int): DataFrame = {
    require((fractions.values.toSeq :+ defaultPerMille).forall(_ >= 0),
      "per-mille keep rates must be >= 0")
    val threshold = fractions.foldLeft(
      lit(cutoff(defaultPerMille.toLong.min(1000L))): Column) {
      case (rest, (stratum, pm)) =>
        when(col(stratumCol) === stratum,
          cutoff(pm.toLong.min(1000L))).otherwise(rest)
    }
    docs.filter(hashBucket(col(idCol)) < threshold)
  }
}
