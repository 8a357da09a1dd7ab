package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filtered join: the standard large-cluster pattern for joining a
  * huge fact table against a dimension that is too big to broadcast as a
  * hash table but whose KEY SET fits in a few megabytes of Bloom filter.
  *
  * Shape (reference has no join at all beyond cross+filter —
  * /root/reference/sqlengine.py:120-135 — this is pure extension surface):
  *
  *   1. aggregate the dim keys into a `BloomFilter` (one pass over dim,
  *      partial sketches merged on the driver via `df.stat.bloomFilter`);
  *   2. broadcast the filter and drop every fact row whose key cannot be
  *      in dim BEFORE the fact side is shuffled — this is where the win
  *      is: at 1% dim selectivity the shuffle moves ~1% (+fpp) of the
  *      fact bytes instead of all of them;
  *   3. finish with the exact equi-join, which silently removes the
  *      false positives the filter let through.
  *
  * Step 3 makes the result EXACTLY equal to the plain inner join whatever
  * the fpp, which is why the x28 query can be oracle-checked against
  * ordinary SQL. Spark's own AQE injects the same trick as a runtime
  * filter for suitable plans; this operator makes it explicit, tunable
  * (expectedItems/fpp), and usable when the planner would not.
  */
object BloomJoin {

  /** Inner-join `fact` to `dim` on a long key, Bloom-pre-filtering the
    * fact side. Result == `fact.join(dim, factKey === dimKey)`.
    *
    * The probe is Catalyst's own BloomFilterMightContain — the expression
    * Spark's AQE runtime filters compile to — over the serialized filter
    * as a binary literal, so the probe side stays inside whole-stage
    * codegen (a Scala UDF here would fence the one stage whose throughput
    * the operator exists to protect). stat.bloomFilter inserts raw longs
    * via putLong and BloomFilterMightContain evals mightContainLong on
    * the same org.apache.spark.util.sketch format, so the pairing is
    * exact. The literal rides in the plan: fine for the operator's
    * contract (a key SET of a few MB); a dim too big for that is broadcast
    * -hash-join territory anyway.
    */
  def join(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf: BloomFilter = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = graftshim.ColumnShim.toColumn(
      expressions.BloomFilterMightContain(
        expressions.Literal(bos.toByteArray, BinaryType),
        graftshim.ColumnShim.toExpression(col(factKey).cast(LongType))))
    fact
      .filter(col(factKey).isNotNull && mightContain)
      .join(dim, col(factKey) === col(dimKey))
  }
}
