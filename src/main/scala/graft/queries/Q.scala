package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One graded query: a Spark plan plus (when SQL-expressible) the ANSI SQL
  * the driver runs in DuckDB over the same parquet files. Queries without
  * an oracle get the driver's weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {

  /** Deterministic-compare conventions shared by every query:
    *
    * - Money doubles in the testdata are 2-decimal values; casting to
    *   DECIMAL(18,2) recovers the exact value in BOTH engines (the double
    *   sits ~1e-13 from the grid point, nowhere near a .005 boundary), and
    *   decimal aggregation is exact, so sums are order-independent and
    *   engine-independent. The final cast back to DOUBLE normalizes the
    *   output schema. Plain `round(sum(double),2)` would be bit-stable only
    *   until a group's true sum lands on a rounding boundary.
    * - Averages divide an exact decimal sum (as double) by a count — two
    *   identical doubles divide identically everywhere.
    * - Whole-number doubles (l_quantity) sum exactly in double (< 2^53);
    *   cast to BIGINT on both sides.
    * - Every query ends in a total ORDER BY (unique-key tiebreak) so the
    *   row stream is unique, whatever the driver's hash does about order.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact money sum -> DOUBLE. */
  def msum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Deterministic average of a 2-decimal money column -> DOUBLE. */
  def mavg(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c)

  /** Exact integral sum of a whole-number double column -> BIGINT. */
  def isum(c: Column): Column = sum(c).cast(LongType)

  /** price * (1 - discount), all in exact decimal. The (1-d) factor is
    * re-cast to (18,2) so the product stays within DECIMAL(38,4) in both
    * engines (Spark and DuckDB widen products differently once precision
    * saturates, which would break exactness).
    */
  def revenue(price: Column, disc: Column): Column =
    dec2(price) * (lit(1) - dec2(disc)).cast(DecimalType(18, 2))

  /** price * (1-d) * (1+t): the middle term is re-normalized to (18,4)
    * (values fit exactly) before the second multiply, again to keep both
    * engines inside precision 38 with identical scales.
    */
  def charge(price: Column, disc: Column, tax: Column): Column =
    revenue(price, disc).cast(DecimalType(18, 4)) *
      (lit(1) + dec2(tax)).cast(DecimalType(18, 2))

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(spark, dir, name)
}
