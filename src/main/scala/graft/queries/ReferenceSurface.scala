package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Q._

/** Tier-1: the slice the reference actually executes (SURVEY.md §2 rows
  * 2-9), re-expressed over the driver's star schema. Each query cites the
  * reference behavior it generalizes. Deviations from reference bugs are
  * deliberate and tested (SURVEY.md §7.5): WHERE applies before aggregates,
  * aggregate names are case-insensitive, negative literals work.
  */
object ReferenceSurface {

  /** Projection by name (sqlengine.py:322-380). Catalyst prunes the scan to
    * exactly these columns (ReadSchema in explain).
    */
  private val r01 = Q(
    "r01_scan_project",
    (s, d) => t(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .filter(col("l_partkey") < 50)
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem WHERE l_partkey < 50
            ORDER BY l_orderkey, l_linenumber"""))

  /** Star expansion (sqlengine.py:260-265): SELECT * keeps metadata column
    * order.
    */
  private val r02 = Q(
    "r02_star",
    (s, d) => t(s, d, "nation").select("*").orderBy("n_nationkey"),
    Some("SELECT * FROM nation ORDER BY n_nationkey"))

  /** Nested AND/OR WHERE with AND binding tighter (sqlengine.py:201-220,
    * parser.py:82-83; verified semantics in SURVEY §2.5).
    */
  private val r03 = Q(
    "r03_filter_and_or",
    (s, d) => t(s, d, "lineitem")
      .filter((col("l_quantity") > 45 && col("l_discount") > 0.05)
        || col("l_extendedprice") > 95000)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_quantity > 45 AND l_discount > 0.05
               OR l_extendedprice > 95000
            ORDER BY l_orderkey, l_linenumber"""))

  /** All seven comparators of checkCondition (sqlengine.py:138-158),
    * including col-vs-col (evalTriplet col OP col branch, :181-189) and a
    * negative literal — which crashes the reference (SURVEY §2.11) and is a
    * deliberate fix here.
    */
  private val r04 = Q(
    "r04_filter_comparators",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_returnflag") === "A" && col("l_linestatus") =!= "X"
        && col("l_quantity") >= 10 && col("l_quantity") <= 40
        && col("l_partkey") > -1 && col("l_suppkey") < 5
        && col("l_discount") < col("l_tax"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
            FROM lineitem
            WHERE l_returnflag = 'A' AND l_linestatus <> 'X'
              AND l_quantity >= 10 AND l_quantity <= 40
              AND l_partkey > -1 AND l_suppkey < 5
              AND l_discount < l_tax
            ORDER BY l_orderkey, l_linenumber"""))

  /** DISTINCT over the projected tuple (sqlengine.py:375-377) — hash-based
    * here instead of the reference's O(n²) list scan.
    */
  private val r05 = Q(
    "r05_distinct",
    (s, d) => t(s, d, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY l_returnflag, l_linestatus"""))

  /** The reference's four aggregates max/min/sum/avg (sqlengine.py:274-294)
    * in one pass, WHERE respected (deviation §7.5.1). Quantity is a
    * whole-number double -> exact BIGINT sum; avg via exact decimal sum.
    */
  private val r06 = Q(
    "r06_agg_global",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast(TimestampNTZType))
      .agg(
        max(col("l_quantity")).as("max_qty"),
        min(col("l_quantity")).as("min_qty"),
        isum(col("l_quantity")).as("sum_qty"),
        (sum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("n_rows")),
    Some("""SELECT max(l_quantity) AS max_qty, min(l_quantity) AS min_qty,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   sum(l_quantity) / count(l_quantity) AS avg_qty,
                   count(*) AS n_rows
            FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'"""))

  /** Multiple aggregates over different columns in one query
    * (`select max(A), min(C)` — SURVEY §2.9), on money columns.
    */
  private val r07 = Q(
    "r07_multi_agg",
    (s, d) => t(s, d, "orders").agg(
      max(col("o_totalprice")).as("max_price"),
      min(col("o_totalprice")).as("min_price"),
      msum(col("o_totalprice")).as("sum_price"),
      mavg(col("o_totalprice")).as("avg_price"),
      countDistinct(col("o_custkey")).as("n_customers")),
    Some("""SELECT max(o_totalprice) AS max_price,
                   min(o_totalprice) AS min_price,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_price,
                   count(DISTINCT o_custkey) AS n_customers
            FROM orders"""))

  /** The reference's ONLY join: comma-FROM cross product + WHERE equality
    * (sqlengine.py:120-135 + :161-195). Declared exactly that way —
    * crossJoin then filter — and Catalyst rewrites it into a real equi-join
    * (broadcast hash join here; see ReorderJoin/CheckCartesianProducts).
    */
  private val r08 = Q(
    "r08_cross_join_filter",
    (s, d) => {
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      n.crossJoin(r)
        .filter(col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    },
    Some("""SELECT n_nationkey, n_name, r_name
            FROM nation, region WHERE n_regionkey = r_regionkey
            ORDER BY n_nationkey"""))

  /** N-way comma join (left-fold of cartesian products, sqlengine.py:
    * 130-135) — three tables, equality predicates in WHERE.
    */
  private val r09 = Q(
    "r09_nway_join",
    (s, d) => {
      val sup = t(s, d, "supplier")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      sup.crossJoin(n).crossJoin(r)
        .filter(col("s_nationkey") === col("n_nationkey")
          && col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", "r_name")
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name, n_name, r_name
            FROM supplier, nation, region
            WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
            ORDER BY s_suppkey"""))

  val all: Seq[Q] = Seq(r01, r02, r03, r04, r05, r06, r07, r08, r09)
}
