package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Q._

/** Tier-2: everything the reference's grammar accepts but its executor
  * ignores or crashes on (SURVEY.md §2.12) — executed correctly here, as
  * the survey's build plan §7.3 mandates. All plain Catalyst surface:
  * group-by/having, order/limit, every join shape, set ops, subqueries,
  * window functions, rollup/cube/grouping sets, string/date functions.
  */
object Relational {

  private def ntz(s: String) = lit(s).cast(TimestampNTZType)

  /** Pricing summary (TPC-H Q1 shape): grouped multi-aggregate with exact
    * decimal money math (see Q.scala for the determinism conventions).
    */
  private val s01 = Q(
    "s01_group_agg",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") <= ntz("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        isum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax")))
          .cast(DoubleType).as("sum_charge"),
        (sum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        mavg(col("l_extendedprice")).as("avg_price"),
        mavg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS DECIMAL(18,4)) * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
                   sum(l_quantity) / count(l_quantity) AS avg_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
                   CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** GROUP BY + HAVING (grammar-only in the reference, parser.py:108-109). */
  private val s02 = Q(
    "s02_having",
    (s, d) => t(s, d, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), msum(col("o_totalprice")).as("spend"))
      .filter(col("n_orders") >= 3 && col("spend") > 400000)
      .orderBy("o_custkey"),
    Some("""SELECT o_custkey, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
            FROM orders GROUP BY o_custkey
            HAVING count(*) >= 3
               AND CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 400000
            ORDER BY o_custkey"""))

  /** ORDER BY ... LIMIT — Spark plans TakeOrderedAndProject: a per-partition
    * top-k + a k-row merge on the driver, no global sort. That is exactly
    * the 100 TB-safe plan for top-k.
    */
  private val s03 = Q(
    "s03_orderby_limit",
    (s, d) => t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(15),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15"""))

  /** Inner equi-join, dimension side broadcast (customer is always the
    * small side at any SF — classic star-schema broadcast join).
    */
  private val s04 = Q(
    "s04_join_inner",
    (s, d) => t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .select("o_orderkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, c_name, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            ORDER BY o_orderkey"""))

  /** LEFT OUTER join + aggregate: customers keep a row even with zero
    * orders (count of the null-extended side is 0, sum is NULL).
    */
  private val s05 = Q(
    "s05_join_left",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("n_orders"),
        msum(col("o_totalprice")).as("spend"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey, c_name ORDER BY c_custkey"""))

  /** FULL OUTER join of two aggregates (null-safe output columns). */
  private val s06 = Q(
    "s06_join_full",
    (s, d) => {
      val o = t(s, d, "orders")
      val f = o.filter(col("o_orderstatus") === "F").groupBy("o_custkey")
        .agg(count(lit(1)).as("f_cnt")).withColumnRenamed("o_custkey", "fk")
      val p = o.filter(col("o_orderstatus") === "O").groupBy("o_custkey")
        .agg(count(lit(1)).as("o_cnt")).withColumnRenamed("o_custkey", "ok")
      f.join(p, col("fk") === col("ok"), "full")
        .select(coalesce(col("fk"), col("ok")).as("custkey"),
          col("f_cnt"), col("o_cnt"))
        .orderBy("custkey")
    },
    Some("""WITH f AS (SELECT o_custkey AS fk, count(*) AS f_cnt FROM orders
                       WHERE o_orderstatus = 'F' GROUP BY o_custkey),
                 p AS (SELECT o_custkey AS ok, count(*) AS o_cnt FROM orders
                       WHERE o_orderstatus = 'O' GROUP BY o_custkey)
            SELECT coalesce(fk, ok) AS custkey, f_cnt, o_cnt
            FROM f FULL JOIN p ON fk = ok ORDER BY custkey"""))

  /** LEFT SEMI join = EXISTS (SURVEY §2 "categories with no reference
    * implementation": semi/anti).
    */
  private val s07 = Q(
    "s07_semi_join",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 150000)
            ORDER BY c_custkey"""))

  /** LEFT ANTI join = NOT EXISTS. */
  private val s08 = Q(
    "s08_anti_join",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
            ORDER BY c_custkey"""))

  /** UNION ALL (bag). Duplicate rows are identical tuples, so the total
    * sort is still deterministic.
    */
  private val s09 = Q(
    "s09_union_all",
    (s, d) => {
      val a = t(s, d, "orders").filter(col("o_totalprice") > 180000)
        .select(col("o_custkey").as("id"), lit("bigorder").as("src"))
      val b = t(s, d, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("id"), lit("richcust").as("src"))
      a.unionAll(b).orderBy("src", "id")
    },
    Some("""SELECT * FROM (
              SELECT o_custkey AS id, 'bigorder' AS src FROM orders
              WHERE o_totalprice > 180000
              UNION ALL
              SELECT c_custkey AS id, 'richcust' AS src FROM customer
              WHERE c_acctbal > 9000)
            ORDER BY src, id"""))

  /** UNION (set). */
  private val s10 = Q(
    "s10_union_distinct",
    (s, d) => t(s, d, "orders").filter(col("o_totalprice") > 180000)
      .select(col("o_custkey").as("id"))
      .union(t(s, d, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("id")))
      .distinct()
      .orderBy("id"),
    Some("""SELECT o_custkey AS id FROM orders WHERE o_totalprice > 180000
            UNION
            SELECT c_custkey AS id FROM customer WHERE c_acctbal > 9000
            ORDER BY id"""))

  /** INTERSECT (set). */
  private val s11 = Q(
    "s11_intersect",
    (s, d) => t(s, d, "customer").filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("id"))
      .intersect(t(s, d, "orders").filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("id")))
      .orderBy("id"),
    Some("""SELECT c_custkey AS id FROM customer WHERE c_acctbal > 5000
            INTERSECT
            SELECT o_custkey AS id FROM orders WHERE o_totalprice > 100000
            ORDER BY id"""))

  /** EXCEPT (set). */
  private val s12 = Q(
    "s12_except",
    (s, d) => t(s, d, "customer").select(col("c_custkey").as("id"))
      .except(t(s, d, "orders").select(col("o_custkey").as("id")))
      .orderBy("id"),
    Some("""SELECT c_custkey AS id FROM customer
            EXCEPT
            SELECT o_custkey AS id FROM orders
            ORDER BY id"""))

  /** CASE WHEN (grammar-only in the reference, parser.py:23-27). */
  private val s13 = Q(
    "s13_case_when",
    (s, d) => t(s, d, "orders")
      .withColumn("bucket",
        when(col("o_totalprice") >= 150000, "high")
          .when(col("o_totalprice") >= 50000, "mid")
          .otherwise("low"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), msum(col("o_totalprice")).as("total"))
      .orderBy("bucket"),
    Some("""SELECT CASE WHEN o_totalprice >= 150000 THEN 'high'
                        WHEN o_totalprice >= 50000 THEN 'mid'
                        ELSE 'low' END AS bucket,
                   count(*) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders GROUP BY 1 ORDER BY bucket"""))

  /** BETWEEN / IN / LIKE (grammar-only: parser.py:79-81). */
  private val s14 = Q(
    "s14_between_in_like",
    (s, d) => t(s, d, "orders")
      .filter(col("o_orderdate").between(ntz("1996-01-01"), ntz("1996-12-31"))
        && col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        && col("o_orderpriority").like("%H%"))
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
            WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1996-12-31'
              AND o_orderpriority IN ('1-URGENT', '2-HIGH')
              AND o_orderpriority LIKE '%H%'
            ORDER BY o_orderkey"""))

  /** Arithmetic + modulo + CAST (grammar-only: parser.py:61,74-77).
    * Per-row decimal product is exact in both engines.
    */
  private val s15 = Q(
    "s15_arith_cast",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_partkey") < 25)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(IntegerType).as("qty_int"),
        (col("l_orderkey") % 7).as("okey_mod7"),
        revenue(col("l_extendedprice"), col("l_discount"))
          .cast(DoubleType).as("net"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
                   CAST(l_quantity AS INT) AS qty_int,
                   l_orderkey % 7 AS okey_mod7,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS DOUBLE) AS net
            FROM lineitem WHERE l_partkey < 25
            ORDER BY l_orderkey, l_linenumber"""))

  /** Scalar subquery: orders above the (exactly computed) global average. */
  private val s16 = Q(
    "s16_scalar_subquery",
    (s, d) => {
      val o = t(s, d, "orders")
      val avgP = o.agg(mavg(col("o_totalprice")).as("avg_p"))
      o.crossJoin(broadcast(avgP))
        .filter(col("o_totalprice") > col("avg_p") * 1.8)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE o_totalprice > (
              SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / count(o_totalprice) FROM orders) * 1.8
            ORDER BY o_orderkey"""))

  /** IN (subquery) — planned as a left-semi join. */
  private val s17 = Q(
    "s17_in_subquery",
    (s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), isum(col("l_quantity")).as("qty"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(*) AS n,
                   CAST(sum(l_quantity) AS BIGINT) AS qty
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Correlated EXISTS through the SQL entry point (spark.sql over the
    * registered temp views — the engine's second front door).
    */
  private val s18SqlText =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 170000)
      |ORDER BY c_custkey""".stripMargin
  private val s18 = Q(
    "s18_exists_sql",
    (s, d) => { graft.Tables.registerAll(s, d); s.sql(s18SqlText) },
    Some(s18SqlText))

  /** Window: top-2 orders per customer by row_number (total window order). */
  private val s19 = Q(
    "s19_window_topk",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders) WHERE rn <= 2
            ORDER BY o_custkey, rn"""))

  /** Window: running sum with an explicit ROWS frame over a total order. */
  private val s20 = Q(
    "s20_window_running",
    (s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem").filter(col("l_partkey") < 30)
        .withColumn("run_qty", sum(col("l_quantity")).over(w).cast(LongType))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "run_qty")
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
                   CAST(sum(l_quantity) OVER (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS run_qty
            FROM lineitem WHERE l_partkey < 30
            ORDER BY l_suppkey, l_orderkey, l_linenumber"""))

  /** Window: lag across a customer's order history. */
  private val s21 = Q(
    "s21_window_lag",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders").filter(col("o_custkey") < 40)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("prev_price"),
          (Q.dec2(col("o_totalprice")) - Q.dec2(col("prev_price")))
            .cast(DoubleType).as("delta"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, prev_price,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2))
                        - CAST(prev_price AS DECIMAL(18,2)) AS DOUBLE) AS delta
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                         lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS prev_price
                  FROM orders WHERE o_custkey < 40)
            ORDER BY o_custkey, o_orderkey"""))

  /** ROLLUP — subtotal rows surfaced via coalesce so no NULL sort keys
    * (Spark sorts NULLS FIRST, DuckDB NULLS LAST; coalesce sidesteps it).
    */
  private val s22 = Q(
    "s22_rollup",
    (s, d) => t(s, d, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), isum(col("l_quantity")).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))
      .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
                   coalesce(l_linestatus, 'ALL') AS ls,
                   count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS qty
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY rf, ls"""))

  /** CUBE. */
  private val s23 = Q(
    "s23_cube",
    (s, d) => t(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"))
      .orderBy("status", "priority"),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   count(*) AS n
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ORDER BY status, priority"""))

  /** TPC-H Q3 shape: 3-way join, filter, group, top-10 by revenue.
    * customer is broadcast; orders⋈lineitem shuffles on the join key.
    */
  private val s24 = Q(
    "s24_tpch_q3",
    (s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING"
        && col("o_orderdate") < ntz("1997-07-01")
        && col("l_shipdate") > ntz("1997-07-01"))
      .groupBy("l_orderkey")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10),
    Some("""SELECT l_orderkey,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-07-01'
              AND l_shipdate > TIMESTAMP '1997-07-01'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""))

  /** TPC-H Q5 shape: 5-way join down the region→nation→customer→orders→
    * lineitem star, revenue per nation. Dimensions broadcast.
    */
  private val s25 = Q(
    "s25_tpch_q5",
    (s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA"
        && col("o_orderdate") >= ntz("1997-01-01")
        && col("o_orderdate") < ntz("1998-01-01"))
      .groupBy("n_name")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc),
    Some("""SELECT n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC"""))

  /** String function library (absent from the reference — SURVEY §2
    * "scalar function library").
    */
  private val s26 = Q(
    "s26_string_funcs",
    (s, d) => t(s, d, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("tag"),
        regexp_replace(col("p_type"), "ECONOMY", "ECO").as("ptype_short"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(p_name) AS uname,
                   substring(p_name, 1, 5) AS prefix,
                   CAST(length(p_name) AS INT) AS name_len,
                   concat(p_brand, '-', p_type) AS tag,
                   regexp_replace(p_type, 'ECONOMY', 'ECO') AS ptype_short
            FROM part ORDER BY p_partkey"""))

  /** Date/time functions over the ntz order dates. DuckDB's year()/month()
    * return BIGINT, Spark's INT — both sides cast to INT explicitly.
    */
  private val s27 = Q(
    "s27_date_funcs",
    (s, d) => t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).cast(IntegerType).as("y"),
        month(col("o_orderdate")).cast(IntegerType).as("m"))
      .agg(count(lit(1)).as("n_orders"), msum(col("o_totalprice")).as("total"))
      .orderBy("y", "m"),
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS y,
                   CAST(month(o_orderdate) AS INT) AS m,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders GROUP BY 1, 2 ORDER BY y, m"""))

  /** COUNT(DISTINCT) — expand-based multi-distinct aggregate. */
  private val s28 = Q(
    "s28_count_distinct",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** approx_count_distinct (HLL++): the sketch itself has no exact SQL
    * equivalent (DuckDB's approx_count_distinct is a different HLL with
    * different estimates), so the query is made SELF-CERTIFYING: it emits
    * the exact distinct count plus a boolean attesting the HLL++ estimate
    * landed within 5% of it. HLL++ is deterministic for a fixed input
    * multiset, so the boolean is a stable TRUE (measured relative error
    * at rsd=0.01 is <1% at every SF) and the whole row is oracle-able —
    * the oracle recomputes the exact side and asserts TRUE. A broken
    * sketch flips the boolean and fails the hash-compare.
    */
  private val s29 = Q(
    "s29_approx_distinct",
    // Distinct FIRST, then count + sketch the deduped stream. The
    // obvious one-agg form — countDistinct(...) next to
    // approx_count_distinct(...) — makes Spark plan the multi-distinct
    // Expand: the partial aggregate is then keyed by (flag, partkey,
    // gid), so the companion HLL's 2^14-register buffer is built PER
    // DISTINCT PARTKEY instead of per group (~200k 16KB sketches at
    // sf0.1 — measured 3.9s vs 0.65s + 0.91s for each agg alone).
    // HLL over the deduped set has bit-identical registers (register
    // update is a max; multiplicity never changes it), and the
    // distinct-first shape is also the 100 TB shape: one partial-agg
    // dedup shuffle, then a 3-group sketch. Measured 5.5s -> ~1.2s.
    (s, d) => t(s, d, "lineitem")
      .select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx") - col("exact_parts")) / col("exact_parts")
          <= 0.05).as("within_5pct"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
                   TRUE AS within_5pct
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** GROUPING SETS via the SQL front door. */
  private val s30SqlText =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin
  private val s30 = Q(
    "s30_grouping_sets",
    (s, d) => { graft.Tables.registerAll(s, d); s.sql(s30SqlText) },
    Some(s30SqlText))

  /** A full SQL-text query through spark.sql — join + group + order as one
    * ANSI string shared verbatim with the oracle.
    */
  private val s31SqlText =
    """SELECT c_mktsegment AS seg, count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY c_mktsegment
      |ORDER BY seg""".stripMargin
  private val s31 = Q(
    "s31_sql_entry",
    (s, d) => { graft.Tables.registerAll(s, d); s.sql(s31SqlText) },
    Some(s31SqlText))

  /** Subquery in FROM + table/column aliases (parser.py:95-104,98). */
  private val s32SqlText =
    """SELECT t.seg AS segment, t.n
      |FROM (SELECT c_mktsegment AS seg, count(*) AS n
      |      FROM customer GROUP BY c_mktsegment) t
      |WHERE t.n > 10
      |ORDER BY t.seg""".stripMargin
  private val s32 = Q(
    "s32_from_subquery",
    (s, d) => { graft.Tables.registerAll(s, d); s.sql(s32SqlText) },
    Some(s32SqlText))

  /** JOIN ... USING and NATURAL JOIN (parser.py:90-102). nation/region
    * share no column names, so USING runs on a renamed projection.
    */
  private val s33SqlText =
    """SELECT n_name, r_name
      |FROM (SELECT n_name, n_regionkey AS rk FROM nation)
      |JOIN (SELECT r_name, r_regionkey AS rk FROM region) USING (rk)
      |ORDER BY n_name""".stripMargin
  private val s33 = Q(
    "s33_join_using",
    (s, d) => { graft.Tables.registerAll(s, d); s.sql(s33SqlText) },
    Some(s33SqlText))

  /** Bitwise operators (parser.py:74-77: << >> & |). */
  private val s34 = Q(
    "s34_bitwise",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(255).as("and255"),
        col("l_orderkey").bitwiseOR(col("l_linenumber")).as("or_ln"),
        shiftleft(col("l_suppkey"), 2).as("shl2"),
        shiftright(col("l_orderkey"), 3).as("shr3"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
                   l_orderkey & 255 AS and255,
                   l_orderkey | CAST(l_linenumber AS BIGINT) AS or_ln,
                   CAST(l_suppkey << 2 AS BIGINT) AS shl2,
                   l_orderkey >> 3 AS shr3
            FROM lineitem WHERE l_orderkey < 100
            ORDER BY l_orderkey, l_linenumber"""))

  /** IS NULL / IS NOT NULL (parser.py:73 ISNULL/NOTNULL) over the
    * null-extending side of an outer join.
    */
  private val s35 = Q(
    "s35_is_null",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .filter(col("o_orderkey").isNull && col("c_acctbal").isNotNull)
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            WHERE o_orderkey IS NULL AND c_acctbal IS NOT NULL
            ORDER BY c_custkey"""))

  /** String concatenation via || (parser.py:74). */
  private val s36SqlText =
    """SELECT p_partkey, p_brand || ':' || p_type AS brand_type
      |FROM part WHERE p_size >= 40 ORDER BY p_partkey""".stripMargin
  private val s36 = Q(
    "s36_concat_op",
    (s, d) => { graft.Tables.registerAll(s, d); s.sql(s36SqlText) },
    Some(s36SqlText))

  /** Exact interpolated percentiles (median/quartiles). Spark percentile
    * and DuckDB quantile_cont share the interpolation rule; quantity is
    * whole-numbered so interpolated values are exact halves.
    */
  private val s37 = Q(
    "s37_percentile",
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.5) AS p50,
                   quantile_cont(l_quantity, 0.25) AS p25,
                   quantile_cont(l_quantity, 0.75) AS p75
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Date arithmetic: day difference and interval shift. */
  private val s38 = Q(
    "s38_date_arith",
    (s, d) => t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_partkey") < 20)
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("ship_days"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
                   CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS ship_days,
                   o_orderdate + INTERVAL 30 DAY AS due_date
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_partkey < 20
            ORDER BY l_orderkey, l_linenumber"""))

  /** REGEXP matching (parser.py:81 accepts REGEXP; GLOB/MATCH are
    * SQLite-isms with no ANSI equivalent — RLIKE is the executed form).
    */
  private val s39 = Q(
    "s39_regexp",
    (s, d) => t(s, d, "part")
      .filter(col("p_name").rlike("^(small|large).*widget$"))
      .select(col("p_partkey"), col("p_name"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name,
                   regexp_extract(p_name, '^(\w+)', 1) AS first_word
            FROM part WHERE regexp_matches(p_name, '^(small|large).*widget$')
            ORDER BY p_partkey"""))

  /** TPC-H Q13 shape (custdist): left join preserving zero-order
    * customers, per-customer count, then the count-of-counts histogram.
    * Two aggregations, each a single hash-shuffle on its key; the second
    * input (one row per customer) is tiny at any scale.
    */
  private val s40 = Q(
    "s40_tpch_q13",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc),
    Some("""SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT JOIN orders
                    ON c_custkey = o_custkey
                   AND o_orderpriority <> '1-URGENT'
                  GROUP BY c_custkey)
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q18 shape (large-volume orders): HAVING-filtered aggregate over
    * the fact table joined back to orders + broadcast customer, top-100.
    * The heavy side aggregates BEFORE the join (one row per qualifying
    * order), so the join input is already reduced ~100x.
    */
  private val s41 = Q(
    "s41_tpch_q18",
    (s, d) => {
      val big = t(s, d, "lineitem").groupBy("l_orderkey")
        .agg(isum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      t(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice", "sum_qty")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   o_totalprice, sum_qty
            FROM orders
            JOIN (SELECT l_orderkey,
                         CAST(sum(l_quantity) AS BIGINT) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING CAST(sum(l_quantity) AS BIGINT) > 250) big
              ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"""))

  /** PIVOT: status columns per priority. Explicit pivot values keep the
    * plan a single pass (no distinct-values pre-query); empty cells are
    * coalesced to 0 because Spark's pivot-count yields NULL where the
    * FILTERed count yields 0.
    */
  private val s42 = Q(
    "s42_pivot",
    (s, d) => t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
                   count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
                   count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
            FROM orders GROUP BY o_orderpriority
            ORDER BY o_orderpriority"""))

  /** UNPIVOT (melt): wide part metrics to long form. Value columns are
    * pre-cast to a common type (unpivot requires it); the oracle is the
    * UNION ALL expansion.
    */
  private val s43 = Q(
    "s43_unpivot",
    (s, d) => t(s, d, "part")
      .select(col("p_partkey"),
        col("p_size").cast(DoubleType).as("psize"),
        col("p_retailprice").cast(DoubleType).as("retail"))
      .unpivot(Array(col("p_partkey")),
        Array(col("psize"), col("retail")), "metric", "val")
      .orderBy("p_partkey", "metric"),
    Some("""SELECT p_partkey, 'psize' AS metric, CAST(p_size AS DOUBLE) AS val
            FROM part
            UNION ALL
            SELECT p_partkey, 'retail' AS metric,
                   CAST(p_retailprice AS DOUBLE) AS val
            FROM part
            ORDER BY p_partkey, metric"""))

  /** Array aggregation: per-customer sorted order-key list plus array
    * functions over it (size / element_at / join). collect_list order is
    * partition-dependent, so sort_array pins it — same convention as
    * x25's sequence assembly.
    */
  private val s44 = Q(
    "s44_array_agg",
    (s, d) => t(s, d, "orders")
      .filter(col("o_custkey") < 100)
      .groupBy("o_custkey")
      .agg(sort_array(collect_list(col("o_orderkey"))).as("okeys"))
      .select(col("o_custkey"),
        size(col("okeys")).as("n_orders"),
        element_at(col("okeys"), 1).as("first_key"),
        array_join(transform(col("okeys"), _.cast(StringType)), ",")
          .as("keys_csv"))
      .orderBy("o_custkey"),
    Some("""SELECT o_custkey,
                   CAST(len(list(o_orderkey ORDER BY o_orderkey)) AS INT)
                     AS n_orders,
                   (list(o_orderkey ORDER BY o_orderkey))[1] AS first_key,
                   array_to_string(list(o_orderkey ORDER BY o_orderkey), ',')
                     AS keys_csv
            FROM orders WHERE o_custkey < 100
            GROUP BY o_custkey ORDER BY o_custkey"""))

  /** Ranking-function family: ntile / percent_rank / cume_dist over a
    * total per-partition order (unique tiebreak keeps the doubles
    * engine-identical: with no rank ties both engines compute the same
    * (rank-1)/(n-1) and rank/n divisions).
    */
  private val s45 = Q(
    "s45_window_rank_funcs",
    (s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders").filter(col("o_custkey") < 50)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderstatus", "o_orderkey")
    },
    Some("""SELECT o_orderstatus, o_orderkey, o_totalprice,
                   CAST(ntile(4) OVER w AS INT) AS quartile,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist() OVER w AS cume
            FROM orders WHERE o_custkey < 50
            WINDOW w AS (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice DESC, o_orderkey ASC)
            ORDER BY o_orderstatus, o_orderkey"""))

  /** Deterministic 10% sampling as a map-side hash-mod predicate: keep
    * rows whose key-hash is 0 mod 10. ZERO data movement — no window, no
    * shuffle, the filter rides the scan — where the exact-spacing
    * formulation (row_number per stratum, every 10th row) would
    * row-number the ENTIRE table through per-stratum window tasks: a
    * 3-value status column at 100 TB means a third of the table per
    * task. Every stratum is sampled at the same 10% rate (key hashes are
    * uniform within each status), which is what stratified sampling
    * buys, without the global numbering. The hash is the md5-prefix fold
    * (same cross-engine technique as x07) so DuckDB reproduces it
    * bit-for-bit; production would use pmod(xxhash64(key), 10) = 0 —
    * same plan shape, cheaper hash, no SQL twin.
    */
  private val s46 = Q(
    "s46_stratified_sample",
    (s, d) => t(s, d, "orders")
      .filter(pmod(
        conv(substring(md5(col("o_orderkey").cast(StringType)), 1, 15),
          16, 10).cast(LongType), lit(10L)) === 0)
      .select("o_orderstatus", "o_orderkey", "o_totalprice")
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderstatus, o_orderkey, o_totalprice
            FROM orders
            WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
                       AS BIGINT) % 10 = 0
            ORDER BY o_orderkey"""))

  /** TPC-H Q4 shape: correlated EXISTS with a cross-side predicate
    * (a lineitem shipped 60+ days after its order date), planned as a
    * left-semi join — the dedup-free way to ask "has at least one".
    */
  private val s47 = Q(
    "s47_tpch_q4",
    (s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ntz("1996-01-01")
          && col("o_orderdate") < ntz("1996-07-01"))
      val l = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l, col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q10 shape (returned items): fact filtered on the return flag,
    * joined up the star to customer + nation, top-20 by lost revenue.
    */
  private val s48 = Q(
    "s48_tpch_q10",
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= ntz("1996-01-01")
            && col("o_orderdate") < ntz("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20),
    Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC LIMIT 20"""))

  /** MapType surface: per-status map of priority -> order count
    * (map_from_entries over a sorted entry list so key order is pinned),
    * probed with element_at / map_keys. The map itself is exported as its
    * sorted key list + a looked-up value — engine map renderings differ,
    * scalar probes of the map do not.
    */
  private val s49 = Q(
    "s49_map_funcs",
    (s, d) => t(s, d, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("o_orderstatus")
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("o_orderpriority"), col("cnt")))))
        .as("prio_map"))
      .select(col("o_orderstatus"),
        element_at(col("prio_map"), "1-URGENT").as("urgent_cnt"),
        size(col("prio_map")).as("n_prios"),
        array_join(map_keys(col("prio_map")), ",").as("prios"))
      .orderBy("o_orderstatus"),
    Some("""WITH pc AS (SELECT o_orderstatus, o_orderpriority,
                               count(*) AS cnt
                        FROM orders GROUP BY 1, 2)
            SELECT o_orderstatus,
                   max(cnt) FILTER (WHERE o_orderpriority = '1-URGENT')
                     AS urgent_cnt,
                   CAST(count(*) AS INT) AS n_prios,
                   string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
                     AS prios
            FROM pc GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Generator surface: a month spine from sequence()+explode left-joined
    * to monthly order counts — spine months with no orders survive with
    * n=0. The spine is generated, not scanned, so the pattern costs
    * nothing at any scale and fixes the "missing month" hole in
    * time-series rollups.
    */
  private val s50 = Q(
    "s50_date_spine",
    (s, d) => {
      val spine = s.range(1)
        .select(explode(sequence(
          ntz("1995-01-01"), ntz("2002-06-01"),
          expr("INTERVAL 1 MONTH"))).as("month_start"))
      val monthly = t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("cnt"))
      spine.join(monthly, col("month_start") === col("m"), "left")
        .select(col("month_start"),
          coalesce(col("cnt"), lit(0L)).as("n_orders"))
        .orderBy("month_start")
    },
    Some("""WITH spine AS (
              SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                       TIMESTAMP '2002-06-01', INTERVAL 1 MONTH))
                AS month_start),
                 monthly AS (
              SELECT date_trunc('month', o_orderdate) AS m, count(*) AS cnt
              FROM orders GROUP BY 1)
            SELECT month_start, coalesce(cnt, 0) AS n_orders
            FROM spine LEFT JOIN monthly ON month_start = m
            ORDER BY month_start"""))

  val all: Seq[Q] = Seq(s01, s02, s03, s04, s05, s06, s07, s08, s09, s10,
    s11, s12, s13, s14, s15, s16, s17, s18, s19, s20, s21, s22, s23, s24,
    s25, s26, s27, s28, s29, s30, s31, s32, s33, s34, s35, s36, s37, s38,
    s39, s40, s41, s42, s43, s44, s45, s46, s47, s48, s49, s50)
}
