package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver-generated star schema (TESTDATA.md).
  *
  * Mirrors the reference's external-catalog idea (metadata.txt parsed at
  * /root/reference/sqlengine.py:72-90) for the parquet world: one place that
  * knows how to turn a table name into a DataFrame. The reference loads
  * whole CSVs eagerly into Python lists (sqlengine.py:104-117); here a load
  * is just a lazy parquet scan node — Catalyst prunes columns and pushes
  * filters into it, so "loading" costs nothing until an action runs.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet's `ts` encoding is the driver's choice and has
    * changed across rounds, so branch on what the footer actually says
    * rather than assuming either shape:
    *  - INT64 TIMESTAMP(NANOS): Spark's reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]); the legacy flag reads the nanos as a
    *    plain long and we truncate to micros ourselves. `div` keeps the
    *    arithmetic integral — a double division would lose precision at
    *    1.7e18 ns epochs (2^53 < 1.7e18).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; cast to TIMESTAMP. Every graft session pins
    *    spark.sql.session.timeZone=UTC (GraftSession.builder), so the
    *    cast maps wall-clock micros to the same epoch micros the nanos
    *    path produced — and the same values DuckDB's naive TIMESTAMP
    *    reads for the oracle.
    * Already-TIMESTAMP data (our own generated slices) passes through.
    * Any OTHER encoding (a future driver switch to INT64 millis, string
    * timestamps, …) fails loudly here, at the loader, instead of
    * surfacing as downstream analysis errors far from the cause.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unrecognized type $other; " +
            "teach Tables.events how this encoding maps to epoch micros " +
            "before any query consumes it")
    }
  }

  /** Lazy scan of one table; schema comes from parquet metadata. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  /** Register every table as a temp view so `spark.sql` queries resolve —
    * the Spark analogue of the reference's definedb()+populatedb() pair.
    *
    * Memoized per (session, dir): each registration re-reads ten parquet
    * footers for schema inference, which is pure repeated driver-side I/O
    * when the same session runs many SQL-entry queries over one dataset
    * (every Verify/Bench run does exactly that). Switching dir in the
    * same session re-registers, so a warmup pass on a small SF cannot
    * leak its views into the timed pass on the big one. If a caller
    * drops one of these views manually, pass a fresh session (or another
    * dir) to force re-registration — not a flow any driver surface uses.
    */
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def registerAll(spark: SparkSession, dir: String): Unit = {
    // sessionUUID is unique per session for the JVM's lifetime — unlike an
    // identityHashCode, which a fresh session can collide with after a
    // stopped one is GC'd, silently skipping registration. Registration
    // runs BEFORE the memo write so a throw is not memoized as success.
    // One small entry per session ever created; sessions are few and
    // long-lived in every flow here, so the map stays tiny.
    val key = org.apache.spark.sql.graftshim.SessionShim.sessionUUID(spark)
      .getOrElse(System.identityHashCode(spark).toString)
    if (registeredDir.get(key) != dir) {
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registeredDir.put(key, dir)
    }
  }
}
