package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output-side source/sink policy for the 100 TB world. The reference's
  * only sink is stdout (sqlengine.py:237-241, wrapped by
  * engine.ResultFormatter for CLI parity); real pipelines land in
  * partitioned or bucketed parquet, and HOW they land decides the cost of
  * every downstream read:
  *
  * - partitionBy(date-ish, low-cardinality) => partition pruning: a
  *   day-scoped query reads 1/365th of the data before any row is
  *   decoded.
  * - bucketBy(key) => a future join/group on that key skips its shuffle
  *   entirely (both sides bucketed => zero-exchange sort-merge join).
  * - repartition before write controls file count: without it, every
  *   task writes a file per partition value -> the small-files problem
  *   at scale.
  */
object Sinks {

  /** Date/category-partitioned parquet: one directory level per
    * partition column, `filesPerPartition` files inside each via a
    * pre-write repartition on the partition keys.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed + sorted managed table: co-locates and pre-sorts rows by
    * the join/group key so downstream equi-operations on `bucketCol`
    * need no exchange.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Header'd CSV export, `files` output files. CSV is the interchange
    * sink (no schema, no types beyond strings) — reads back only with an
    * explicit schema, which `readCsv` enforces. Quoting matches the
    * reference dialect (quoted and unquoted values both round-trip —
    * /root/reference PDF §Dataset.1.ii).
    */
  def writeCsv(df: DataFrame, path: String, files: Int = 1): Unit =
    // repartition, not coalesce: coalesce(1) would collapse the WHOLE
    // upstream stage to one task; repartition funnels only the write.
    df.repartition(files).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** Schema-enforced CSV read-back (no inference pass: inference costs a
    * full extra scan and guesses types — never acceptable at scale).
    */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** JSON-lines export: self-describing rows for downstream consumers
    * that can't read parquet. Null fields are kept so the schema is
    * stable row-to-row.
    */
  def writeJson(df: DataFrame, path: String, files: Int = 1): Unit =
    df.repartition(files).write.mode(SaveMode.Overwrite)
      .option("ignoreNullFields", "false").json(path)

  /** Schema-enforced JSON-lines read-back. */
  def readJson(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
