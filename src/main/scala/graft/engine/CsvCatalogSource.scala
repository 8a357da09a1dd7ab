package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's table source: headerless CSVs named `<table>.csv` in a
  * data directory, values optionally double-quoted (both forms must parse
  * — /root/reference/sqlengine.py:104-117 via csv.reader; assignment PDF
  * p.1 §Dataset.1). Schema comes from the Catalog, never inferred — at
  * 100 TB a schema-inference pass over CSV is a full extra scan.
  */
object CsvCatalogSource {

  def read(spark: SparkSession, dir: String, name: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "false")
      .option("quote", "\"")
      .csv(s"$dir/$name.csv")

  /** Register every catalog table as a temp view named after it — the
    * Spark analogue of definedb()+populatedb(). Missing files surface as
    * AnalysisException at action time with a clean path message (the
    * reference prints an error and exits, sqlengine.py:114-117).
    */
  def registerAll(spark: SparkSession, dir: String,
      catalog: Map[String, StructType]): Unit =
    catalog.foreach { case (name, schema) =>
      read(spark, dir, name, schema).createOrReplaceTempView(name)
    }
}
