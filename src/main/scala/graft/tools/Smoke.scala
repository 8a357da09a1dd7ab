package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only smoke: confirm all testdata tables read cleanly. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"=== $t  rows=${df.count()}")
      df.printSchema()
      df.show(2, 60)
    }
    spark.stop()
  }
}
