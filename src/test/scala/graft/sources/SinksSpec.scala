package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SinksSpec extends SparkTestBase {

  test("partitioned sink prunes partitions on read") {
    val out = Files.createTempDirectory("graftsink").toString + "/orders"
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .withColumn("y", year(col("o_orderdate")))
    Sinks.writePartitioned(orders, out, Seq("y"))
    val read = spark.read.parquet(out).filter(col("y") === 1997)
    val plan = read.queryExecution.executedPlan.toString
    // partition filter must be applied at the directory level, not as a
    // row filter after a full scan
    assert(plan.contains("PartitionFilters: [isnotnull(y"), plan)
    assert(read.count() ==
      orders.filter(col("y") === 1997).count())
  }

  test("csv and json sinks round-trip rows and types under an explicit schema") {
    val base = Files.createTempDirectory("graftfmt").toString
    val customer = graft.Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    Sinks.writeCsv(customer, s"$base/csv")
    Sinks.writeJson(customer, s"$base/json")
    val csvBack = Sinks.readCsv(spark, s"$base/csv", customer.schema)
    val jsonBack = Sinks.readJson(spark, s"$base/json", customer.schema)
    for (back <- Seq(csvBack, jsonBack)) {
      assert(back.schema == customer.schema)
      assert(back.exceptAll(customer).isEmpty
        && customer.exceptAll(back).isEmpty)
    }
  }

  test("bucketed tables join without an exchange") {
    // warehouse dir is a static conf; the default (./spark-warehouse,
    // gitignored) is fine for this test — but each JVM gets a fresh
    // in-memory metastore, so clear stale table locations from disk first
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val customer = graft.Tables.load(spark, sfDir, "customer")
    Sinks.writeBucketed(orders.withColumnRenamed("o_custkey", "k"),
      "b_orders", "k", 4)
    Sinks.writeBucketed(customer.withColumnRenamed("c_custkey", "k"),
      "b_customer", "k", 4)
    val joined = spark.table("b_orders").join(
      spark.table("b_customer"), "k")
    // force a non-broadcast join so the bucketing is what saves the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = spark.table("b_orders").join(spark.table("b_customer"), "k")
        .queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 0, s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }
}
