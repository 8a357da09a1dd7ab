package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (lazy; sbt forks one JVM for the
  * test run so sessions are reused via getOrCreate).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder()
    .appName("graft-test")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}
