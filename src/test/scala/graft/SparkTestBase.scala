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

  /** Run `f` with session confs overridden, restoring (or unsetting)
    * them afterwards — the session is shared across suites, so a leaked
    * conf would bleed into unrelated tests.
    */
  def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
