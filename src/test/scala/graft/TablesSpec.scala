package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Tables.load's events normalization: the driver has shipped
  * events.parquet with two different `ts` encodings across rounds
  * (INT64 TIMESTAMP(NANOS) through round 12, plain TIMESTAMP_MICROS /
  * NTZ from round 13), and the loader branches on the footer rather
  * than assuming either. Pin that both encodings of the SAME instants
  * load to identical TIMESTAMP values — so the next driver-side
  * encoding change fails here, loudly, instead of as 35 analysis
  * errors deep inside the events suites.
  */
class TablesSpec extends SparkTestBase {

  // two instants, the second carrying sub-millisecond micros (the
  // precision Sessionize's unix_micros arithmetic depends on)
  private val micros = Seq(1700000000000000L, 1700000123456789L)

  private def loadTs(dir: String): Seq[Long] =
    Tables.load(spark, dir, "events")
      .select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq.sorted

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column,
      tsType: DataType): Unit = {
    import spark.implicits._
    micros.zipWithIndex.toDF("us", "event_id")
      .select(col("event_id").cast(LongType), tsCol.cast(tsType).as("ts"),
        lit(1L).as("user_id"), lit("click").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("NTZ-micros events load to the same instants as legacy nanos longs") {
    val ntzDir = Files.createTempDirectory("tab_ntz").toString
    // timestamp_micros gives TIMESTAMP; cast to NTZ under the UTC
    // session keeps the same wall clock = same micros — written to
    // parquet as TIMESTAMP(MICROS, isAdjustedToUTC=false), the round-13
    // driver encoding
    writeEvents(ntzDir, timestamp_micros(col("us")), TimestampNTZType)
    assert(loadTs(ntzDir) == micros)

    // the pre-round-13 encoding: a plain long column named ts holding
    // NANOS since epoch (Spark can't write INT64 TIMESTAMP(NANOS), but
    // the loader's legacy path reads exactly this long-typed shape)
    val nanosDir = Files.createTempDirectory("tab_nanos").toString
    writeEvents(nanosDir, col("us") * 1000L, LongType)
    assert(loadTs(nanosDir) == micros)
  }

  test("already-TIMESTAMP events (our own generated slices) pass through") {
    val dir = Files.createTempDirectory("tab_ltz").toString
    writeEvents(dir, timestamp_micros(col("us")), TimestampType)
    assert(loadTs(dir) == micros)
  }

  test("an unrecognized ts encoding fails at the loader, naming the type") {
    // e.g. a future driver switch to string timestamps — must die HERE,
    // not as analysis errors deep inside the events suites
    val dir = Files.createTempDirectory("tab_bad").toString
    writeEvents(dir, date_format(timestamp_micros(col("us")),
      "yyyy-MM-dd HH:mm:ss"), StringType)
    val e = intercept[IllegalStateException] { loadTs(dir) }
    assert(e.getMessage.contains("StringType"))
  }
}
