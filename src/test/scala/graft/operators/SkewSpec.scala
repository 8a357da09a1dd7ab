package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  private lazy val events = graft.Tables.load(spark, sfDir, "events")

  test("saltedCountSum equals the direct aggregate") {
    val salted = Skew.saltedCountSum(events, "event_type", "value",
      "event_id", 8).orderBy("event_type").collect()
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("event_type").collect()
    assert(salted.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }

  test("phase-1 groups actually fan out a hot key") {
    // every row shares one key -> without salt: 1 partial group; with
    // salt: up to `salts` groups
    val hot = events.withColumn("k", lit("HOT"))
    val partials = hot.withColumn("__salt",
      Skew.saltOf(col("event_id"), 8))
      .groupBy("k", "__salt").count().count()
    assert(partials > 1 && partials <= 8)
  }

  test("saltedJoin equals the plain join") {
    val dim = events.select("event_type").distinct()
      .withColumn("type_tag", upper(col("event_type")))
    val plain = events.join(dim, "event_type")
      .select("event_id", "type_tag").orderBy("event_id").collect()
    val salted = Skew.saltedJoin(events, dim, "event_type", "event_id", 4)
      .select("event_id", "type_tag").orderBy("event_id").collect()
    assert(plain.length == salted.length)
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("salt is deterministic, not random") {
    val a = events.select(Skew.saltOf(col("event_id"), 8)).collect()
    val b = events.select(Skew.saltOf(col("event_id"), 8)).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
  }
}
