package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dev measurement tool (VERDICT r21 task 9): wall-time the two STATEFUL
  * streaming operators against their batch twins on the graded data, so
  * the optimization record carries a number for the streaming path that
  * Bench never surfaces. `runMain graft.tools.StreamParity [sfDir]`.
  *
  * What is timed (per op, `reps` alternating A/B):
  *  - batch twin: the batch operator materialized with Bench's
  *    primitive over the same rows;
  *  - stream: the same rows staged as parquet, run through the REAL
  *    streaming engine (file source -> memory sink, processAllAvailable)
  *    with the stateful operator — the StreamingSpec parity harness
  *    shape, including the sessionization sentinel flushes.
  *
  * This is a COST comparison at one cadence (all rows in one micro-batch
  * plus sentinel batches), not a parity proof — StreamingSpec owns
  * row-level parity. The streaming number includes the engine's
  * micro-batch planning, state store, and checkpointing overheads, which
  * is the point: it bounds what the streaming deployment pays over the
  * batch plan for the same data.
  */
object StreamParity {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.builder("local[32]", 32)
      .appName("graft-streamparity").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PARITY $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // ---- stateful sessionization: Sessionize.sessions vs
    // StreamOps.statefulSessions through the streaming engine
    val events = graft.Tables.load(spark, dir, "events")
    val maxUs = events.agg(max(unix_micros(col("ts"))))
      .collect()(0).getLong(0)
    val gapUs = 1800L * 1000000L
    def sentinel(user: Long, us: Long) = {
      import spark.implicits._
      Seq((-user, user, "ping", 0.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(lit(us)).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    }
    for (r <- 1 to reps) {
      timed(s"sessions_batch rep$r") {
        graft.Bench.materialize(
          graft.operators.Sessionize.sessions(events, 1800L))
      }
      // stage OUTSIDE the timed region: the parquet copy is test
      // scaffolding, not a cost the streaming deployment pays (its
      // source already exists)
      val stage = Files.createTempDirectory("graftsparity").toString
      events.write.mode("overwrite").parquet(stage)
      timed(s"sessions_stream rep$r") {
        val src = spark.readStream
          .schema(graft.streaming.StreamOps.eventSchema).parquet(stage)
          .withWatermark("ts", "1 second")
        val q = graft.streaming.StreamOps
          .statefulSessions(spark, src, 1800L)
          .writeStream.format("memory").queryName(s"sp_sessions_$r")
          .outputMode("append").start()
        q.processAllAvailable()
        sentinel(-99L, maxUs + 10L * gapUs)
          .write.mode("append").parquet(stage)
        q.processAllAvailable()
        sentinel(-98L, maxUs + 20L * gapUs)
          .write.mode("append").parquet(stage)
        q.processAllAvailable()
        q.stop()
        spark.table(s"sp_sessions_$r").collect()
      }
    }

    // ---- streaming near-dup candidates vs the batch blocking
    // (minhashCandidates; the stream additionally carries the signature
    // estimate — noted in the record)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val stamped = docs.withColumn("fetched_at",
      timestamp_seconds(lit(1700000000L) + col("doc_id")))
    for (r <- 1 to reps) {
      timed(s"neardup_batch rep$r") {
        graft.Bench.materialize(
          graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text"))
      }
      val stage = Files.createTempDirectory("graftnparity").toString
      stamped.write.mode("overwrite").parquet(stage)
      timed(s"neardup_stream rep$r") {
        val src = spark.readStream
          .schema(stamped.schema).parquet(stage)
        val q = graft.streaming.StreamOps
          .nearDupPairsStream(spark, src, "doc_id", "fetched_at", "text",
            0.5, ttl = "1 day")
          .toDF()
          .writeStream.format("memory").queryName(s"sp_neardup_$r")
          .outputMode("append").start()
        q.processAllAvailable()
        q.stop()
        spark.table(s"sp_neardup_$r").collect()
      }
    }
    spark.stop()
  }
}
