package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming operators driven through the real streaming engine: the
  * batch events table is staged as a parquet file-stream source, results
  * land in a memory sink, and the windowed aggregates are compared
  * against their batch twins computed on the same data.
  */
class StreamingSpec extends SparkTestBase {

  private lazy val batchEvents =
    graft.Tables.load(spark, sfDir, "events")

  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graftstream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    dir
  }

  private def streamEvents =
    spark.readStream.schema(StreamOps.eventSchema).parquet(streamDir)

  test("tumbling hourly counts: streaming equals batch") {
    val got = StreamOps.runToMemory(spark,
      StreamOps.hourlyCounts(streamEvents), "hourly", "complete")
      .select("hour_start", "event_type", "n", "sum_value")
    val want = StreamOps.hourlyCounts(batchEvents)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stateless pipeline operators run unchanged on a stream: hash " +
    "split and the rule gate match their batch outputs row-for-row") {
    // Split.assign and FilterRules are pure per-row projections, so the
    // SAME operator code applies to a readStream frame — the property
    // that lets a pipeline run its assignment/gating logic in both its
    // bulk and incremental ingestion paths without a second
    // implementation
    val docsDir = java.nio.file.Files
      .createTempDirectory("graft-stream-docs").toString
    val batchDocs = graft.Tables.load(spark, sfDir, "documents")
    batchDocs.write.mode("overwrite").parquet(docsDir)
    val streamDocs = spark.readStream
      .schema(batchDocs.schema).parquet(docsDir)
    val splits = Seq("train" -> 800, "val" -> 100, "test" -> 100)
    val gotSplit = StreamOps.runToMemory(spark,
      graft.operators.Split.assign(
        streamDocs.select("doc_id"), "doc_id", splits), "split_stream")
    val wantSplit = graft.operators.Split.assign(
      batchDocs.select("doc_id"), "doc_id", splits)
    assert(gotSplit.count() == batchDocs.count())
    assert(gotSplit.exceptAll(wantSplit).isEmpty &&
      wantSplit.exceptAll(gotSplit).isEmpty)
    val stop = graft.operators.TextAnalysis.langMarkers("en")
    val gotGate = StreamOps.runToMemory(spark,
      graft.operators.FilterRules(
        streamDocs, "doc_id", "text", stop), "gate_stream")
    val wantGate = graft.operators.FilterRules(
      batchDocs, "doc_id", "text", stop)
    assert(gotGate.exceptAll(wantGate).isEmpty &&
      wantGate.exceptAll(gotGate).isEmpty)
    // applyBoilerplate: yesterday's corpus-wide list applied to
    // today's (streamed) ingest — per-row, stateless, same operator
    // code both cadences
    val list = graft.operators.ChunkDedup
      .boilerplateChunks(batchDocs, "doc_id", "text", 4, 3)
      .collect().map(_.getString(0)).toSeq
    assert(list.nonEmpty)
    val gotClean = StreamOps.runToMemory(spark,
      graft.operators.ChunkDedup.applyBoilerplate(
        streamDocs, "doc_id", "text", 4, list), "chunk_stream")
    val wantClean = graft.operators.ChunkDedup.applyBoilerplate(
      batchDocs, "doc_id", "text", 4, list)
    assert(gotClean.exceptAll(wantClean).isEmpty &&
      wantClean.exceptAll(gotClean).isEmpty)
    // winnowing fingerprint extraction is one stateless compiled pass
    // per row — the ingest side of x61 runs on a stream unchanged
    // (matching/bucketing stays a batch job over the accumulated index)
    val gotFp = StreamOps.runToMemory(spark,
      graft.operators.Winnow.fingerprints(
        streamDocs, "doc_id", "text", 3, 4), "winnow_stream")
    val wantFp = graft.operators.Winnow.fingerprints(
      batchDocs, "doc_id", "text", 3, 4)
    assert(gotFp.exceptAll(wantFp).isEmpty &&
      wantFp.exceptAll(gotFp).isEmpty)
    // classifier inference: a literal weight artifact + per-row fold —
    // the trained gate runs at ingest with the same operator code
    val w = (0 until 64).map(j => (j * 37 % 100) / 100.0 - 0.4)
    val gotClf = StreamOps.runToMemory(spark,
      graft.operators.Classifier.ngramScore(
        streamDocs, "doc_id", "text", w, -0.1), "clf_stream")
    val wantClf = graft.operators.Classifier.ngramScore(
      batchDocs, "doc_id", "text", w, -0.1)
    assert(gotClf.exceptAll(wantClf).isEmpty &&
      wantClf.exceptAll(gotClf).isEmpty)
    // retrieval chunking: pure Generate, so the embed-index prep can
    // chunk documents as they arrive
    val gotCh = StreamOps.runToMemory(spark,
      graft.operators.TextAnalysis.slidingChunks(
        streamDocs, "doc_id", "text", 5, 3), "chunks_stream")
    val wantCh = graft.operators.TextAnalysis.slidingChunks(
      batchDocs, "doc_id", "text", 5, 3)
    assert(gotCh.exceptAll(wantCh).isEmpty &&
      wantCh.exceptAll(gotCh).isEmpty)
    // the COMPOSED funnel prefix (rules ∧ classifier — x75 stages
    // 1-2) as one joinless projection: the form an ingest pipeline
    // actually runs, pinned row-for-row against the batch x75 shape
    // (separate stage frames joined on doc_id). Tertile/budget are
    // population-dependent cuts and stay batch by design.
    val gotFunnel = StreamOps.runToMemory(spark,
      graft.operators.Classifier.composedGate(
        streamDocs, "doc_id", "text", stop, w, -0.1), "funnel_stream")
    val wantFunnel = graft.operators.FilterRules(
        batchDocs, "doc_id", "text", stop)
      .select(col("doc_id"), col("keep").as("rule_pass"))
      .join(graft.operators.Classifier.ngramScore(
          batchDocs, "doc_id", "text", w, -0.1)
        .select(col("doc_id"), col("keep").as("clf_pass")), Seq("doc_id"))
      .select(col("doc_id"), col("rule_pass"), col("clf_pass"),
        (col("rule_pass") && col("clf_pass")).as("keep"))
    assert(gotFunnel.count() == batchDocs.count())
    assert(gotFunnel.exceptAll(wantFunnel).isEmpty &&
      wantFunnel.exceptAll(gotFunnel).isEmpty)
    // the composed INGEST prefix (x81 stages 1+3: boilerplate-strip,
    // then rules ∧ classifier on the CLEANED text) — the stateless
    // whole of the daily ingest job; the near-dup stage becomes a
    // stream-static join at this cadence and its batch form is graded
    // by x81's oracle
    val gotIngest = StreamOps.runToMemory(spark,
      graft.operators.Ingest.statelessPrefix(
        streamDocs, "doc_id", "text", 4, list, stop, w, -0.1),
      "ingest_stream")
    val wantIngest = graft.operators.Ingest.statelessPrefix(
      batchDocs, "doc_id", "text", 4, list, stop, w, -0.1)
    assert(gotIngest.count() == batchDocs.count())
    assert(gotIngest.exceptAll(wantIngest).isEmpty &&
      wantIngest.exceptAll(gotIngest).isEmpty)
  }

  test("the ingest near-dup stage runs at streaming cadence as a " +
    "stream-static join: flagged ids from the streamed incoming " +
    "batch equal batch ingestVerdicts' neardup_reject set") {
    // Ingest.ingestVerdicts' scaladoc claims the near-dup stage
    // "becomes a stream-static join" at streaming cadence — this is
    // that claim demonstrated, not asserted. The static side is the
    // ingest-invariant corpus half (cleaned, banded, shingle sets —
    // what production stores as a bucketed table); the stream side is
    // the stateless prefix's cleaned text carrying its own
    // verification set through the banding explode, so candidate
    // generation AND verification are ONE stream-static equi-join
    // plus a stateful id dedup (append-mode-safe, no stream-stream
    // join anywhere).
    import graft.operators.{ChunkDedup, Dedup, Ingest, TextAnalysis}
    val batchDocs = graft.Tables.load(spark, sfDir, "documents")
    val corpus = batchDocs.filter(col("doc_id") < 250)
    val incoming = batchDocs.filter(col("doc_id") >= 250)
    val stop = TextAnalysis.langMarkers("en")
    val w = (0 until 256).map(j =>
      (j * 2654435761L % 1000L) / 1000.0 - 0.5)
    val list = ChunkDedup
      .boilerplateChunks(corpus, "doc_id", "text", 4, 3)
      .collect().map(_.getString(0)).toSeq
    val incomingDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-in").toString
    incoming.write.mode("overwrite").parquet(incomingDir)
    val streamIncoming = spark.readStream
      .schema(incoming.schema).parquet(incomingDir)
    val corpusClean = ChunkDedup
      .applyBoilerplate(corpus, "doc_id", "text", 4, list)
      .select(col("doc_id"), col("text_clean"))
    val staticSide = Dedup
      .bandedFrame(corpusClean, "doc_id", "text_clean", 3, 32, 8)
      .select(col("band"), col("bhash"), col("id").as("id_old"))
      .join(corpusClean.select(col("doc_id").as("id_old"),
        graft.functions.SketchFunctions
          .shingleHashSet(col("text_clean"), 3).as("set_o")),
        Seq("id_old"))
      .localCheckpoint()
    val prefix = Ingest.statelessPrefix(
      streamIncoming, "doc_id", "text", 4, list, stop, w, -0.1)
    val bandedNew = prefix
      .select(col("doc_id").as("id_new"), col("text_clean"))
      .withColumn("set_n", graft.functions.SketchFunctions
        .shingleHashSet(col("text_clean"), 3))
      .withColumn("sig", graft.functions.SketchFunctions
        .minhashSignature(col("text_clean"), 3, 32))
      .filter(col("sig").isNotNull) // < 3 tokens: not near-dup eligible
      .select(col("id_new"), col("set_n"),
        posexplode(array(Dedup.bandHashExprs(col("sig"), 32, 8): _*))
          .as(Seq("band", "bhash")))
    val flagged = bandedNew.join(staticSide, Seq("band", "bhash"))
      .filter(Dedup.setJaccard(col("set_n"), col("set_o")) >= 0.6)
      // stateful dedup WITHOUT a watermark — deliberate: the contract
      // (Ingest scaladoc) is batch-per-day cadence, where state is
      // bounded by one day's flagged ids and the checkpoint rotates
      // with the daily restart; only an eternal query would need
      // dropDuplicatesWithinWatermark's bounded-state tradeoff
      .select("id_new").dropDuplicates("id_new")
    val got = StreamOps.runToMemory(spark, flagged, "ingest_nd_stream")
      .collect().map(_.getLong(0)).toSet
    val want = Ingest.ingestVerdicts(corpus, incoming, "doc_id",
        "text", 4, list, 0.6, stop, w, -0.1)
      .filter(col("neardup_reject")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty, "fixture lost its cross-half near-dups")
    assert(got == want)
  }

  test("the near-dup stage streams against the PERSISTED bucketed " +
    "corpus index: flagged ids from the streamed batch equal " +
    "ingestVerdictsIndexed's neardup_reject set") {
    // The production daily shape end-to-end: writeCorpusIndex persists
    // the corpus half ONCE at refresh time (bucketed `_bands` +
    // `_sets` tables), and intraday documents stream against those
    // TABLES — not against a corpus frame recomputed inside the
    // query, which is what the previous test's static side still was.
    // The static side here is two spark.table() scans, so the
    // streaming query re-reads exactly what a second driver JVM would
    // see after the refresh job exits: the demonstrated contract is
    // refresh-once / stream-all-day, with flagged-id parity against
    // the batch indexed path (whose verdicts x82 grades end-to-end).
    import graft.operators.{ChunkDedup, Dedup, Ingest, TextAnalysis}
    val batchDocs = graft.Tables.load(spark, sfDir, "documents")
    val corpus = batchDocs.filter(col("doc_id") < 250)
    val incoming = batchDocs.filter(col("doc_id") >= 250)
    val stop = TextAnalysis.langMarkers("en")
    val w = (0 until 256).map(j =>
      (j * 2654435761L % 1000L) / 1000.0 - 0.5)
    val list = ChunkDedup
      .boilerplateChunks(corpus, "doc_id", "text", 4, 3)
      .collect().map(_.getString(0)).toSeq
    Ingest.writeCorpusIndex(corpus, "doc_id", "text", 4, list,
      "graft_stream_ndidx", buckets = 4)
    try {
      val incomingDir = java.nio.file.Files
        .createTempDirectory("graft-ingest-idx-in").toString
      incoming.write.mode("overwrite").parquet(incomingDir)
      val streamIncoming = spark.readStream
        .schema(incoming.schema).parquet(incomingDir)
      val prefix = Ingest.statelessPrefix(
        streamIncoming, "doc_id", "text", 4, list, stop, w, -0.1)
      // the stream side carries its own verification set through the
      // banding explode (same shape as the previous test); the corpus
      // side is READ from the two bucketed tables, never recomputed
      val bandedNew = prefix
        .select(col("doc_id").as("id_new"), col("text_clean"))
        .withColumn("set_n", graft.functions.SketchFunctions
          .shingleHashSet(col("text_clean"), 3))
        .withColumn("sig", graft.functions.SketchFunctions
          .minhashSignature(col("text_clean"), 3, 32))
        .filter(col("sig").isNotNull)
        .select(col("id_new"), col("set_n"),
          posexplode(array(Dedup.bandHashExprs(col("sig"), 32, 8): _*))
            .as(Seq("band", "bhash")))
      val flagged = bandedNew
        .join(spark.table("graft_stream_ndidx_bands"), Seq("band", "bhash"))
        .join(spark.table("graft_stream_ndidx_sets"), Seq("id_old"))
        .filter(Dedup.setJaccard(col("set_n"), col("set_o")) >= 0.6)
        .select("id_new").dropDuplicates("id_new")
      val got = StreamOps.runToMemory(spark, flagged, "ingest_ndidx_stream")
        .collect().map(_.getLong(0)).toSet
      val want = Ingest.ingestVerdictsIndexed(incoming,
          "graft_stream_ndidx", "doc_id", "text", 4, list, 0.6, stop,
          w, -0.1)
        .filter(col("neardup_reject")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(want.nonEmpty, "fixture lost its cross-half near-dups")
      assert(got == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_stream_ndidx_bands")
      spark.sql("DROP TABLE IF EXISTS graft_stream_ndidx_sets")
    }
  }

  test("mid-stream index append visibility: rows appended to the " +
    "persisted corpus index ARE seen by the RUNNING query's later " +
    "micro-batches — a catalog-table static side lists its files at " +
    "execution time, once per micro-batch — and a NEW query sees them " +
    "too; the refresh-once / stream-all-day contract's one " +
    "undocumented corner, pinned") {
    import graft.operators.{ChunkDedup, Dedup, Ingest, TextAnalysis}
    import spark.implicits._
    val batchDocs = graft.Tables.load(spark, sfDir, "documents")
    val corpus = batchDocs.filter(col("doc_id") < 250)
    val incoming = batchDocs.filter(col("doc_id") >= 250)
    val list = ChunkDedup
      .boilerplateChunks(corpus, "doc_id", "text", 4, 3)
      .collect().map(_.getString(0)).toSeq
    Ingest.writeCorpusIndex(corpus, "doc_id", "text", 4, list,
      "graft_vis_ndidx", buckets = 4)
    try {
      // donor text: an incoming doc the day-0 index does NOT flag — so
      // a later hit on it can only come from the mid-stream append
      val flaggedByCorpus = Dedup.minhashNearDupsAgainstIndex(
          ChunkDedup.applyBoilerplate(incoming, "doc_id", "text", 4, list)
            .select(col("doc_id"), col("text_clean")),
          "graft_vis_ndidx", "doc_id", "text_clean", 0.6)
        .select("id_new").distinct().collect().map(_.getLong(0)).toSet
      val donorText = incoming
        .filter(!col("doc_id").isin(flaggedByCorpus.toSeq: _*))
        .orderBy("doc_id").limit(1).select("text")
        .collect()(0).getString(0)
      val corpusText = corpus.orderBy("doc_id").limit(1).select("text")
        .collect()(0).getString(0)
      val inDir = Files.createTempDirectory("graft-vis-in").toString
      def push(id: Long, text: String): Unit =
        Seq((id, text)).toDF("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(inDir)
      def flaggedFrom(src: org.apache.spark.sql.DataFrame) = {
        val cleaned = ChunkDedup
          .applyBoilerplate(src, "doc_id", "text", 4, list)
          .select(col("doc_id").as("id_new"), col("text_clean"))
        cleaned
          .withColumn("set_n", graft.functions.SketchFunctions
            .shingleHashSet(col("text_clean"), 3))
          .withColumn("sig", graft.functions.SketchFunctions
            .minhashSignature(col("text_clean"), 3, 32))
          .filter(col("sig").isNotNull)
          .select(col("id_new"), col("set_n"),
            posexplode(array(Dedup.bandHashExprs(col("sig"), 32, 8): _*))
              .as(Seq("band", "bhash")))
          .join(spark.table("graft_vis_ndidx_bands"), Seq("band", "bhash"))
          .join(spark.table("graft_vis_ndidx_sets"), Seq("id_old"))
          .filter(Dedup.setJaccard(col("set_n"), col("set_o")) >= 0.6)
          .select("id_new").dropDuplicates("id_new")
      }
      // batch 1: one known corpus near-dup (stream sanity) + one clean
      push(910000L, corpusText)
      push(910001L, donorText)
      val docSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val q = flaggedFrom(
          spark.readStream.schema(docSchema).parquet(inDir))
        .writeStream.format("memory").queryName("vis_nd_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val after1 = spark.table("vis_nd_stream")
          .collect().map(_.getLong(0)).toSet
        assert(after1.contains(910000L), "stream sanity: the known " +
          "corpus near-dup was not flagged")
        assert(!after1.contains(910001L), "donor text unexpectedly " +
          "flagged by the day-0 index")
        // mid-stream close-of-day append: the donor text enters the
        // index under a NEW id
        Ingest.appendAcceptedToCorpusIndex(
          Seq((920000L, donorText)).toDF("doc_id", "text"),
          "doc_id", "text", 4, list, "graft_vis_ndidx")
        // batch 2: the same donor text again — a hit requires batch 2
        // to see the appended rows
        push(910002L, donorText)
        q.processAllAvailable()
        val after2 = spark.table("vis_nd_stream")
          .collect().map(_.getLong(0)).toSet
        assert(after2.contains(910002L),
          "OBSERVED SEMANTICS CHANGED: a mid-stream append stopped " +
            "being visible to the running query (static-side file " +
            "listing no longer per-micro-batch?) — update the Ingest " +
            "scaladoc and this pin together")
      } finally {
        q.stop()
      }
      // a NEW query (fresh spark.table plans, same tables, same input
      // dir) sees the grown index: tomorrow's stream flags what
      // today's append added
      val rerun = StreamOps.runToMemory(spark,
          flaggedFrom(
            spark.readStream.schema(docSchema).parquet(inDir)),
          "vis_nd_restart")
        .collect().map(_.getLong(0)).toSet
      assert(rerun.contains(910002L), "a fresh query still missed the " +
        "appended rows — the append itself is broken, not just unseen")
      // 910001 carries the donor text too, so against the GROWN index
      // the fresh query flags it as well — three hits, not one
      assert(rerun.contains(910000L) && rerun.contains(910001L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_vis_ndidx_bands")
      spark.sql("DROP TABLE IF EXISTS graft_vis_ndidx_sets")
    }
  }

  test("sliding windows produce overlapping coverage") {
    val got = StreamOps.runToMemory(spark,
      StreamOps.slidingRate(streamEvents), "sliding", "complete")
    // 1h window / 15m slide -> each event lands in 4 windows
    val total = got.agg(sum("n")).collect()(0).getLong(0)
    assert(total == batchEvents.count() * 4)
  }

  test("session windows close after the gap") {
    val got = StreamOps.runToMemory(spark,
      StreamOps.sessionWindows(streamEvents, "30 minutes"), "sessions", "complete")
    assert(got.count() > 0)
    // session count matches the batch gaps-and-islands operator
    val batchSessions = graft.operators.Sessionize
      .sessions(batchEvents, 1800L).count()
    assert(got.count() == batchSessions)
  }

  test("stream-stream interval join equals the batch interval join") {
    val got = StreamOps.runToMemory(spark,
      StreamOps.purchaseClickJoin(streamEvents, "10 minutes"), "ssjoin")
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = StreamOps.purchaseClickJoin(batchEvents, "10 minutes")
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("stateful sessionization (flatMapGroupsWithState) emits closed " +
    "sessions matching the batch operator row-for-row (µs precision)") {
    // run on the batch frame through the streaming state machine
    val out = StreamOps.statefulSessions(spark, batchEvents, 1800L)
      .collect()
      .map(s => (s.user_id, s.session_start_us, s.session_end_us,
        s.n_events, s.sum_value)).toSet
    val batch = graft.operators.Sessionize.sessions(batchEvents, 1800L)
    // closed sessions = all but the last (max session_seq) per user; the
    // session BOUNDS must agree to the microsecond with the batch twin
    // (unix_micros), not just the counts — guards the getTime*1000
    // ms-quantization regression.
    val lastSeq = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
    val want = batch
      .withColumn("max_seq", max("session_seq").over(lastSeq))
      .filter(col("session_seq") < col("max_seq"))
      .select("user_id", "session_start_us", "session_end_us",
        "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(want.nonEmpty)
    assert(out == want)
  }

  test("streaming-vs-batch parity: stateful sessionize through the REAL " +
    "streaming engine (watermark-fired timeouts included) equals the " +
    "batch operator's COMPLETE output — every session of every user") {
    // The batch-mode test above can only check closed sessions (batch
    // runs never fire timeouts, so each user's final session stays
    // open). Here the events run through the streaming engine and two
    // far-future sentinel events advance the watermark so EVERY real
    // session is timeout-closed and emitted: sentinel-1's batch fires
    // timeouts below (maxRealTs - 1s); sentinel-2's batch fires the
    // rest (watermark then sits past sentinel-1, far beyond every real
    // lastUs + gap). Data batches fire pending timeouts just like
    // no-data batches, so processAllAvailable after each file gives a
    // deterministic flush without polling.
    import spark.implicits._
    val dir = Files.createTempDirectory("graftparity").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val maxUs = batchEvents
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    def sentinel(user: Long, us: Long) =
      Seq((-user, user, "ping", 0.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(lit(us)).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    val gapUs = 1800L * 1000000L
    val src = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
      .withWatermark("ts", "1 second")
    val q = StreamOps.statefulSessions(spark, src, 1800L)
      .writeStream.format("memory").queryName("paritysessions")
      .outputMode("append").start()
    q.processAllAvailable() // batch 1: all real events
    sentinel(-99L, maxUs + 10L * gapUs)
      .write.mode("append").parquet(dir)
    q.processAllAvailable() // batch 2: watermark -> maxRealTs - 1s
    sentinel(-98L, maxUs + 20L * gapUs)
      .write.mode("append").parquet(dir)
    q.processAllAvailable() // batch 3: fires every real session's timeout
    q.stop()
    val got = spark.table("paritysessions")
      .filter(col("user_id") >= 0)
      .select("user_id", "session_start_us", "session_end_us",
        "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val want = graft.operators.Sessionize.sessions(batchEvents, 1800L)
      .select("user_id", "session_start_us", "session_end_us",
        "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    // COMPLETE parity: same session set, including each user's last —
    // the check that catches a state-semantics bug (wrong timeout
    // clock, ms-quantized bounds, dropped or double-emitted sessions)
    assert(got == want,
      s"${got.diff(want).take(3)} extra, ${want.diff(got).take(3)} missing")
  }

  test("out-of-order arrival WITHIN the watermark delay: stateful " +
    "sessionize parity holds bit-for-bit under bounded shuffling") {
    // Real streams deliver bounded disorder, not event-time order. Model
    // it: each event's DELIVERY time = ts + deterministic jitter in
    // [0, 10min), micro-batches sliced by delivery — so events cross
    // micro-batch boundaries out of event-time order, late events land
    // in sessions the state already extended past, and some arrive
    // before session predecessors. With watermark delay (30min) > max
    // jitter (10min) no event is ever below the watermark at arrival
    // (ts >= delivery - 10min > maxSeenTs - 30min), so the contract
    // promises EXACT parity with the batch operator.
    import spark.implicits._
    val dir = Files.createTempDirectory("graftooo").toString
    val jitterUs = 600L * 1000000L // 10 min
    val delivered = batchEvents.withColumn("deliver_us",
      unix_micros(col("ts")) +
        pmod(col("event_id") * lit(2654435761L), lit(jitterUs)))
    val (dLo, dHi) = {
      val r = delivered.agg(min("deliver_us"), max("deliver_us"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val nSlices = 6
    val step = (dHi - dLo) / nSlices + 1
    val maxUs = batchEvents
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    def sentinel(user: Long, us: Long) =
      Seq((-user, user, "ping", 0.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(lit(us)).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    val gapUs = 1800L * 1000000L
    val src = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
      .withWatermark("ts", "30 minutes")
    delivered.filter(col("deliver_us") < dLo + step)
      .drop("deliver_us").coalesce(1).write.mode("append").parquet(dir)
    val q = StreamOps.statefulSessions(spark, src, 1800L)
      .writeStream.format("memory").queryName("ooosessions")
      .outputMode("append").start()
    q.processAllAvailable()
    for (i <- 1 until nSlices) {
      delivered.filter(col("deliver_us") >= dLo + i.toLong * step &&
          col("deliver_us") < dLo + (i + 1).toLong * step)
        .drop("deliver_us").coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    }
    sentinel(-99L, maxUs + 10L * gapUs).write.mode("append").parquet(dir)
    q.processAllAvailable()
    sentinel(-98L, maxUs + 20L * gapUs).write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ooosessions")
      .filter(col("user_id") >= 0)
      .select("user_id", "session_start_us", "session_end_us",
        "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val want = graft.operators.Sessionize.sessions(batchEvents, 1800L)
      .select("user_id", "session_start_us", "session_end_us",
        "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"${got.diff(want).take(3)} extra, ${want.diff(got).take(3)} missing")
  }

  test("seeded disorder fuzz: random corpora under random bounded " +
    "jitter are bit-parity with the batch twin across three seeds") {
    // The fixed-jitter parity test exercises ONE disorder pattern; the
    // buffer-until-watermark operator owes exactness for EVERY arrival
    // order within the delay. Three seeded random corpora (8 users,
    // random 1s..20min inter-arrivals against a 10-min gap, so splits,
    // bridges, and singleton sessions all occur; sub-ms micros included)
    // each delivered in a random order bounded by 5-min jitter under a
    // 15-min watermark delay, sliced into 5 micro-batches by delivery.
    import spark.implicits._
    val gapSec = 600L
    val jitterUs = 300L * 1000000L // 5 min < 15-min delay
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new scala.util.Random(seed)
      val t0 = 1700000000000000L
      val evs: Seq[(Long, Long, Long, String, Double)] =
        (1 to 8).flatMap { u =>
          var ts = t0 + rnd.nextInt(600) * 1000000L
          (1 to (5 + rnd.nextInt(20))).map { i =>
            ts += 1000000L + (rnd.nextDouble() * 1200 * 1000000L).toLong
            (u.toLong * 1000 + i, ts + rnd.nextInt(1000), u.toLong,
              "click", rnd.nextInt(10000) / 100.0)
          }
        }
      def toDf(rows: Seq[(Long, Long, Long, String, Double)]) =
        rows.toDF("event_id", "us", "user_id", "event_type", "value")
          .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
            col("user_id"), col("event_type"), col("value"),
            lit("{}").as("props"))
      val delivered = evs.map(e => (e, e._2 + (rnd.nextDouble() * jitterUs).toLong))
        .sortBy { case (e, d) => (d, e._1) }.map(_._1)
      val batches = delivered.grouped(math.max(1, delivered.size / 5)).toSeq
      val dir = Files.createTempDirectory(s"graftfuzz$seed").toString
      val src = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
        .withWatermark("ts", "15 minutes")
      toDf(batches.head).coalesce(1).write.mode("append").parquet(dir)
      val q = StreamOps.statefulSessions(spark, src, gapSec)
        .writeStream.format("memory").queryName(s"fuzzsessions$seed")
        .outputMode("append").start()
      q.processAllAvailable()
      for (b <- batches.tail) {
        toDf(b).coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      val maxUs = evs.map(_._2).max
      for ((sid, k) <- Seq((99L, 10L), (98L, 20L))) {
        toDf(Seq((-sid, maxUs + k * gapSec * 1000000L, -sid, "ping", 0.0)))
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"fuzzsessions$seed")
        .filter(col("user_id") >= 0)
        .select("user_id", "session_start_us", "session_end_us",
          "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val want = graft.operators.Sessionize.sessions(toDf(evs), gapSec)
        .select("user_id", "session_start_us", "session_end_us",
          "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      assert(want.size >= 8, s"seed $seed degenerate corpus")
      assert(got == want, s"seed $seed: ${got.diff(want).take(3)} extra, " +
        s"${want.diff(got).take(3)} missing")
    }
  }

  test("arrival BEYOND the watermark delay: the late event is dropped " +
    "deterministically — output equals the batch twin of the surviving " +
    "events, never a silently-wrong merge") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graftlate").toString
    val t0 = 1700000000000000L // µs
    def ev(id: Long, user: Long, us: Long) =
      Seq((id, user, "click", 1.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(lit(us)).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    val src = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
      .withWatermark("ts", "1 second")
    // batch 1: user 1's SECOND event + a watermark pusher 3h ahead
    ev(2L, 1L, t0 + 600L * 1000000L)
      .union(ev(10L, 2L, t0 + 10800L * 1000000L))
      .coalesce(1).write.mode("append").parquet(dir)
    val q = StreamOps.statefulSessions(spark, src, 1800L)
      .writeStream.format("memory").queryName("latesessions")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2: user 1's FIRST event arrives 3h late — far beyond the 1s
    // delay; the batch twin would merge it into one [t0, t0+10min]
    // session, the stream must DROP it instead
    ev(1L, 1L, t0).coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable()
    // flush every session
    ev(99L, 3L, t0 + 20L * 3600L * 1000000L)
      .coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable()
    ev(98L, 3L, t0 + 40L * 3600L * 1000000L)
      .coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("latesessions")
      .filter(col("user_id") === 1L)
      .select("session_start_us", "session_end_us", "n_events")
      .collect().map(_.toSeq).toSet
    // documented divergence: user 1's session is the surviving event
    // alone — not the merged two-event session the full batch twin
    // computes, and not a corrupted [t0+10min, t0] inversion
    val survivor = t0 + 600L * 1000000L
    assert(got == Set(Seq(survivor, survivor, 1L)),
      s"late event not dropped cleanly: $got")
  }

  test("stream-static join enriches each micro-batch against the dim") {
    val dim = batchEvents.select(col("user_id").as("d_user")).distinct()
      .withColumn("tier",
        when(col("d_user") % 2 === 0, "even").otherwise("odd"))
    val got = StreamOps.runToMemory(spark,
      StreamOps.enrichWithDim(streamEvents, dim, "user_id", "d_user"),
      "enriched")
    assert(got.count() == batchEvents.count()) // left join keeps every event
    assert(got.filter(col("tier").isNull).count() == 0) // dim covers all users
    val wantEven = batchEvents.filter(col("user_id") % 2 === 0).count()
    assert(got.filter(col("tier") === "even").count() == wantEven)
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    // stage the events TWICE (two files, same rows) to simulate an
    // at-least-once source re-delivering every event
    val dir = Files.createTempDirectory("graftdup").toString
    batchEvents.coalesce(1).write.mode("append").parquet(dir)
    batchEvents.coalesce(1).write.mode("append").parquet(dir)
    val dupStream = spark.readStream.schema(StreamOps.eventSchema)
      .parquet(dir)
    val got = StreamOps.runToMemory(spark,
      StreamOps.dedupEvents(dupStream, "4 hours"), "deduped")
    assert(got.count() == batchEvents.count(),
      s"expected ${batchEvents.count()} unique events, got ${got.count()}")
  }

  test("idempotent foreachBatch sink lands every event exactly once") {
    val out = Files.createTempDirectory("graftsink").toString
    val ckpt = Files.createTempDirectory("graftsinkckpt").toString
    val q = StreamOps.toIdempotentParquet(
      streamEvents.select("event_id", "event_type", "value"), out, ckpt)
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(s"$out/batch_*")
    assert(landed.count() == batchEvents.count())
    assert(landed.select("event_id").distinct().count() == batchEvents.count())
  }

  test("idempotent sink resumes from its checkpoint across a restart " +
    "(no reprocessing, no loss)") {
    // run 1: land the first copy of the events, stop the query
    val src = Files.createTempDirectory("graftrestart").toString
    val out = Files.createTempDirectory("graftrestartout").toString
    val ckpt = Files.createTempDirectory("graftrestartckpt").toString
    val firstHalf = batchEvents.filter(col("event_id") % 2 === 0)
    val secondHalf = batchEvents.filter(col("event_id") % 2 === 1)
    firstHalf.coalesce(1).write.mode("append").parquet(src)
    def openStream = spark.readStream.schema(StreamOps.eventSchema)
      .parquet(src).select("event_id", "event_type", "value")
    val q1 = StreamOps.toIdempotentParquet(openStream, out, ckpt)
    q1.processAllAvailable()
    q1.stop()
    // run 2: new files arrive while the query is down; a NEW query on the
    // SAME checkpoint must pick up only the unread files (a restart
    // without the checkpoint would re-read everything under fresh
    // batchIds and duplicate the first half across batch_* dirs)
    secondHalf.coalesce(1).write.mode("append").parquet(src)
    val q2 = StreamOps.toIdempotentParquet(openStream, out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    val landed = spark.read.parquet(s"$out/batch_*")
    assert(landed.count() == batchEvents.count(),
      s"expected ${batchEvents.count()} events exactly once, " +
        s"got ${landed.count()}")
    assert(landed.select("event_id").distinct().count() == batchEvents.count())
  }

  /** Planted near-dup corpus (30 base docs + exact copies + near
    * copies) and the batch twin of the stream's blocking + estimator:
    * pairs sharing >=1 band whose signature-agreement fraction >= 0.5.
    * Shared by the in-order and shuffled-arrival near-dup tests.
    */
  private def nearDupFixture: (org.apache.spark.sql.DataFrame,
      Set[(Long, Long, Double)]) = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 30).select("doc_id", "text")
    val planted = base
      .union(base.filter(col("doc_id") < 5)
        .select((col("doc_id") + 1000).as("doc_id"), col("text")))
      .union(base.filter(col("doc_id") < 5)
        .select((col("doc_id") + 2000).as("doc_id"),
          concat(col("text"), lit(" extra token")).as("text")))
    val sig = planted.select(col("doc_id").as("id"),
        graft.functions.SketchFunctions
          .minhashSignature(col("text"), 3, 32).as("sig"))
      .filter(col("sig").isNotNull)
    val withBands = sig.select(col("id"), col("sig"),
      array(graft.operators.Dedup.bandHashExprs(col("sig"), 32, 8): _*)
        .as("bh")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    val expected = (for {
      (ia, sa, ba) <- withBands
      (ib, sb, bb) <- withBands
      if ia < ib && ba.zip(bb).exists { case (x, y) => x == y }
      est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 32
      if est >= 0.5
    } yield (ia, ib, math.round(est * 10000.0) / 10000.0)).toSet
    (planted, expected)
  }

  test("streaming near-dup candidates equal the batch blocking+estimate " +
    "across micro-batch boundaries") {
    import spark.implicits._
    val (planted, expected) = nearDupFixture
    assert(expected.nonEmpty, "fixture planted no candidate pairs")
    // stream the corpus in two separate files, one micro-batch each, so
    // pairs split across batches must come from the bucket STATE; crawl
    // timestamps ascend with doc_id, well inside the 1-day ttl horizon
    val stamped = planted.withColumn("fetched_at",
      timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val dir = Files.createTempDirectory("graftneardup").toString
    stamped.filter(col("doc_id") < 1500).coalesce(1)
      .write.mode("append").parquet(dir)
    stamped.filter(col("doc_id") >= 1500).coalesce(1)
      .write.mode("append").parquet(dir)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("fetched_at", TimestampType))))
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val got = StreamOps.runToMemory(spark,
      StreamOps.nearDupPairsStream(spark, src, "doc_id", "fetched_at",
        "text", 0.5, ttl = "1 day").toDF(), "neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == expected,
      s"stream-batch mismatch: missing=${expected -- got} extra=${got -- expected}")
    // the near-copy pairs specifically must cross the batch boundary
    assert((0L until 5L).forall(i => got.exists(p => p._1 == i && p._2 == i + 2000)))
  }

  test("streaming near-dup under shuffled arrival: pair set is arrival-" +
    "order-independent while state never evicts inside the horizon") {
    import spark.implicits._
    // Bucket state is append-plus-compare: for any candidate pair, one
    // member arrives second and finds the other in state — so as long
    // as no eviction fires (crawl stamps span ~35 min against a 1-day
    // ttl) the emitted pair SET must equal the batch blocking for EVERY
    // delivery order, not just crawl order. Seeded shuffle, 4 files,
    // one micro-batch each.
    val (planted, expected) = nearDupFixture
    val stamped = planted.withColumn("fetched_at",
      timestamp_seconds(lit(1700000000L) + col("doc_id")))
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(stamped.collect().toSeq)
    val dir = Files.createTempDirectory("graftneardupooo").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("fetched_at", TimestampType)))
    for (chunk <- shuffled.grouped(math.max(1, shuffled.size / 4)))
      spark.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(chunk).asJava), schema)
        .coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val got = StreamOps.runToMemory(spark,
      StreamOps.nearDupPairsStream(spark, src, "doc_id", "fetched_at",
        "text", 0.5, ttl = "1 day").toDF(), "neardupooo")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == expected,
      s"order-dependence: missing=${expected -- got} extra=${got -- expected}")
  }

  test("streaming exact content dedup drops re-crawled identical texts") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"))
    val recrawl = docs.select(col("doc_id") + 5000, col("text"),
      timestamp_seconds(lit(1700000000L) + col("doc_id") + 10))
    val dir = Files.createTempDirectory("graftcontentdedup").toString
    docs.union(recrawl.toDF("doc_id", "text", "ts")).coalesce(1)
      .write.mode("append").parquet(dir)
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("ts", TimestampType))))
      .parquet(dir)
    val got = StreamOps.runToMemory(spark,
      StreamOps.dedupByContent(src, "ts", "text"), "contentdedup")
    assert(got.count() == 50) // each text exactly once
    assert(got.columns.toSeq == Seq("doc_id", "text", "ts")) // digest dropped
  }

  test("event timestamps carry sub-millisecond precision into tsMicros") {
    // the events table is µs-truncated nanos: if every ts were ms-round,
    // the row-for-row test above couldn't catch quantization. Prove the
    // data really exercises the sub-ms path.
    import spark.implicits._
    val subMs = batchEvents.select($"ts").as[java.sql.Timestamp]
      .take(1000).count(t => StreamOps.tsMicros(t) % 1000L != 0L)
    assert(subMs > 0, "test data has no sub-ms timestamps; µs guard is moot")
  }
}
