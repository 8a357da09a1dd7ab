package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §7.4): the reference has no
  * streaming at all, so this is pure extension — watermarked tumbling /
  * sliding / session windows over the events schema, plus custom session
  * state via flatMapGroupsWithState. Batch twins live in
  * graft.operators.Sessionize / PipelineOps.x12 so correctness is
  * checkable against the oracle while the streaming path is exercised in
  * StreamingSpec with a memory sink.
  */
object StreamOps {

  /** The events schema as a stream source would see it (ts already a
    * proper timestamp; the parquet nanos quirk is batch-side only).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window counts per event type — the streaming
    * twin of x12_events_hourly. Late data beyond the watermark is
    * dropped; state is bounded by (watermark horizon / slide) windows.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window event rate (1h window, 15m slide). */
  def slidingRate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"), col("n"))

  /** Built-in session windows (gap-based), the declarative path. */
  def sessionWindows(events: DataFrame, gap: String): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Stream-stream interval join: purchases matched to clicks by the same
    * user within ±window. Watermarks on BOTH sides plus the two-sided
    * time bound let the engine expire join state — without them a
    * stream-stream join buffers forever. The batch twin is
    * operators.IntervalJoin / the IntervalJoinRewrite optimizer rule.
    */
  def purchaseClickJoin(events: DataFrame, window: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
        col("c_ts") <= col("p_ts") + expr(s"INTERVAL $window"))
  }

  /** Stream-static join: each micro-batch of the stream is enriched
    * against a static (batch) dimension. No join state is kept — the
    * static side is (re)resolved per micro-batch, so a refreshed dim
    * table is picked up mid-stream; broadcast keeps the streaming side
    * shuffle-free, which is the only sane shape when the stream is the
    * 100 TB/day firehose and the dim is the small side.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Streaming exact dedup keyed on event_id with watermark-bounded
    * state: dropDuplicatesWithinWatermark holds a key only until the
    * event-time watermark passes it, so dedup state is O(keys per
    * watermark horizon), not O(stream history) — the unbounded-state
    * trap plain dropDuplicates falls into on streams.
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Idempotent micro-batch sink: foreachBatch landing every micro-batch
    * in a batchId-addressed directory with overwrite semantics. After a
    * crash the engine restarts from `checkpointDir` and replays the last
    * uncommitted batch with the SAME batchId, so the rewrite hits the
    * same path and the output stays exactly-once at the directory level —
    * the standard pattern when the target is a plain object store with no
    * transactional table format underneath. The durable checkpoint is
    * what makes that hold: without one, foreachBatch gets a temporary
    * checkpoint that dies with the process and a restart re-reads from
    * offset zero with fresh batchIds. Readers consume baseDir/batch_* as
    * one dataset.
    */
  def toIdempotentParquet(stream: DataFrame, baseDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("overwrite").parquet(s"$baseDir/batch_$id")
      }
      .start()

  // ---- custom state: explicit session tracking ----

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Full-microsecond event time. getTime is ms-truncated; the sub-ms
    * part lives in getNanos — dropping it would ms-quantize the *_us
    * session bounds and make gap comparisons diverge from the batch twin
    * (Sessionize uses unix_micros, which keeps the full µs).
    */
  private[streaming] def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  /** sumCents: money doubles are 2-decimal; accumulating raw doubles
    * drifts (0.1-style error) and diverges from the batch twin's exact
    * decimal(18,2) sum. Cents-as-Long is exact and order-independent.
    */
  case class SessionState(startUs: Long, lastUs: Long, n: Long, sumCents: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, sum_value: Double)
  /** One buffered event awaiting finalization (event_id dropped: bounds,
    * count and the exact cents sum are all arrival-order-independent).
    */
  case class PendingEv(us: Long, cents: Long)
  /** Per-user buffer: `partial` is the compacted below-watermark prefix
    * of the OLDEST open session (its events can never be preceded by a
    * new arrival, so only their aggregate matters); `pending` holds the
    * individual events at or above the compaction watermark — the only
    * ones a late arrival could still reorder against.
    */
  case class SessionBuf(partial: Option[SessionState],
      pending: Seq[PendingEv])

  /** Custom sessionization with explicit state + event-time timeout: the
    * imperative escape hatch (flatMapGroupsWithState) for session
    * semantics session_window can't express (e.g. emitting closed
    * sessions exactly once with custom close rules).
    *
    * ARRIVAL CONTRACT: correct under OUT-OF-ORDER arrival up to the
    * input's watermark delay — an event arriving while its timestamp is
    * still >= the current watermark lands in the right session, splits
    * or bridges neighbouring sessions exactly as the batch twin would,
    * and parity with `Sessionize.sessions` holds bit-for-bit
    * (StreamingSpec proves it under bounded shuffling). An event older
    * than the watermark when it arrives is DROPPED, deterministically
    * and by design — the output then equals the batch twin computed on
    * the surviving events, never a silently-wrong merge (StreamingSpec
    * pins that divergence too). Choose the watermark delay to cover the
    * source's real disorder bound; `withWatermark` on the input is
    * required for streaming runs.
    *
    * Mechanics: events buffer in per-user state until the watermark
    * passes their session's close (lastUs + gap) — only then can no
    * allowed arrival extend, bridge, or split the session, so only then
    * is it emitted (exactly once, Append mode). Buffered events below
    * the watermark compact into a per-session aggregate prefix, so state
    * per user is O(events inside the lateness horizon) + one aggregate,
    * NOT the session history: with in-order arrival and a tight delay
    * the buffer stays a handful of rows (the streamscale flow measures
    * this at 1M events). The state carries an event-time timeout at the
    * oldest open session's close so quiet users flush exactly when the
    * watermark says their gap elapsed — the same clock the gap predicate
    * uses. (Batch runs invoke each group exactly once with no watermark:
    * every gap-closed session is emitted, the final still-open session
    * per user stays un-emitted by design — StreamingSpec asserts that.)
    */
  def statefulSessions(spark: SparkSession, events: DataFrame,
      gapSeconds: Long): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def update(user: Long, evs: Iterator[Ev],
        state: GroupState[SessionBuf]): Iterator[SessionOut] = {
      def emit(st: SessionState): SessionOut =
        SessionOut(user, st.startUs, st.lastUs, st.n, st.sumCents / 100.0)
      // None = batch run (no watermark, no timeouts): emit all closed
      // sessions now. Some(wm) = streaming: emit only what the watermark
      // has made immutable.
      val wmUs: Option[Long] =
        try Some(state.getCurrentWatermarkMs() * 1000L)
        catch { case _: UnsupportedOperationException => None }
      val buf = state.getOption.getOrElse(SessionBuf(None, Nil))
      // documented late-drop: below-watermark arrivals can no longer be
      // placed correctly (their session may already be emitted) — drop
      // them HERE, explicitly, so the semantics don't depend on which
      // late rows the engine's own pre-filter happens to catch
      val fresh = evs.map(e => PendingEv(tsMicros(e.ts),
          math.round(e.value * 100.0)))
        .filter(p => wmUs.forall(p.us >= _))
      // rebuild sessions over (compacted prefix + sorted buffer): the
      // compacted prefix is strictly older than every pending event by
      // construction (compaction only folds events below a watermark no
      // later arrival may precede)
      val pend = (buf.pending ++ fresh).sortBy(_.us)
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[(SessionState, Vector[PendingEv])]
      var cur = buf.partial.map(p => (p, Vector.empty[PendingEv]))
      for (e <- pend) {
        cur match {
          case Some((st, es)) if e.us - st.lastUs <= gapUs =>
            cur = Some((SessionState(st.startUs, e.us, st.n + 1,
              st.sumCents + e.cents), es :+ e))
          case Some(closed) =>
            sessions += closed
            cur = Some((SessionState(e.us, e.us, 1, e.cents), Vector(e)))
          case None =>
            cur = Some((SessionState(e.us, e.us, 1, e.cents), Vector(e)))
        }
      }
      cur.foreach(sessions += _)
      wmUs match {
        case None =>
          // batch: emit every closed session, leave the open one; the
          // single invocation means state bookkeeping is moot
          state.remove()
          sessions.dropRight(1).map(s => emit(s._1)).iterator
        case Some(wm) =>
          // final = the watermark passed the close: no allowed arrival
          // (us >= wm) can extend (needs us <= lastUs+gap < wm) or merge
          // it backward (finals form a prefix: an earlier session closes
          // even earlier). Emit exactly those.
          val (fin, open) = sessions.span(_._1.lastUs + gapUs < wm)
          if (open.isEmpty) {
            if (state.exists) state.remove()
          } else {
            // compact the oldest open session's below-watermark events
            // into the aggregate prefix (no later arrival can precede
            // them; arrivals only extend/bridge, never split a session,
            // so the aggregate stays exact)
            val (st0, evs0) = open.head
            val keep0 = evs0.dropWhile(_.us < wm)
            val compacted = evs0.length - keep0.length
            val partial: Option[SessionState] =
              if (compacted == 0) {
                // nothing newly compactable. The old prefix belongs to
                // the FIRST session overall; it survives iff that
                // session is still open (fin empty), else it was just
                // emitted inside fin's head.
                if (fin.isEmpty) buf.partial else None
              } else {
                // new prefix = session aggregate minus the kept suffix
                // (st0 already folds the old prefix in when this is the
                // first session, so subtraction is correct either way)
                val kept = keep0.foldLeft((0L, 0L)) { case ((n, c), e) =>
                  (n + 1, c + e.cents) }
                Some(SessionState(st0.startUs,
                  if (keep0.isEmpty) st0.lastUs else evs0(compacted - 1).us,
                  st0.n - kept._1, st0.sumCents - kept._2))
              }
            val pendingOut = keep0 ++ open.tail.flatMap(_._2)
            state.update(SessionBuf(partial, pendingOut))
            // wake when the watermark passes the oldest open session's
            // close; clamp above the current watermark (Spark rejects a
            // timeout at or below it)
            val base = open.head._1.lastUs / 1000L + gapSeconds * 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs() + 1L, base))
          }
          fin.map(s => emit(s._1)).iterator
      }
    }

    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  // ---- streaming near-dup dedup (dedup at ingest) ----

  case class BandedDoc(bkey: String, id: Long, sig: Seq[Long],
      ts: java.sql.Timestamp)
  case class BucketMembers(ms: List[(Long, Seq[Long])], lastUs: Long)
  case class NearDupPair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Streaming MinHash near-dup candidates — the ingest-time half of
    * corpus dedup: each arriving document is banded exactly like the
    * batch pipeline (Dedup.bandHashExprs — same blocking by
    * construction), state lives per LSH bucket, and a document arriving
    * into a bucket is compared against the bucket's remembered
    * signatures. Emitted pairs carry the MinHash Jaccard ESTIMATE
    * (fraction of agreeing signature components — the statistic the
    * sketch exists to provide); exact verification joins text back
    * downstream exactly as in batch (minhashNearDups), typically in the
    * foreachBatch landing step. The same pair can surface from several
    * bands — consumers dedupe with dropDuplicates/distinct downstream.
    *
    * State per bucket is a newest-first list capped at `maxPerBucket`
    * (a hot bucket — e.g. a template page crawled forever — degrades to
    * missing OLD partners, never to unbounded state) and evicted whole
    * once the EVENT-TIME watermark passes `ttl` beyond the bucket's last
    * arrival (`tsCol` = the crawl/fetch timestamp). Event time, not
    * processing time, for two reasons: eviction is deterministic under
    * replay (the exactly-once story), and a processing-time timeout
    * makes the engine schedule timeout-check micro-batches forever even
    * with no data — a busy idle loop. Docs later than the watermark
    * horizon are dropped by the watermark itself, the standard
    * late-data contract. State is O(active buckets x maxPerBucket).
    */
  def nearDupPairsStream(spark: SparkSession, docs: DataFrame,
      idCol: String, tsCol: String, textCol: String, threshold: Double,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxPerBucket: Int = 128,
      ttl: String = "2 hours"): Dataset[NearDupPair] = {
    import spark.implicits._
    require(bands * (numHashes / bands) == numHashes,
      "bands must divide numHashes") // same guard as minhashCandidates:
    // a non-dividing split would silently drop tail signature slots from
    // every band and diverge from the batch blocking
    val TtlRe = """(\d+)\s+(second|minute|hour|day)s?""".r
    val ttlUs = ttl.trim.toLowerCase match {
      case TtlRe(n, unit) => n.toLong * (unit match {
        case "second" => 1000000L
        case "minute" => 60000000L
        case "hour"   => 3600000000L
        case "day"    => 86400000000L
      })
      case _ => throw new IllegalArgumentException(
        s"ttl must be '<n> seconds|minutes|hours|days', got: $ttl")
    }
    val sig = docs.select(col(idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("ts"),
        graft.functions.SketchFunctions
          .minhashSignature(col(textCol), shingleK, numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .withWatermark("ts", ttl)
    val bandStructs = graft.operators.Dedup
      .bandHashExprs(col("sig"), numHashes, bands).zipWithIndex
      .map { case (h, b) => struct(lit(b).as("band"), h.as("bhash")) }
    val banded = sig
      .select(col("id"), col("ts"), col("sig"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(concat_ws(":", col("bk.band"), col("bk.bhash")).as("bkey"),
        col("id"), col("sig"), col("ts"))
      .as[BandedDoc]

    def update(key: String, rows: Iterator[BandedDoc],
        state: GroupState[BucketMembers]): Iterator[NearDupPair] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var members = state.getOption.map(_.ms).getOrElse(Nil)
      var lastUs = state.getOption.map(_.lastUs).getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer[NearDupPair]()
      // in-batch order by id so a batch containing both halves of a pair
      // emits it deterministically (smaller id is "already seen")
      rows.toSeq.sortBy(_.id).foreach { d =>
        // EVERY arrival extends the bucket's ttl — a re-crawled known doc
        // keeps its bucket alive (the documented last-arrival contract),
        // it just adds no new member and emits no pairs
        lastUs = math.max(lastUs, tsMicros(d.ts))
        if (!members.exists(_._1 == d.id)) {
          members.foreach { case (mid, msig) =>
            val eq = msig.iterator.zip(d.sig.iterator)
              .count { case (x, y) => x == y }
            val est = eq.toDouble / d.sig.length
            if (est >= threshold)
              out += NearDupPair(math.min(mid, d.id), math.max(mid, d.id),
                math.round(est * 10000.0) / 10000.0)
          }
          members = (d.id, d.sig) :: members
          if (members.length > maxPerBucket)
            members = members.take(maxPerBucket)
        }
      }
      state.update(BucketMembers(members, lastUs))
      // evict when the watermark passes lastSeen + ttl (clamped forward —
      // a late-but-allowed arrival can put the target behind the current
      // watermark, which Spark rejects). getCurrentWatermarkMs throws in
      // batch execution, where timeouts never fire anyway.
      val base = lastUs / 1000L + ttlUs / 1000L
      try state.setTimeoutTimestamp(
        math.max(state.getCurrentWatermarkMs() + 1L, base))
      catch { case _: UnsupportedOperationException => }
      out.iterator
    }

    banded
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming exact content dedup: first-seen wins on the text digest,
    * state bounded by the event-time watermark — the streaming twin of
    * x01/x30's digest strategy (never keys state on raw text).
    */
  def dedupByContent(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Run any of the above against a batch DataFrame through the real
    * streaming engine: parquet-backed file stream -> memory sink, drained
    * synchronously. Used by StreamingSpec.
    */
  def runToMemory(spark: SparkSession, streamDf: DataFrame,
      name: String, mode: String = "append"): DataFrame = {
    val q = streamDf.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
