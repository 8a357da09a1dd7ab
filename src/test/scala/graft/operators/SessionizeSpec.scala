package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val ev = graft.Tables.load(spark, sfDir, "events")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("sessionsChunked equals sessions bit-for-bit on the events table " +
    "across chunk sizes (below, at, and far above the gap)") {
    val plain = rows(Sessionize.sessions(ev, 1800L))
    assert(plain.nonEmpty)
    for (chunk <- Seq(60L, 1800L, 3600L, 86400L)) {
      val chunked = rows(Sessionize.sessionsChunked(ev, 1800L, chunk))
      assert(chunked == plain,
        s"chunk=${chunk}s diverged: ${chunked.diff(plain).take(3)} extra, " +
          s"${plain.diff(chunked).take(3)} missing")
    }
  }

  /** Synthetic adversarial fixture: user 1 is continuously active across
    * MANY chunk boundaries (one session that phase 2 must stitch through
    * a chain of per-chunk fragments); user 2 has two sessions whose
    * split lands inside one chunk (must NOT merge); user 3 has tied
    * timestamps (event_id tiebreak) and a gap of exactly the threshold
    * (strict >: must not split).
    */
  private def synthetic = {
    val hourUs = 3600L * 1000000L
    val u1 = (0 until 50).map(i =>
      (100L + i, i.toLong * 1700L * 1000000L, 1L)) // 1700s < 1800s gap
    val u2 = Seq((200L, 0L, 2L), (201L, 1000L * 1000000L, 2L),
      (202L, 1000L * 1000000L + 1801L * 1000000L, 2L)) // 1801s > gap: split
    val u3 = Seq((300L, hourUs - 1L, 3L), (301L, hourUs - 1L, 3L), // tie
      (302L, hourUs - 1L + 1800L * 1000000L, 3L)) // exactly gap: no split
    (u1 ++ u2 ++ u3).toDF("event_id", "us", "user_id")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), lit("click").as("event_type"),
        (col("event_id") % 10).cast("double").as("value"),
        lit("{}").as("props"))
  }

  test("boundary stitching: a run spanning many chunks is ONE session, " +
    "an intra-chunk split stays split, ties and exact-gap edges match " +
    "the plain operator") {
    val plain = rows(Sessionize.sessions(synthetic, 1800L))
    for (chunk <- Seq(450L, 3600L, 7200L)) {
      val chunked = rows(Sessionize.sessionsChunked(synthetic, 1800L, chunk))
      assert(chunked == plain, s"chunk=${chunk}s diverged")
    }
    // structure checks on the plain result the property above pinned:
    // u1 = one session of 50 events, u2 = two sessions, u3 = one session
    val byUser = Sessionize.sessions(synthetic, 1800L).collect()
      .groupBy(_.getLong(0))
    assert(byUser(1L).length == 1 && byUser(1L).head.getLong(4) == 50L)
    assert(byUser(2L).length == 2)
    assert(byUser(3L).length == 1 && byUser(3L).head.getLong(4) == 3L)
  }

  test("equivalence holds on the bot distribution itself: plain and " +
    "chunked agree on a slice with ~10% of events on one hot user") {
    val skewed = graft.tools.Replicas.skewEvents(ev)
    val plain = rows(Sessionize.sessions(skewed, 1800L))
    val chunked = rows(Sessionize.sessionsChunked(skewed, 1800L, 3600L))
    assert(plain.nonEmpty && chunked == plain)
    // the hot user really is hot (the fixture measures what it claims)
    val hotShare = skewed.filter(col("user_id") === 0L).count().toDouble /
      skewed.count()
    assert(hotShare > 0.05 && hotShare < 0.2, s"hot share $hotShare")
  }

  test("equivalence holds at the sparse-bot corner: a hot user whose " +
    "pings exceed the gap (sessions == events) still matches plain") {
    val bot = graft.tools.Replicas.sparseBotEvents(ev, 1800L)
    val plain = rows(Sessionize.sessions(bot, 1800L))
    val chunked = rows(Sessionize.sessionsChunked(bot, 1800L, 3600L))
    assert(plain.nonEmpty && chunked == plain,
      s"${chunked.diff(plain).take(3)} extra, " +
        s"${plain.diff(chunked).take(3)} missing")
    // the fixture is what it claims: every bot event is its own session
    val botEvents = bot.filter(col("user_id") === -1L).count()
    val botSessions = Sessionize.sessions(bot, 1800L)
      .filter(col("user_id") === -1L).count()
    assert(botEvents > 50 && botSessions == botEvents,
      s"bot: $botEvents events vs $botSessions sessions")
  }

  test("phase-1 fragments actually split the hot user's work: the " +
    "per-chunk window partitions on (user_id, chunk)") {
    val df = Sessionize.sessionsChunked(ev, 1800L, 3600L)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // no window in the plan partitions on user_id ALONE over event rows:
    // the event-level window carries (user_id, __chunk); the session-
    // level window partitions on user_id but consumes session rows
    val eventLevel = windows.filter(
      _.output.exists(_.name == "__lseq"))
    assert(eventLevel.nonEmpty)
    eventLevel.foreach { w =>
      assert(w.partitionSpec.size == 2,
        s"event-level window must partition on (user, chunk): " +
          s"${w.partitionSpec}")
    }
  }
}
