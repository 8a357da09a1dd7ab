package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token counts and avg length") {
    val df = Seq("the quick brown fox", "a a a").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.distinctTokenCount(col("text")),
      TextAnalysis.avgTokenLen(col("text"))).collect()
    assert(r(0).getInt(0) == 4 && r(0).getInt(1) == 4)
    assert(math.abs(r(0).getDouble(2) - 16.0 / 4) < 1e-12)
    assert(r(1).getInt(0) == 3 && r(1).getInt(1) == 1)
  }

  test("wordRatio counts stopword fraction") {
    val df = Seq("the cat and the hat").toDF("text")
    val r = df.select(TextAnalysis.wordRatio(col("text"),
      Seq("the", "and"))).collect()(0).getDouble(0)
    assert(math.abs(r - 3.0 / 5) < 1e-12)
  }

  test("fingerprint is invariant under token reordering and duplication") {
    val df = Seq(("b a c", "c b a a"), ("x y", "x z")).toDF("t1", "t2")
    val r = df.select(
      TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2")))
      .collect()
    assert(r(0).getBoolean(0))  // same token set
    assert(!r(1).getBoolean(0)) // different token set
  }

  test("rollingHash is order sensitive, fingerprint is not") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val r = df.select(
      TextAnalysis.rollingHash(col("t1")) === TextAnalysis.rollingHash(col("t2")),
      TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2")))
      .collect()(0)
    assert(!r.getBoolean(0))
    assert(r.getBoolean(1))
  }

  test("langIdGuess picks the language with the densest markers") {
    val df = Seq(
      "the cat of the house and a dog",
      "el perro de la casa que los gatos",
      "der hund und die katze das ist",
      "blorp zxcv qwerty").toDF("text")
    val langs = df.select(TextAnalysis.langIdGuess(col("text"))).collect()
      .map(_.getString(0))
    assert(langs(0) == "en" && langs(1) == "es" && langs(2) == "de"
      && langs(3) == "und")
  }

  test("qualityScore is in [0,1] and penalizes degenerate repetition") {
    val df = Seq(
      ("good", "the quick brown fox jumps over a lazy dog and then the " +
        "fox runs away to the forest with a bone of the hound"),
      ("bad", "spam spam spam spam spam")).toDF("k", "text")
    val r = df.select(col("k"), TextAnalysis.qualityScore(col("text"),
      TextAnalysis.langMarkers("en"))).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.values.forall(v => v >= 0 && v <= 1))
    assert(r("good") > r("bad"))
  }

  test("normalize collapses noise; scrub masks emails and urls") {
    val df = Seq(
      ("  Hello,   WORLD!! 42 ", "mail me at a.b+c@ex-ample.org now"),
      ("clean text", "see https://example.com/x?q=1 and http://a.b ok"))
      .toDF("t1", "t2")
    val r = df.select(TextAnalysis.normalize(col("t1")),
      TextAnalysis.scrub(col("t2"))).collect()
    assert(r(0).getString(0) == "hello world 42")
    assert(r(0).getString(1) == "mail me at <EMAIL> now")
    assert(r(1).getString(0) == "clean text")
    assert(r(1).getString(1) == "see <URL> and <URL> ok")
  }

  test("sentimentScore is signed, bounded, and zero on no-signal text") {
    val pos = Seq("fast", "big")
    val neg = Seq("slow", "small")
    val df = Seq(
      ("up", "fast fast big join"),
      ("down", "slow small slow merge"),
      ("flat", "fast slow join merge"),
      ("none", "join merge scan sort")).toDF("k", "text")
    val r = df.select(col("k"),
        TextAnalysis.sentimentScore(col("text"), pos, neg).as("s"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("up") == 0.75 && r("down") == -0.75)
    assert(r("flat") == 0.0 && r("none") == 0.0)
    assert(r.values.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("features frame has one row per doc and no nulls") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    val f = TextAnalysis.features(docs, TextAnalysis.langMarkers("en"))
    assert(f.count() == 100)
    assert(f.na.drop().count() == 100)
  }

  test("slidingChunks: starts stride apart, every token covered, " +
    "trailing windows short, stride==size degenerates to the " +
    "non-overlapping split") {
    import spark.implicits._
    val doc = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text") // 8 toks
    val out = TextAnalysis.slidingChunks(doc, "doc_id", "text", 5, 3)
      .orderBy("chunk_idx").collect()
    // starts 0, 3, 6 (floor(7/3) = 2 -> 3 windows)
    assert(out.map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
      r.getString(4))).toSeq == Seq(
      (0, 0L, 5L, "a b c d e"),
      (1, 3L, 5L, "d e f g h"),
      (2, 6L, 2L, "g h")))
    // stride == size: exactly ChunkDedup.chunks' non-overlapping split
    val nonOv = TextAnalysis.slidingChunks(doc, "doc_id", "text", 3, 3)
      .orderBy("chunk_idx").collect().map(_.getString(4)).toSeq
    assert(nonOv == Seq("a b c", "d e f", "g h"))
    // every token position is covered by at least one window
    val covered = out.flatMap(r =>
      r.getLong(2) until (r.getLong(2) + r.getLong(3))).toSet
    assert(covered == (0L until 8L).toSet)
  }

  test("slidingChunks: null doc emits no rows, empty string is one " +
    "single-token window, reserved names refuse") {
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.slidingChunks(docs, "doc_id", "text", 4, 2)
      .collect()
    assert(out.forall(_.getLong(0) == 2L) && out.length == 1)
    assert(out(0).getLong(3) == 1L && out(0).getString(4) == "")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.slidingChunks(
        docs.withColumnRenamed("text", "chunk"), "doc_id", "chunk", 4, 2)
    }
    assert(e.getMessage.contains("reserves"))
    intercept[IllegalArgumentException] {
      TextAnalysis.slidingChunks(docs, "doc_id", "text", 4, 0)
    }
  }

  test("slidingWindows on an EMPTY token array yields zero windows, " +
    "not the sequence(0,-1) phantom pair") {
    import spark.implicits._
    // unreachable via tokens() (split never returns []) but any other
    // tokenizer can produce it — e.g. filtering empties out
    val df = Seq(Tuple1(Seq.empty[String]), Tuple1(Seq("a", "b")))
      .toDF("toks")
    val out = df.select(
      size(TextAnalysis.slidingWindows(col("toks"), 4, 2)).as("n"))
      .collect().map(_.getInt(0)).sorted
    assert(out.toSeq == Seq(0, 1))
  }
}
