package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("with unit weights the score counts features: 2n-1 for n >= 2 " +
    "tokens, 1 for a single token (the sequence(1,0) guard)") {
    val docs = Seq((1L, "a b c d"), (2L, "solo"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = Classifier
      .ngramScore(docs, "doc_id", "text", Seq.fill(16)(1.0), bias = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 7.0) // 4 unigrams + 3 bigrams
    assert(out(2L) == 1.0) // 1 unigram, NO phantom bigrams
    assert(out(3L) == 3.0)
  }

  test("score replays independently: Scala-side md5 bucketing over " +
    "unigrams+bigrams reproduces the engine's margin exactly") {
    val w = (0 until 64).map(j => (j * 37 % 100) / 100.0 - 0.4)
    def bucket(g: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % 64).toInt
    }
    def expected(text: String): Double = {
      val t = text.split(" ", -1)
      val feats = t.toSeq ++ t.sliding(2).filter(_.length == 2)
        .map(_.mkString(" "))
      // fold bias-first like the engine's aggregate — the sum
      // association must match or doubles drift in the last ulp
      feats.foldLeft(0.25)((acc, g) => acc + w(bucket(g)))
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 20).select("doc_id", "text")
    val got = Classifier.ngramScore(docs, "doc_id", "text", w, 0.25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    docs.collect().foreach { r =>
      val e = expected(r.getString(1))
      assert(got(r.getLong(0)) == e,
        s"doc ${r.getLong(0)}: engine ${got(r.getLong(0))} != replay $e")
    }
  }

  test("native one-pass margin is bit-identical to the HOF fold on " +
    "the whole corpus, both hash families (the graded x74 oracle is " +
    "family- and path-invariant)") {
    val w = (0 until 256).map(j => (j * 2654435761L % 1000L) / 1000.0 - 0.5)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    for (fast <- Seq(false, true)) {
      val native = Classifier
        .ngramScore(docs, "doc_id", "text", w, -0.1, fastHash = fast)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val hof = Classifier
        .ngramScore(docs, "doc_id", "text", w, -0.1, fastHash = fast,
          native = false)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(native.keySet == hof.keySet)
      native.foreach { case (id, s) =>
        assert(s == hof(id),
          s"doc $id (fastHash=$fast): native $s != hof ${hof(id)}")
      }
    }
    // edge shapes the corpus may not carry: empty text (split's one
    // empty token), adjacent separators (empty middle tokens),
    // trailing separator (split keeps the trailing empty), non-ASCII
    val edges = Seq((1L, ""), (2L, "a  b"), (3L, "a b "), (4L, " "),
      (5L, "héllo wörld héllo"), (6L, "日本 語 テスト"))
      .toDF("doc_id", "text")
    for (fast <- Seq(false, true)) {
      val native = Classifier
        .ngramScore(edges, "doc_id", "text", w, -0.1, fastHash = fast)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val hof = Classifier
        .ngramScore(edges, "doc_id", "text", w, -0.1, fastHash = fast,
          native = false)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      native.foreach { case (id, s) =>
        assert(s == hof(id),
          s"edge doc $id (fastHash=$fast): native $s != hof ${hof(id)}")
      }
    }
  }

  test("keep is margin > 0; null text scores null and keep null " +
    "(nulls surface, they don't gate); reserved names refuse") {
    val docs = Seq((1L, Some("a b")), (2L, None))
      .toDF("doc_id", "text")
    val out = Classifier
      .ngramScore(docs, "doc_id", "text", Seq.fill(8)(0.5), -1.0)
      .collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(1) == 0.5 && byId(1L).getBoolean(2))
    assert(byId(2L).isNullAt(1) && byId(2L).isNullAt(2))
    val e = intercept[IllegalArgumentException] {
      Classifier.ngramScore(
        docs.withColumnRenamed("text", "score"), "doc_id", "score",
        Seq(1.0), 0.0)
    }
    assert(e.getMessage.contains("reserves"))
    intercept[IllegalArgumentException] {
      Classifier.ngramScore(docs, "doc_id", "text", Seq.empty, 0.0)
    }
  }
}
