package graft.operators

import graft.SparkTestBase

class RepetitionSpec extends SparkTestBase {

  import spark.implicits._

  private def sig(rows: Seq[(Long, String)], n: Int = 2) =
    Repetition.signals(rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap

  test("counts, fractions, and keep verdicts on hand-checked documents") {
    val s = sig(Seq(
      1L -> "a a a b", // top a=3/4; bigrams [a a, a a, a b] -> dup 2/3
      2L -> "a b c d", // top 1/4; bigrams all distinct -> dup 0
      3L -> "x"))      // 1 token, no bigrams
    assert(s(1L) == ((4L, 0.75, 2.0 / 3.0, false)))
    assert(s(2L) == ((4L, 0.25, 0.0, true)))
    // a single-token doc is 100% its top token: degenerate, dropped
    assert(s(3L) == ((1L, 1.0, 0.0, false)))
  }

  test("a fully looped document is flagged on both signals") {
    val (n, top, dup, keep) = sig(Seq(7L -> Seq.fill(20)("spam").mkString(" ")))(7L)
    assert(n == 20L && top == 1.0 && dup == 1.0 && !keep)
  }

  test("gram size parameter drives the dup window") {
    // "a b a b a": bigrams [a b, b a, a b, b a] all dup; trigrams
    // [a b a, b a b, a b a] -> dup 2/3
    val d = Seq(1L -> "a b a b a")
    assert(sig(d, n = 2)(1L)._3 == 1.0)
    assert(sig(d, n = 3)(1L)._3 == 2.0 / 3.0)
  }

  test("threshold parameters move the keep boundary") {
    val relaxed = Repetition.signals(
      Seq(1L -> "a a a b").toDF("doc_id", "text"), "doc_id", "text", 2,
      maxTopTokFrac = 0.8, maxDupGramFrac = 0.7)
      .collect().head.getBoolean(4)
    assert(relaxed)
  }

  test("reserved output names and degenerate gram sizes are refused") {
    val df = Seq(1L -> "a").toDF("keep", "text")
    intercept[IllegalArgumentException] {
      Repetition.signals(df, "keep", "text")
    }
    intercept[IllegalArgumentException] {
      Repetition.signals(Seq(1L -> "a").toDF("doc_id", "text"),
        "doc_id", "text", n = 1)
    }
    // internal working names are reserved too
    intercept[IllegalArgumentException] {
      Repetition.signals(Seq(1L -> "a").toDF("sz", "text"), "sz", "text")
    }
  }
}
