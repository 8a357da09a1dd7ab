package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkTestBase {

  import spark.implicits._

  private def df(rows: (Long, String)*) =
    rows.toDF("id", "text")

  test("flags exactly the training docs sharing a word n-gram with eval, " +
    "with distinct-gram hit counts") {
    val eval = df(1L -> "the quick brown fox jumps over the lazy dog")
    val train = df(
      // shares "quick brown fox jumps" (one 4-gram, shifted context)
      10L -> "a quick brown fox jumps happily today somewhere",
      // verbatim copy: shares every eval 4-gram (6 of them)
      11L -> "the quick brown fox jumps over the lazy dog",
      // same words, different order: no shared 4-gram
      12L -> "dog lazy the over jumps fox brown quick the",
      13L -> "completely unrelated text with different words entirely")
    val hits = Decontaminate.overlapHits(train, eval, "id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(10L -> 1L, 11L -> 6L))
  }

  test("clean() returns exactly the unflagged training docs") {
    val eval = df(1L -> "alpha beta gamma delta")
    val train = df(
      10L -> "x alpha beta gamma delta y",
      11L -> "nothing in common here at all")
    val kept = Decontaminate.clean(train, eval, "id", "text", 4)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(11L))
  }

  test("docs shorter than n tokens produce no grams and are never flagged") {
    val eval = df(1L -> "tiny doc")
    val train = df(10L -> "tiny doc", 11L -> "tiny")
    // n=4 > both docs' lengths: nothing to match on either side
    assert(Decontaminate.overlapHits(train, eval, "id", "text", 4)
      .count() == 0)
    // at n=2 the equal doc is flagged ("tiny doc" = one shared bigram)
    val h2 = Decontaminate.overlapHits(train, eval, "id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h2 == Map(10L -> 1L))
  }

  test("repeated grams inside one doc count once (distinct semantics)") {
    val eval = df(1L -> "a b a b a b")
    val train = df(10L -> "a b a b a b a b")
    // train's 2-grams = {"a b", "b a"}, both present in eval -> 2 hits
    val hits = Decontaminate.overlapHits(train, eval, "id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(10L -> 2L))
  }

  test("overlapStats reports gram count, hit count, and fraction for " +
    "EVERY doc that produced grams — not just the hit ones") {
    val eval = df(1L -> "alpha beta gamma delta")
    val train = df(
      10L -> "x alpha beta gamma delta y", // 3 distinct 4-grams, 1 hit
      11L -> "nothing in common here at all") // 3 grams, 0 hits
    val stats = Decontaminate.overlapStats(train, eval, "id", "text", 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(stats == Map(
      10L -> ((3L, 1L, 1.0 / 3)),
      11L -> ((3L, 0L, 0.0))))
  }

  test("fraction thresholding: tau keeps lightly-contaminated docs, " +
    "removes heavy ones; tau=0.0 equals the strict any-hit rule") {
    val eval = df(1L -> "a b c d")
    val train = df(
      10L -> "a b c d", // 1 gram, 1 hit -> frac 1.0
      11L -> "a b c d e f g h i j k", // 8 grams, 1 hit -> frac 0.125
      12L -> "totally unrelated words live in this document")
    def kept(d: org.apache.spark.sql.DataFrame) =
      d.select("id").as[Long].collect().toSet
    assert(kept(Decontaminate.clean(train, eval, "id", "text", 4, 0.5))
      == Set(11L, 12L))
    assert(kept(Decontaminate.clean(train, eval, "id", "text", 4, 0.0))
      == Set(12L))
    assert(kept(Decontaminate.clean(train, eval, "id", "text", 4, 0.0))
      == kept(Decontaminate.clean(train, eval, "id", "text", 4)))
  }
}
