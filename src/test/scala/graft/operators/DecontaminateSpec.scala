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
}
