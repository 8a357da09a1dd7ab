package graft.operators

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("wordFreqs is the weighted vocabulary") {
    val f = Bpe.wordFreqs(docs("low low lower", "low newest"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("low" -> 3L, "lower" -> 1L, "newest" -> 1L))
  }

  test("pair counts are frequency-weighted with multiplicity") {
    // vocabulary {aaa: 2, ab: 1}: (a,a) appears twice per "aaa" -> 4
    val pc = Bpe.pairCounts(Bpe.initSymbols(
      Bpe.wordFreqs(docs("aaa aaa ab"), "text")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(pc == Map(("a", "a") -> 4L, ("a", "b") -> 1L))
  }

  test("single-character words contribute no pairs") {
    assert(Bpe.pairCounts(Bpe.initSymbols(
      Bpe.wordFreqs(docs("x y z"), "text"))).count() == 0)
  }

  test("mergeOnce merges left-to-right over non-overlapping occurrences") {
    val merged = Bpe.mergeOnce(
      Bpe.initSymbols(Bpe.wordFreqs(docs("aaa"), "text")), "a", "a")
      .select("syms").as[Seq[String]].collect().head
    assert(merged == Seq("aa", "a"))
  }

  test("training replays the classic Sennrich example") {
    // newest x3, widest x1: first merges are (e,s) -> (es,t) -> the
    // suffix "est" shared by both words
    val corpus = docs(Seq.fill(3)("newest").mkString(" ") + " widest")
    val (merges, sym) = Bpe.train(corpus, "text", 3)
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")))
    val symsOf = sym.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(symsOf("newest").contains("est"))
    assert(symsOf("widest").contains("est"))
  }

  test("training stops early when every word is one symbol") {
    val (merges, _) = Bpe.train(docs("ab ab"), "text", 10)
    assert(merges == Seq(("a", "b")))
  }
}
