package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Intra-document repetition signals — the Gopher-family quality rules
  * (Rae et al. 2021 §A1.1: "fraction of duplicate n-grams" and "top
  * word frequency") that pretraining pipelines run to drop boilerplate
  * and degenerate/looping text before any model-based scoring.
  *
  * Signals are OCCURRENCE fractions, so every emitted double is a single
  * IEEE-754 division of two exact integer counts — bit-identical in any
  * engine, no rounding needed (the Q.scala determinism conventions):
  *  - top_tok_frac: occurrences of the document's most frequent token /
  *    total tokens;
  *  - dup_gram_frac: fraction of word n-gram occurrences whose gram
  *    appears >= 2 times in the document (0.0 when the doc is shorter
  *    than n tokens — nothing repeats in zero grams).
  *
  * Scale shape at 100 TB: ONE pass over the text — unigrams and n-grams
  * are tagged into a single exploded stream map-side (a codegen'd
  * transform+explode, no UDFs), then two hash-aggregates: (id, sz, gram)
  * with map-side partial combine collapsing repeats before the shuffle,
  * then id. Both shuffles are keyed by the document id (plus gram), so
  * they partition evenly at any corpus size; nothing is per-corpus
  * global state.
  */
object Repetition {

  /** Per-document signals + the keep verdict at the given thresholds.
    * Output: (idCol, n_tokens, top_tok_frac, dup_gram_frac, keep).
    */
  def signals(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 2,
      maxTopTokFrac: Double = 0.3, maxDupGramFrac: Double = 0.2): DataFrame = {
    require(n >= 2, "gram size must be >= 2 (unigrams are always measured)")
    // withColumn-free, but the aggregate output names below must not
    // collide with the id column (the Pack/ShuffleOrder reserved-name
    // rule: silent replacement would corrupt caller data). The internal
    // working names (g/sz/gram/c/max_tok/total_n/dup_occ) are reserved
    // too: an id column with one of those names would otherwise fail
    // later with an opaque ambiguous-column analysis error instead of
    // this message.
    Seq("n_tokens", "top_tok_frac", "dup_gram_frac", "keep",
      "g", "sz", "gram", "c", "max_tok", "total_n", "dup_occ").foreach(c =>
      require(idCol != c,
        s"Repetition.signals reserves column name '$c'"))
    val tagged = concat(
      transform(TextAnalysis.tokens(col(textCol)),
        t => struct(lit(1).as("sz"), t.as("gram"))),
      transform(Dedup.shingles(col(textCol), n),
        g => struct(lit(n).as("sz"), g.as("gram"))))
    // fanOut: a thin input arrives as one scan task, which would pin the
    // tagged explode (the corpus × 2 gram stream) to a single core — the
    // Dedup rule; a properly-split big input passes through untouched
    val counts = Dedup.fanOut(docs)
      .select(col(idCol), explode(tagged).as("g"))
      .groupBy(col(idCol), col("g.sz").as("sz"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as("c"))
    val uni = col("sz") === 1
    val gn = col("sz") === n
    val per = counts.groupBy(col(idCol)).agg(
      sum(when(uni, col("c"))).as("n_tokens"),
      max(when(uni, col("c"))).as("max_tok"),
      sum(when(gn, col("c"))).as("total_n"),
      sum(when(gn && col("c") >= 2, col("c"))).as("dup_occ"))
    val topFrac = col("max_tok").cast(DoubleType) / col("n_tokens")
    // short doc (< n tokens) has no grams: dup fraction is 0 by definition
    val dupFrac =
      coalesce(col("dup_occ").cast(DoubleType) / col("total_n"), lit(0.0))
    per.select(
      col(idCol),
      col("n_tokens"),
      topFrac.as("top_tok_frac"),
      dupFrac.as("dup_gram_frac"),
      (topFrac <= maxTopTokFrac && dupFrac <= maxDupGramFrac).as("keep"))
  }
}
