package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** BPE tokenizer training primitives (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"): count
  * adjacent symbol pairs over the frequency-weighted vocabulary, merge
  * the most frequent pair(s), repeat. x25 APPLIES a vocabulary; this is
  * the missing other half — training one.
  *
  * Scale shape at 100 TB: the only corpus-sized work is `wordFreqs` —
  * one explode + one hash-aggregate with map-side partial combine (the
  * canonical wordcount). Everything after runs on the DISTINCT
  * vocabulary weighted by frequency: 10^6-10^8 rows however big the
  * corpus is — which is precisely why BPE training is tractable on
  * web-scale text. Pair selection is top-k (TakeOrderedAndProject),
  * never a global sort; the merge loop is a driver iteration over a
  * vocabulary-sized frame with ONE action per round, and `batch`
  * amortizes that round cost over up to `batch` merges (a real
  * 30k-50k-merge vocabulary at batch=256 is ~150 rounds, not 30k+
  * sequential driver round-trips).
  */
object Bpe {

  /** Symbol-sequence separator for the string-encoded merge step. NOT
    * unreachable by construction — TextAnalysis.tokens splits on ' '
    * only, so a document containing U+0001 would yield tokens containing
    * it and mergeOnce's join/split round-trip would silently shred those
    * tokens apart. wordFreqs therefore EXCLUDES such tokens (below).
    */
  private[operators] val SEP = "\u0001"

  /** (w, freq): corpus word frequencies — the one corpus-sized pass.
    * fanOut first: a thin input arrives as one scan task (the Dedup
    * rule; a properly-split big input passes through untouched).
    * Tokens containing the SEP codepoint are excluded: they cannot
    * round-trip the string-encoded merge representation, and a corpus
    * with control characters in its tokens should be scrubbed upstream
    * (TextAnalysis) rather than silently corrupted here.
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    Dedup.fanOut(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(!col("w").contains(SEP))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Words as symbol sequences, initial state: one symbol per character
    * (code point). One-pass native (CharSplit): the previous per-index
    * `substr` enumeration scanned from the string head per character —
    * O(len²) code-point steps per word, harmless at the ≤21-char words
    * this corpus measures but ruinous on a degenerate 10⁴-char "word"
    * (URL, DNA string, no-space CJK run): 10⁸ scans in one row.
    * (Not split(w, "") either — the regex split keeps a trailing empty
    * match, injecting a phantom "" symbol into every word.) The empty
    * word stays an empty array; a null word (can't arise from
    * wordFreqs) keeps the old formula's null -> empty behavior.
    */
  def initSymbols(words: DataFrame): DataFrame =
    words.withColumn("syms",
      coalesce(graft.functions.BpeFunctions.charSplit(col("w")),
        array().cast(ArrayType(StringType))))

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
    * Implemented as join/replace/split on a SEP-separated string
    * (wordFreqs guarantees no symbol contains SEP), so the whole step
    * stays a codegen'd per-row expression.
    *
    * Since round 11 the training loop applies whole batches via the
    * one-pass BatchMergePairs native; mergeOnce remains the
    * independently-derived SEMANTIC REFERENCE the batched path is
    * parity-pinned against (BpeSpec's replay and fuzz tests) — a regex
    * formulation and a scan formulation agreeing on random inputs is
    * the strongest cheap evidence both encode standard BPE.
    *
    * The pattern is anchored to symbol boundaries on BOTH sides: an
    * unanchored literal would also match where `a` is a suffix of the
    * previous symbol or `b` is a prefix of the next (merge (h,e) on
    * [th, e] would weld "the"; merge (a,b) on [a, bc] would weld
    * "abc"), silently diverging from standard BPE from iteration 2
    * onward. The left anchor is a consuming group re-emitted via $1
    * (Java lookbehind over boundary alternations is fragile); consuming
    * it cannot mask a back-to-back occurrence because the right anchor
    * is a zero-width lookahead, so the separator between adjacent
    * occurrences stays available to the next match.
    */
  def mergeOnce(symWords: DataFrame, a: String, b: String): DataFrame = {
    val pat = "(\\A|" + SEP + ")" +
      java.util.regex.Pattern.quote(a + SEP + b) + "(?=" + SEP + "|\\z)"
    val rep = "$1" + java.util.regex.Matcher.quoteReplacement(a + b)
    symWords.withColumn("syms",
      // an empty sequence (the "" token) must stay empty — split of the
      // joined empty string would inject a phantom "" symbol
      when(size(col("syms")) === 0, col("syms")).otherwise(
        split(regexp_replace(array_join(col("syms"), SEP), pat, rep), SEP)))
  }

  /** The k most frequent pairs under the deterministic (cnt desc, a, b)
    * total order — one Column-level ordering shared by the graded query
    * and the training loop, so both rank identically (ties included).
    */
  def topPairs(counts: DataFrame, k: Int): DataFrame =
    counts.orderBy(col("cnt").desc, col("a"), col("b")).limit(k)

  /** Greedy batched-BPE selection from a ranked candidate list: walk the
    * candidates in rank order, choosing up to `want` pairs such that no
    * chosen pair shares a symbol with a higher-ranked chosen pair (the
    * standard batched-BPE conflict rule — disjoint symbols mean the
    * merges touch disjoint occurrences, so applying them together equals
    * applying them one-by-one without recounting). The chosen pairs'
    * CONCATENATIONS also count as used: a candidate like (es, t) after
    * choosing (e, s) would otherwise merge the brand-new "es" symbols
    * its own count never saw.
    */
  private[operators] def selectNonConflicting(
      ranked: Seq[(String, String)], want: Int): Seq[(String, String)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val it = ranked.iterator
    while (chosen.size < want && it.hasNext) {
      val (a, b) = it.next()
      if (!used(a) && !used(b)) {
        chosen += ((a, b))
        used ++= Seq(a, b, a + b)
      }
    }
    chosen.toSeq
  }

  /** The longest PREFIX of `merges` that is pairwise non-conflicting
    * under selectNonConflicting's rule (no shared symbol, no use of an
    * earlier prefix member's concatenation). Unlike selectNonConflicting
    * — which SKIPS conflicting candidates because training may reorder
    * within a count round — encoding must preserve the trained rank
    * order exactly, so the walk STOPS at the first conflict: batched
    * application of a non-conflicting prefix is provably identical to
    * applying its merges one-by-one (the BatchMergePairs equivalence),
    * while skipping past a conflict would reorder the tokenizer.
    */
  private[graft] def nonConflictingPrefix(
      merges: Seq[(String, String)]): Seq[(String, String)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val it = merges.iterator
    var stop = false
    while (!stop && it.hasNext) {
      val (a, b) = it.next()
      if (!used(a) && !used(b)) {
        out += ((a, b))
        used ++= Seq(a, b, a + b)
      } else stop = true
    }
    out.toSeq
  }

  /** ENCODE with a trained tokenizer: apply a merge list (rank order —
    * the order training chose them) to a (w, freq, ...) vocabulary,
    * returning it with `syms` holding each word's final symbol
    * sequence. This is the production half of BPE that training exists
    * for: the corpus-sized work of encoding a 100 TB corpus is one
    * wordcount (wordFreqs) + one join back (the x25 vocab-encode
    * shape); THIS loop runs on the distinct vocabulary only.
    *
    * Merges apply in exact rank order via order-preserving
    * non-conflicting prefix batches (nonConflictingPrefix), each batch
    * one BatchMergePairs pass — plan depth grows with the number of
    * CONFLICT BOUNDARIES, not merges, and a lazy checkpoint every 16
    * batches bounds it for production-depth (32k-merge) tokenizers the
    * same way the training loop bounds its rounds.
    */
  def encodeVocab(words: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    var sym = initSymbols(words.filter(!col("w").contains(SEP)))
    var rest = merges
    var batches = 0
    while (rest.nonEmpty) {
      val batch = nonConflictingPrefix(rest)
      sym = sym.withColumn("syms",
        graft.functions.BpeFunctions.batchMergePairs(col("syms"), batch))
      rest = rest.drop(batch.size)
      batches += 1
      if (batches % 16 == 0) sym = sym.localCheckpoint(false)
    }
    sym
  }

  /** `iters` BPE training merges from the character-level initial state,
    * `batch` merges per round: each round counts pairs once, collects a
    * small ranked candidate slice, greedily takes the top-`batch`
    * pairwise-non-conflicting pairs (selectNonConflicting), applies them
    * as ONE one-pass codegen'd projection (BatchMergePairs — constant
    * plan depth per round however large the batch), and records them.
    * batch=1 is
    * exactly classic sequential BPE; batch>1 trades exactness of the
    * merge ORDER for an iters/batch reduction in driver round-trips
    * (identical results whenever the top pairs don't share symbols —
    * BpeSpec asserts the parity and the conflict case).
    *
    * One action per round: the candidate collect. Checkpoints are LAZY
    * (localCheckpoint(false)) — each round's collect materializes the
    * previous round's merge output as a side effect, cutting lineage
    * without a dedicated job; superseded checkpoint blocks lose their
    * last reference on reassignment and are freed by the
    * ContextCleaner. The returned frame materializes its pending
    * checkpoint on the caller's first action.
    */
  def train(docs: DataFrame, textCol: String, iters: Int, batch: Int = 1)
      : (Seq[(String, String)], DataFrame) = {
    val r = trainWithStats(docs, textCol, iters, batch)
    (r.merges, r.syms)
  }

  /** Training outcome plus the driver-round count (== collect actions —
    * exactly one per round), the number the batched loop exists to
    * minimize: `rounds` has floor ceil(iters/batch) and grows past it
    * only when conflict-heavy rounds underfill (BpeSpec bounds it at 4x
    * floor; SCALE.md records it at 8k-merge depth).
    */
  case class TrainResult(merges: Seq[(String, String)], syms: DataFrame,
      rounds: Int)

  def trainWithStats(docs: DataFrame, textCol: String, iters: Int,
      batch: Int = 1): TrainResult =
    trainFromFreqs(wordFreqs(docs, textCol), iters, batch)

  /** Training from an already-computed (w, freq) frequency table — the
    * vocabulary-side entry. `wordFreqs` is the ONE corpus-sized pass;
    * everything after runs on the distinct vocabulary, so a caller that
    * already has frequencies (an incremental pipeline re-training on
    * refreshed counts, or a depth measurement that wants the loop
    * isolated from the corpus scan) starts here. Words containing the
    * SEP codepoint are excluded exactly as wordFreqs would.
    */
  def trainFromFreqs(words: DataFrame, iters: Int,
      batch: Int = 1): TrainResult = {
    require(iters >= 0, "iters must be >= 0")
    require(batch >= 1, "batch must be >= 1")
    // A vocabulary is small in BYTES (AQE coalesces a few-MB frame to
    // ~1 partition) but the merge loop's cost is per-ROW-per-merge: the
    // chained regex projection over a single partition serializes the
    // whole round (measured: the 8k-merge run sat at load ~3/32 and
    // 13.5s/round). Spread the rows across the session's parallelism
    // once, up front — projections are narrow, so the partitioning
    // persists through every round's checkpoint.
    val par = words.sparkSession.sparkContext.defaultParallelism
    var sym = initSymbols(words.filter(!col("w").contains(SEP)))
      .repartition(par)
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var rounds = 0
    // over-collect so conflicts can be skipped and the batch still
    // filled; the slice stays tiny (candidates are vocab-side rows).
    // The factor grows when a round underfills while MORE candidates
    // existed below the slice (a conflict-heavy vocabulary would
    // otherwise silently cost extra driver rounds), capped so the
    // collect stays bounded.
    var overCollect = 4
    while (merges.size < iters && !done) {
      val want = math.min(batch, iters - merges.size)
      val slice = math.max(want * overCollect, 8)
      val ranked = topPairs(pairCounts(sym), slice)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      rounds += 1
      if (ranked.isEmpty) done = true // no pairs left: every word is 1 symbol
      else {
        val chosen = selectNonConflicting(ranked, want)
        if (chosen.size < want && ranked.size >= slice && overCollect < 64)
          overCollect *= 2
        merges ++= chosen
        // ONE plan node per round regardless of batch size: the round-10
        // foldLeft of mergeOnce chained `batch` regexp_replace
        // projections, so each round re-planned/re-codegen'd a 256-deep
        // expression tree (measured 6.1 s/round of pure driver time at
        // 8,192 merges) and each vocab row ran `batch` regex passes.
        // BatchMergePairs applies the whole non-conflicting batch in one
        // left-to-right scan — equivalence to the sequential foldLeft is
        // argued in its scaladoc and pinned by BpeSpec's replay test.
        sym = sym.withColumn("syms",
          graft.functions.BpeFunctions.batchMergePairs(col("syms"), chosen))
          .localCheckpoint(false)
      }
    }
    TrainResult(merges.toSeq, sym, rounds)
  }
}
