package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Perplexity-style quality scoring from a corpus-trained bigram
  * language model — the statistical-LM filter of the CCNet family
  * (Wenzek et al. 2020 train a KenLM n-gram model and keep documents
  * whose perplexity is low), re-expressed as a self-contained Spark
  * job: the corpus itself is the training set, the model is the
  * corpus's bigram/unigram tables, and each document is scored by its
  * average add-one-smoothed bigram log-likelihood
  *
  *   avg_ll(doc) = (1/T) Σᵢ ln( (c(wᵢ₋₁wᵢ)+1) / (c(wᵢ₋₁)+V) )
  *
  * over its T token transitions, with c(·) corpus occurrence counts and
  * V the vocabulary size. Low avg_ll = improbable transitions =
  * gibberish/degenerate text; the downstream pipeline thresholds or
  * quantile-buckets it next to the heuristic scores (TextAnalysis
  * .qualityScore, Repetition.signals).
  *
  * Scale shape at 100 TB:
  *  - ONE tagged explode produces unigrams and bigrams in the same
  *    stream (the Repetition pattern: a codegen'd transform+concat,
  *    no second pass over the text), then one hash-aggregate keyed by
  *    (sz, gram) with map-side partial combine builds both model
  *    tables, CHECKPOINTED once so its three consumers (bigram counts,
  *    unigram counts, V) read the persisted vocab-sized table instead
  *    of each re-running the corpus explode (their pushed-down sz
  *    filters make the subtrees canonically different, so exchange
  *    reuse cannot deduplicate them — measured as four explodes in the
  *    round-21 plan). Real text is ZIPFIAN in gram frequency — a hot bigram
  *    ("of the") is a fat aggregation key and a fat join key — but
  *    the aggregate collapses repeats map-side before the exchange,
  *    and the scoring joins below are exactly the shape AQE's
  *    skew-join split handles (measured 3.0x on the zipfian events
  *    slice, SCALE.md round-11; Skew.saltedAgg is the fallback for
  *    trigger-blind deployments).
  *  - Scoring re-exchanges transitions against the model on the gram
  *    key twice (bigram count, then prefix unigram count). The model
  *    tables grow with the corpus, so these are shuffle joins by
  *    design — broadcasting a web-scale vocabulary is the mistake.
  *    V rides along as a broadcast ONE-ROW frame (the Mix.scala
  *    pattern), not a driver collect.
  *  - Exchanges carry RAW grams, deliberately breaking Decontaminate's
  *    digest-before-shuffle rule: that rule pays off when grams exceed
  *    the 32-char md5 hex (8-grams, ~48 chars); a bigram (~12 chars of
  *    real text) is SMALLER than its digest, so digesting would grow
  *    shuffle bytes ~2.5x — and the count tables need the gram string
  *    anyway if the model is to be stored or inspected.
  *
  * Determinism (the oracle-hash contract): every per-transition term
  * is rounded to an exact INTEGER of micro-nats —
  * CAST(round(ln(P)·1e6) AS BIGINT) — so the per-document sum is
  * integer arithmetic: exact, order-independent, engine-independent.
  * P itself is one IEEE division of integer-valued doubles (identical
  * everywhere); ln() may differ across math libraries in the last ulp,
  * which after ·1e6 moves a term across its rounding boundary only if
  * the true value sits within ~1e-9 of it (probability ~1e-5 across
  * the whole graded slice). The final avg is two divisions of exact
  * integers, bit-identical in any IEEE engine.
  */
object LmQuality {

  /** Score every document against the corpus bigram model.
    * Output: (idCol, n_trans, avg_ll) ordered by nothing — callers
    * sort. Documents with < 2 tokens have no transitions: n_trans = 0,
    * avg_ll = 0.0 (they carry no bigram evidence either way; filter on
    * n_tokens separately).
    */
  def bigramLogLikelihood(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    Seq("n_trans", "avg_ll", "sz", "gram", "g", "w1", "cb", "cu", "v",
      "micro_ll", "sum_micro").foreach(c =>
      require(idCol != c, s"LmQuality.bigramLogLikelihood reserves '$c'"))
    val tagged = concat(
      transform(TextAnalysis.tokens(col(textCol)),
        t => struct(lit(1).as("sz"), t.as("gram"))),
      transform(Dedup.shingles(col(textCol), 2),
        g => struct(lit(2).as("sz"), g.as("gram"))))
    // one exploded stream feeds BOTH the model build and the scoring
    // side; fanOut gives a thin input real parallelism (the Dedup rule)
    val grams = Dedup.fanOut(docs)
      .select(explode(tagged).as("g"))
      .select(col("g.sz").as("sz"), col("g.gram").as("gram"))
    // The model table is built ONCE and checkpointed: its three
    // consumers (bigram counts, unigram counts, V) carry different
    // pushed-down sz filters, so their subtrees are canonically
    // different and exchange reuse cannot deduplicate them — without
    // the checkpoint each consumer re-ran the full corpus explode +
    // gram exchange (the round-21 x46 plan carried FOUR explodes).
    // Checkpointing the AGGREGATED table persists the vocab-sized
    // model (zipf-collapsed, far smaller than the raw gram mass), the
    // same shared-intermediate idiom as Retrieval's featurization; one
    // corpus pass and one gram exchange now serve all three.
    val counts = grams.groupBy("sz", "gram").agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val vocab = counts.filter(col("sz") === 1)
      .agg(count(lit(1)).cast(LongType).as("v"))
    val bi = counts.filter(col("sz") === 2)
      .select(col("gram"), col("c").as("cb"))
    val uni = counts.filter(col("sz") === 1)
      .select(col("gram").as("w1"), col("c").as("cu"))
    // The scoring pass explodes bigrams ONLY (it shares no subtree with
    // the checkpointed model build, so tagging unigrams into this
    // stream would explode ~45% more rows just to filter them back
    // out). Tokens contain no spaces (they are split on space), so the
    // first space in a bigram string is the prefix boundary.
    val trans = Dedup.fanOut(docs)
      .select(col(idCol), explode(Dedup.shingles(col(textCol), 2)).as("gram"))
      .select(col(idCol), col("gram"),
        split(col("gram"), " ").getItem(0).as("w1"))
    val term = round(
      log((col("cb") + lit(1)).cast(DoubleType)
        / (col("cu") + col("v")).cast(DoubleType)) * lit(1000000.0), 0)
      .cast(LongType)
    val perDoc = trans
      .join(bi, Seq("gram"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol), term.as("micro_ll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum("micro_ll").as("sum_micro"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(
          col("sum_micro").cast(DoubleType) / col("n_trans")
            / lit(1000000.0),
          lit(0.0)).as("avg_ll"))
  }
}
