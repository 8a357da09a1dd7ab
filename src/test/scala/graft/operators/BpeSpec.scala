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

  private def symsOf(sym: org.apache.spark.sql.DataFrame) =
    sym.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap

  test("mergeOnce is anchored: a pair does not match a SUFFIX of the " +
    "previous symbol (merge (h,e) must not weld [th, e] into 'the')") {
    // th x4, he x3, the x1: iteration 1 merges (t,h) — count 5 — turning
    // "the" into [th, e]; iteration 2 merges (h,e) — count 3 — which must
    // apply to [h, e] only, NOT to the 'h' inside the symbol "th"
    val (merges, sym) =
      Bpe.train(docs("th th th th he he he the"), "text", 2)
    assert(merges == Seq(("t", "h"), ("h", "e")))
    val s = symsOf(sym)
    assert(s("the") == Seq("th", "e"), "suffix collision welded 'the'")
    assert(s("he") == Seq("he"))
  }

  test("mergeOnce is anchored: a pair does not match a PREFIX of the " +
    "next symbol (merge (a,b) must not weld [a, bc] into 'abc')") {
    // bc x3, ab x2, abc x1: iteration 1 merges (b,c) — count 4 — turning
    // "abc" into [a, bc]; iteration 2 merges (a,b) — count 2 — which must
    // not consume the 'b' that starts the symbol "bc"
    val (merges, sym) = Bpe.train(docs("bc bc bc ab ab abc"), "text", 2)
    assert(merges == Seq(("b", "c"), ("a", "b")))
    val s = symsOf(sym)
    assert(s("abc") == Seq("a", "bc"), "prefix collision welded 'abc'")
    assert(s("ab") == Seq("ab"))
  }

  test("wordFreqs excludes tokens containing the separator codepoint " +
    "(they cannot round-trip the string-encoded merge)") {
    val f = Bpe.wordFreqs(docs("ab ab x y"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("x" -> 1L, "y" -> 1L))
  }

  test("selectNonConflicting skips pairs sharing a symbol OR naming a " +
    "just-created concatenation") {
    val chosen = Bpe.selectNonConflicting(
      Seq(("e", "s"), ("s", "t"), ("es", "t"), ("x", "y")), 4)
    assert(chosen == Seq(("e", "s"), ("x", "y")))
  }

  // 8 words over disjoint alphabets with strictly decreasing frequency:
  // every merge is independent, so batched and sequential training agree
  private val disjointCorpus = docs(
    Seq("ab" -> 8, "cd" -> 7, "ef" -> 6, "gh" -> 5,
      "ij" -> 4, "kl" -> 3, "mn" -> 2, "op" -> 1)
      .flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" "))

  test("batched training (batch=4) equals sequential when no conflicts " +
    "arise") {
    val (seqMerges, seqSym) = Bpe.train(disjointCorpus, "text", 8)
    val (batMerges, batSym) = Bpe.train(disjointCorpus, "text", 8, batch = 4)
    assert(batMerges == seqMerges)
    assert(symsOf(batSym) == symsOf(seqSym))
  }

  test("batched training skips conflicting pairs and still reaches " +
    "iters merges") {
    // newest x3 widest x1: round-1 candidates lead (e,s), (s,t), ... —
    // everything past (e,s) down to (i,d) shares a symbol with it, so
    // batch=2 must choose [(e,s), (i,d)], not weld (s,t) in the same round
    val corpus = docs(Seq.fill(3)("newest").mkString(" ") + " widest")
    val (merges, _) = Bpe.train(corpus, "text", 2, batch = 2)
    assert(merges == Seq(("e", "s"), ("i", "d")))
  }

  // 64 two-char words over 128 pairwise-distinct codepoints with strictly
  // decreasing frequency: 64 independent merges in a deterministic order,
  // enough to drive a full 4-round batched run
  private val disjoint64 = {
    val chars = (0 until 128).map(i => (65 + i).toChar)
    val words = (0 until 64).map(i => s"${chars(2 * i)}${chars(2 * i + 1)}")
    docs(words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(64 - i)(w) }.mkString(" "))
  }

  test("round trip: re-applying the returned merge list sequentially to " +
    "the initial symbols reproduces train's final state — batched " +
    "application must equal one-by-one replay (order-dependence guard)") {
    // conflict-heavy corpus: batching defers candidates to later rounds,
    // so a batching bug that applied merges in a different effective
    // order than the returned list would surface here
    val corpus = docs(
      Seq.fill(3)("newest").mkString(" ") + " " +
        Seq.fill(2)("widest").mkString(" ") + " lowest low newer")
    for (batch <- Seq(1, 2, 4, 8)) {
      val (merges, sym) = Bpe.train(corpus, "text", 10, batch = batch)
      assert(merges.nonEmpty)
      val replayed = merges.foldLeft(
        Bpe.initSymbols(Bpe.wordFreqs(corpus, "text"))) {
          case (s, (a, b)) => Bpe.mergeOnce(s, a, b) }
      assert(symsOf(replayed) == symsOf(sym), s"batch=$batch diverged")
    }
    // and on the conflict-free wide corpus at a full batched run
    val (m64, s64) = Bpe.train(disjoint64, "text", 64, batch = 16)
    val replay64 = m64.foldLeft(
      Bpe.initSymbols(Bpe.wordFreqs(disjoint64, "text"))) {
        case (s, (a, b)) => Bpe.mergeOnce(s, a, b) }
    assert(symsOf(replay64) == symsOf(s64))
  }

  test("round count stays within 4x the ceil(iters/batch) floor even on " +
    "a conflict-heavy vocabulary (the bpe8k depth bound, CI-sized)") {
    // conflict-free wide corpus: rounds == floor exactly
    val free = Bpe.trainWithStats(disjoint64, "text", 64, batch = 16)
    assert(free.merges.size == 64 && free.rounds == 4, free.rounds)
    // conflict-heavy: shared-suffix words make top candidates collide
    // (est/est/west chains), so rounds exceed the floor via underfilled
    // batches — the adaptive over-collect must keep them under 4x
    val heavy = docs(
      Seq.fill(5)("newest").mkString(" ") + " " +
        Seq.fill(4)("widest").mkString(" ") + " " +
        Seq.fill(3)("lowest").mkString(" ") + " " +
        Seq.fill(2)("nearest").mkString(" ") + " dearest newer lower")
    val iters = 24
    val batch = 8
    val r = Bpe.trainWithStats(heavy, "text", iters, batch)
    val floor = (iters + batch - 1) / batch
    assert(r.rounds <= 4 * floor,
      s"${r.rounds} rounds for ${r.merges.size} merges (floor $floor)")
    // stats agree with the tuple-returning surface
    assert(r.merges == Bpe.train(heavy, "text", iters, batch)._1)
  }

  test("BatchMergePairs equals sequential mergeOnce application on " +
    "random symbol sequences and random non-conflicting batches (the " +
    "scan formulation vs the regex formulation, 200 seeded cases)") {
    import graft.functions.BpeFunctions
    val rnd = new scala.util.Random(4242)
    val alphabet = Vector("a", "b", "c", "d", "aa", "ab", "bc", "cd", "Ω", "字")
    for (_ <- 0 until 10) {
      // random sequences over a small alphabet so merges actually hit
      val seqs = (0 until 20).map { i =>
        (0 to rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.size)))
      }
      // random candidate list -> the loop's own conflict filter picks a
      // valid batch (including multi-char and non-ASCII symbols)
      val cands = (0 until 8).map(_ =>
        (alphabet(rnd.nextInt(alphabet.size)),
          alphabet(rnd.nextInt(alphabet.size))))
      val batch = Bpe.selectNonConflicting(cands.distinct, 4)
      if (batch.nonEmpty) {
        val df = seqs.zipWithIndex.map { case (s, i) => (i, s) }
          .toDF("id", "syms")
        val native = df.withColumn("syms",
          BpeFunctions.batchMergePairs(org.apache.spark.sql.functions.col("syms"), batch))
        val regex = batch.foldLeft(df) { case (s, (a, b)) =>
          Bpe.mergeOnce(s, a, b) }
        val nm = native.collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
        val rm = regex.collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
        assert(nm == rm, s"batch=$batch")
      }
    }
  }

  test("replay parity holds on a zipf-shaped hex vocabulary at depth " +
    "(CI-sized bpe8k: the batched native training's merge list, " +
    "re-applied one-by-one through the independent regex formulation, " +
    "reproduces the trained state)") {
    import org.apache.spark.sql.functions.{col, lit, max, md5}
    val vocab = spark.range(0, 2000)
      .select(
        md5(col("id").cast("string"))
          .substr(lit(1), (col("id") % 16 + 6).cast("int")).as("w"),
        (lit(2000L) / (col("id") + 1) + 1).as("freq"))
      .groupBy("w").agg(max(col("freq")).as("freq"))
    val r = Bpe.trainFromFreqs(vocab, 128, batch = 32)
    assert(r.merges.size == 128, s"only ${r.merges.size} merges")
    val replayed = r.merges.foldLeft(Bpe.initSymbols(vocab)) {
      case (s, (a, b)) => Bpe.mergeOnce(s, a, b) }
    assert(symsOf(replayed) == symsOf(r.syms),
      "batched-native training diverged from sequential regex replay")
  }

  test("charSplit clamps a truncated multibyte tail: malformed UTF-8 " +
    "yields a bounded final symbol, never a view past the array end") {
    import org.apache.spark.unsafe.types.UTF8String
    // 'a' followed by a lone 0xC3 lead byte (declares 2 bytes, has 1)
    val malformed = UTF8String.fromBytes(Array(0x61.toByte, 0xC3.toByte))
    val out = graft.functions.BpeNatives.charSplit(malformed)
    assert(out.numElements() == 2)
    assert(out.getUTF8String(0).toString == "a")
    assert(out.getUTF8String(1).numBytes() == 1) // clamped, in-bounds
    // well-formed multibyte at the end stays whole
    val ok = UTF8String.fromString("aΩ")
    val out2 = graft.functions.BpeNatives.charSplit(ok)
    assert(out2.numElements() == 2 && out2.getUTF8String(1).toString == "Ω")
  }

  test("BatchMergePairs rejects a conflicting batch outright — the " +
    "one-pass scan is only equivalent to sequential application for " +
    "fully disjoint pairs, so a weaker input must fail, not drift") {
    import graft.functions.BatchMergePairs
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val in = BoundReference(0, ArrayType(StringType), nullable = true)
    // shared symbol between pairs
    intercept[IllegalArgumentException] {
      BatchMergePairs(in, Seq("a" -> "b", "b" -> "c"))
    }
    // a pair naming another pair's concatenation
    intercept[IllegalArgumentException] {
      BatchMergePairs(in, Seq("e" -> "s", "es" -> "t"))
    }
    // disjoint batch constructs fine
    BatchMergePairs(in, Seq("a" -> "b", "c" -> "d"))
  }

  test("initSymbols is one-pass: a 10k-char degenerate word splits " +
    "into 10k single-char symbols in well under a second (the per-" +
    "index substr formulation cost O(len^2) head-scans)") {
    val word = ("ab" * 4999) + "Ω字" // 10k code points, non-ASCII tail
    val df = Seq((word, 1L)).toDF("w", "freq")
    val t0 = System.nanoTime()
    val syms = Bpe.initSymbols(df).select("syms").as[Seq[String]]
      .collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    assert(syms.length == 10000)
    assert(syms.take(2) == Seq("a", "b") && syms.takeRight(2) == Seq("Ω", "字"))
    // one merge round over the long word must also stay cheap
    val (merges, sym) = {
      val words = Bpe.wordFreqs(Seq((0L, word)).toDF("doc_id", "text"), "text")
      val r = Bpe.trainFromFreqs(words, 1, batch = 1)
      (r.merges, r.syms)
    }
    assert(merges == Seq(("a", "b")))
    assert(sym.select("syms").as[Seq[String]].collect().head.length == 5001)
    assert(sec < 5.0, f"initSymbols took $sec%.2f s")
  }

  test("encodeVocab applies a shipped tokenizer in exact rank order: " +
    "hand-computed pieces, concatenation-conflict boundaries, and " +
    "order-dependence all hold") {
    // the x48 tokenizer's hand-verified words (PipelineOps scaladoc):
    // (th,e) consumes (t,h)'s concat, (ba,t) consumes (b,a)'s, and
    // (o,w) must NOT fire on `row` because rank-3 (r,o) ate the o
    val tok = Seq(
      ("s", "t"), ("a", "n"), ("r", "o"), ("t", "a"), ("e", "r"),
      ("t", "h"), ("th", "e"), ("q", "u"), ("o", "w"), ("l", "u"),
      ("i", "n"), ("s", "m"), ("b", "a"), ("ba", "t"), ("c", "o"),
      ("k", "e"))
    val out = Bpe.encodeVocab(
      Bpe.wordFreqs(docs("the customer batch table window row aaaa"),
        "text"), tok)
      .select("w", "syms").as[(String, Seq[String])].collect().toMap
    assert(out("the") == Seq("the"))
    assert(out("customer") == Seq("c", "u", "st", "o", "m", "er"))
    assert(out("batch") == Seq("bat", "c", "h"))
    assert(out("table") == Seq("ta", "b", "l", "e"))
    assert(out("window") == Seq("w", "in", "d", "ow"))
    assert(out("row") == Seq("ro", "w")) // NOT (o,w): order dependence
    assert(out("aaaa") == Seq("a", "a", "a", "a")) // no (a,a) rule
  }

  test("encodeVocab equals the sequential mergeOnce replay on the " +
    "graded corpus vocabulary — prefix batching never reorders") {
    val tok = Seq(
      ("s", "t"), ("a", "n"), ("r", "o"), ("t", "a"), ("e", "r"),
      ("t", "h"), ("th", "e"), ("q", "u"), ("o", "w"), ("l", "u"),
      ("i", "n"), ("s", "m"), ("b", "a"), ("ba", "t"), ("c", "o"),
      ("k", "e"))
    val vocab = Bpe.wordFreqs(
      spark.read.parquet(s"$sfDir/documents.parquet"), "text")
    val batched = Bpe.encodeVocab(vocab, tok)
      .select("w", "syms").as[(String, Seq[String])].collect().toMap
    val sequential = tok.foldLeft(Bpe.initSymbols(vocab)) {
      case (df, (a, b)) => Bpe.mergeOnce(df, a, b)
    }.select("w", "syms").as[(String, Seq[String])].collect().toMap
    assert(batched == sequential)
  }

  test("encodeVocab fuzz: conflict-HEAVY random tokenizers equal the " +
    "sequential mergeOnce replay (20 seeded cases) — the prefix " +
    "batching's order preservation under arbitrary conflicts") {
    // unlike the BatchMergePairs fuzz above, the merge lists here are
    // raw — duplicates, chained concatenations, shared symbols — so
    // every case exercises nonConflictingPrefix's batch boundaries
    val rnd = new scala.util.Random(2024)
    val alphabet = Vector("a", "b", "c", "ab", "bc", "ca", "abc")
    for (caseNo <- 0 until 20) {
      val words = (0 until 12).map { _ =>
        (0 to rnd.nextInt(8)).map(_ =>
          "abc".charAt(rnd.nextInt(3)).toString).mkString
      }.distinct
      val tok = (0 until 10).map(_ =>
        (alphabet(rnd.nextInt(alphabet.size)),
          alphabet(rnd.nextInt(alphabet.size))))
      val vocab = words.zipWithIndex
        .map { case (w, i) => (w, (i + 1).toLong) }.toDF("w", "freq")
      val batched = Bpe.encodeVocab(vocab, tok)
        .select("w", "syms").as[(String, Seq[String])].collect().toMap
      val sequential = tok.foldLeft(Bpe.initSymbols(vocab)) {
        case (df, (a, b)) => Bpe.mergeOnce(df, a, b)
      }.select("w", "syms").as[(String, Seq[String])].collect().toMap
      assert(batched == sequential, s"case $caseNo tok=$tok")
    }
  }

  test("nonConflictingPrefix stops AT the first conflict instead of " +
    "skipping it — the property that makes batching order-safe") {
    val ms = Seq(("t", "h"), ("th", "e"), ("x", "y"))
    // (th,e) uses (t,h)'s concatenation: the prefix must stop before
    // it even though (x,y) further down would not conflict
    assert(Bpe.nonConflictingPrefix(ms) == Seq(("t", "h")))
    assert(Bpe.nonConflictingPrefix(ms.drop(1)) ==
      Seq(("th", "e"), ("x", "y")))
  }

  test("train issues one driver action per ROUND: iters=64 at batch=16 " +
    "is at most iters/batch + 1 actions, not one per merge") {
    // count job-launching actions only: the lazy per-round checkpoint
    // also fires a "localCheckpoint" listener event, but launches no job
    // (materialization rides on the NEXT round's collect) — the driver
    // round-trips the batching exists to amortize are the collects
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "collect") actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val (merges, _) = Bpe.train(disjoint64, "text", 64, batch = 16)
      assert(merges.size == 64)
      // listener delivery is async: wait for the expected 4
      // round-collects, then keep polling until the count is STABLE
      // across two consecutive sleeps — a fixed grace period could miss
      // late deliveries from a regression issuing a few extra collects
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (actions.get() < 4 && System.nanoTime() < deadline)
        Thread.sleep(50)
      var prev = -1
      var cur = actions.get()
      while (prev != cur && System.nanoTime() < deadline) {
        Thread.sleep(150)
        prev = cur
        cur = actions.get()
      }
      assert(cur <= 64 / 16 + 1,
        s"expected <= 5 driver actions, saw $cur")
    } finally spark.listenerManager.unregister(listener)
  }
}
