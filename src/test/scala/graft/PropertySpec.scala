package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests (SURVEY.md §5.3): algebraic laws of the relational
  * operators on generated integer tables, and invariants of the sketch
  * functions on generated token streams.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  // scalacheck generators sampled directly (the scalatest bridge artifact
  // is not in the offline cache)
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(10).foreach(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    Iterator.continually(Gen.zip(g1, g2).sample).flatten.take(10)
      .foreach { case (a, b) => f(a, b) }

  private val rowsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(40, Gen.zip(Gen.chooseNum(-50L, 50L),
      Gen.chooseNum(-50L, 50L), Gen.chooseNum(0L, 5L)))

  private def df(rows: List[(Long, Long, Long)]): DataFrame =
    rows.toDF("a", "b", "g")

  test("filter(p).filter(q) == filter(p && q)") {
    forAll(rowsGen) { rows =>
      val d = df(rows)
      val chained = d.filter(col("a") > 0).filter(col("b") <= 10).count()
      val combined = d.filter(col("a") > 0 && col("b") <= 10).count()
      assert(chained == combined)
    }
  }

  test("distinct is idempotent and bounded by the input") {
    forAll(rowsGen) { rows =>
      val d = df(rows)
      val once = d.distinct()
      assert(once.distinct().count() == once.count())
      assert(once.count() <= d.count())
      assert(once.count() == rows.distinct.length)
    }
  }

  test("groupBy sum equals per-key scala fold") {
    forAll(rowsGen) { rows =>
      val got = df(rows).groupBy("g").agg(sum("a")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(_._3).view.mapValues(_.map(_._1).sum).toMap
      assert(got == want)
    }
  }

  test("union row count is additive; intersect bounded by either side") {
    forAll(rowsGen, rowsGen) { (r1, r2) =>
      val d1 = df(r1).select("a")
      val d2 = df(r2).select("a")
      assert(d1.unionAll(d2).count() == d1.count() + d2.count())
      val i = d1.intersect(d2).count()
      assert(i <= d1.distinct().count() && i <= d2.distinct().count())
    }
  }

  test("cross join count is multiplicative; equi-filtered subset of it") {
    forAll(rowsGen, rowsGen) { (r1, r2) =>
      val d1 = df(r1).select(col("a").as("x"))
      val d2 = df(r2).select(col("a").as("y"))
      val cross = d1.crossJoin(d2)
      assert(cross.count() == d1.count() * d2.count())
      assert(cross.filter(col("x") === col("y")).count() <= cross.count())
    }
  }

  private val tokensGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta"))

  test("saltedJoin equals the plain join for any salt count") {
    forAll(rowsGen, Gen.chooseNum(1, 16)) { (rows, salts) =>
      val big = df(rows).withColumn("uid",
        monotonically_increasing_id())
      val small = rows.map(_._3).distinct.map(g => (g, g * 10))
        .toDF("g", "w")
      val salted = operators.Skew.saltedJoin(big, small, "g", "uid", salts)
        .select("a", "b", "g", "w")
      val plain = big.join(small, "g").select("a", "b", "g", "w")
      assert(salted.exceptAll(plain).isEmpty
        && plain.exceptAll(salted).isEmpty)
    }
  }

  test("sequence packing conserves docs and tokens; packs are contiguous " +
    "id ranges per group") {
    forAll(rowsGen) { rows =>
      // treat (g, uid, |a| + 1) as (lang, doc_id, n_tok)
      val docs = rows.zipWithIndex
        .map { case ((a, _, g), i) => (g, i.toLong, math.abs(a) + 1L) }
        .toDF("lang", "doc_id", "n_tok")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val packed = docs
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("pack_id", expr("(cum - n_tok) div 60"))
      val agg = packed.groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("pack_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .collect()
      // conservation: every doc and every token lands in exactly one pack
      assert(agg.map(_.getAs[Long]("n_docs")).sum == docs.count())
      assert(agg.map(_.getAs[Long]("pack_tokens")).sum ==
        rows.map(r => math.abs(r._1) + 1L).sum)
      // contiguity: within a lang, packs tile the doc_id axis in order
      agg.groupBy(_.getAs[Long]("lang")).foreach { case (_, packs) =>
        val sorted = packs.sortBy(_.getAs[Long]("pack_id"))
        sorted.sliding(2).foreach {
          case Array(p, q) =>
            assert(p.getAs[Long]("last_doc") < q.getAs[Long]("first_doc"))
          case _ =>
        }
      }
    }
  }

  test("fingerprint is permutation-invariant; rolling hash catches order") {
    forAll(tokensGen) { toks =>
      val text = toks.mkString(" ")
      val shuffled = scala.util.Random.shuffle(toks).mkString(" ")
      val r = Seq((text, shuffled)).toDF("t1", "t2").select(
        operators.TextAnalysis.fingerprint(col("t1")) ===
          operators.TextAnalysis.fingerprint(col("t2")),
        operators.TextAnalysis.rollingHash(col("t1")),
        operators.TextAnalysis.rollingHash(col("t2"))).collect()(0)
      assert(r.getBoolean(0)) // same token multiset (as set) -> same fp
      if (text != shuffled)
        assert(r.getLong(1) != r.getLong(2) || toks.distinct.length == 1)
    }
  }

  test("simhash expression: hamming(a,a)=0 and stability under self-union") {
    forAll(tokensGen) { toks =>
      val text = toks.mkString(" ")
      val r = Seq(text).toDF("t").select(
        functions.SketchFunctions.simhash64(col("t")),
        functions.SketchFunctions.simhash64(col("t"))).collect()(0)
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("globalOrdinal equals the in-memory sort rank for random tables " +
    "and shard counts") {
    val vocabGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 80L), Gen.chooseNum(0L, 9L)))
    forAll(vocabGen, Gen.chooseNum(1, 8)) { (rows0, shards) =>
      val rows = rows0.distinctBy(_._1) // unique key -> total order
      val got = operators.Ranking.globalOrdinal(rows.toDF("k", "cnt"),
        Seq(col("cnt").desc, col("k").asc), "r", shards)
        .select("k", "r").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      val want = rows.sortBy { case (k, c) => (-c, k) }.zipWithIndex
        .map { case ((k, _), i) => k -> i.toLong }.toMap
      assert(got == want, s"shards=$shards")
    }
  }

  test("Pack.assign: replaying each (group, shard)'s prefix fold " +
    "reproduces every pack id; every row packed exactly once") {
    val docGen = Gen.listOfN(50, Gen.zip(Gen.chooseNum(0L, 999L),
      Gen.chooseNum(0, 2), Gen.chooseNum(1L, 300L)))
    forAll(docGen, Gen.zip(Gen.chooseNum(1, 4), Gen.chooseNum(64L, 256L))) {
      case (rows0, (shards, budget)) =>
        val rows = rows0.distinctBy(_._1)
        val out = operators.Pack.assign(rows.toDF("id", "g", "w"),
          "g", "id", "w", budget, shards)
          .select("id", "g", "w", "shard", "pack_id").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
            r.getInt(3), r.getLong(4)))
        assert(out.length == rows.length)
        assert(out.map(_._1).distinct.length == rows.length)
        // whatever hash shard a row landed in, pack ids within that
        // shard must be the prefix-sum fold over its members in order
        out.groupBy(x => (x._2, x._4)).foreach { case (_, grp) =>
          var cum = 0L
          grp.sortBy(_._1).foreach { case (_, _, w, _, pid) =>
            assert(pid == cum / budget)
            cum += w
          }
        }
    }
  }

  test("repetition signals equal the per-doc scala fold") {
    forAll(tokensGen) { toks =>
      val r = operators.Repetition.signals(
        Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", 2).collect().head
      val top = toks.groupBy(identity).values.map(_.size).max
      val grams = toks.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toList
      val dup =
        if (grams.isEmpty) 0.0
        else grams.groupBy(identity).values.map(_.size).filter(_ >= 2)
          .sum.toDouble / grams.size
      assert(r.getLong(1) == toks.size.toLong)
      assert(r.getDouble(2) == top.toDouble / toks.size)
      assert(r.getDouble(3) == dup)
    }
  }

  test("importance ppm equals the scala md5-fold replay, doc by doc") {
    // the executable-spec twin of Importance.weights: same bucket fold
    // (15-hex-char md5 prefix mod B), same add-one smoothing, same
    // float path (int -> double casts, two muls, one div, floor(1e6 x))
    forAll(Gen.listOfN(4, tokensGen)) { docsToks =>
      val docs = docsToks.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val target = docs.filter(col("doc_id") === 0L)
      val b = 8 // tiny bucket count: collisions guaranteed, also covered
      val got = operators.Importance.weights(
        docs, target, "doc_id", "text", n = 2, buckets = b)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      def bucket(g: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(d.take(15), 16) % b
      }
      def grams(ts: List[String]) = ts.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toList
      val rawB = docsToks.flatMap(grams).map(bucket)
      val tgtB = grams(docsToks.head).map(bucket)
      val (cr, ct) = (rawB.groupBy(identity).view.mapValues(_.size),
        tgtB.groupBy(identity).view.mapValues(_.size))
      val (nr, nt) = (rawB.size, tgtB.size)
      docsToks.zipWithIndex.foreach { case (ts, i) =>
        val gs = grams(ts)
        if (gs.isEmpty) assert(!got.contains(i.toLong))
        else {
          val ppm = gs.map { g =>
            val bk = bucket(g)
            val r = ((ct.getOrElse(bk, 0) + 1).toDouble * (nr + b).toDouble) /
              ((cr(bk) + 1).toDouble * (nt + b).toDouble)
            math.floor(r * 1e6).toLong
          }.sum
          assert(got(i.toLong) == ((gs.size.toLong, ppm)),
            s"doc $i: got ${got(i.toLong)}, spec ($gs -> $ppm)")
        }
      }
    }
  }

  test("bpe pair mass is conserved and merges never change the word") {
    forAll(tokensGen) { toks =>
      val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val sym = operators.Bpe.initSymbols(
        operators.Bpe.wordFreqs(docs, "text"))
      val counts = operators.Bpe.pairCounts(sym).collect()
      // total pair mass = sum over words of freq * (len - 1)
      val expected = toks.groupBy(identity).map { case (w, occ) =>
        occ.size.toLong * math.max(w.length - 1, 0) }.sum
      assert(counts.map(_.getLong(2)).sum == expected)
      // merging the best pair conserves the concatenated word text
      val best = operators.Bpe.topPairs(operators.Bpe.pairCounts(sym), 1)
        .collect()
      if (best.nonEmpty) {
        val merged = operators.Bpe.mergeOnce(
          sym, best.head.getString(0), best.head.getString(1))
        merged.select("w", "syms").collect().foreach { r =>
          assert(r.getSeq[String](1).mkString == r.getString(0))
        }
      }
    }
  }

  test("mergeOnce equals the driver-side reference merge for random " +
    "symbol sequences, including suffix/prefix-collision alphabets") {
    // left-to-right, non-overlapping — the textbook BPE merge
    def ref(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    // multi-char symbols whose concatenations collide with neighbors'
    // prefixes/suffixes — the alphabet that exposes unanchored matching
    val symGen = Gen.oneOf(
      "a", "b", "c", "e", "h", "s", "t", "ab", "bc", "th", "es", "the")
    val seqGen = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, symGen))
    val pairGen = Gen.zip(symGen, symGen)
    forAll(seqGen, pairGen) { (syms, pair) =>
      val d = Seq(("w0", syms)).toDF("w", "syms")
      val got = operators.Bpe.mergeOnce(d, pair._1, pair._2)
        .select("syms").as[Seq[String]].collect().head.toList
      assert(got == ref(syms, pair._1, pair._2),
        s"syms=$syms pair=$pair got=$got")
      // and a chain of three merges stays in lockstep with the reference
      val chain = List(("t", "h"), pair, ("th", "e"))
      val gotChain = chain.foldLeft(d) { case (df2, (a, b)) =>
        operators.Bpe.mergeOnce(df2, a, b)
      }.select("syms").as[Seq[String]].collect().head.toList
      val refChain = chain.foldLeft(syms) { case (s, (a, b)) => ref(s, a, b) }
      assert(gotChain == refChain,
        s"chain diverged: syms=$syms pair=$pair got=$gotChain want=$refChain")
    }
  }

  // ---- round-15 operators: scala-reference fuzz laws ----

  private val oddTextGen: Gen[String] =
    Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a", "bb", "ccc", "字", "", "xy")))
      .map(_.mkString(" ")) // "" tokens produce double/leading spaces

  test("chunk dedup identity law: with the threshold above the corpus " +
    "size nothing drops and reassembly reproduces the original text " +
    "byte-for-byte, whatever the whitespace shape") {
    forAll(Gen.listOfN(6, oddTextGen)) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val out = operators.ChunkDedup
        .dropSharedChunks(docs, "id", "text", 3, texts.size + 1)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val (nc, nd, clean) = out(i.toLong)
        // -1 keeps trailing empty tokens, matching Spark's split
        val toks = t.split(" ", -1)
        assert(nd == 0L, s"dropped below threshold: ${t}")
        assert(nc == (toks.length + 2) / 3, s"chunk count on '$t'")
        assert(clean == t, s"reconstruction broke on '$t' -> '$clean'")
      }
    }
  }

  test("novelty equals a scala reference on random corpora (per-doc " +
    "distinct grams, min-id attribution, corpus budget)") {
    forAll(Gen.listOfN(8, oddTextGen)) { texts =>
      val n = 2
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = operators.Novelty.firstSeenFraction(docs, "id", "text", n)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val gramsOf: String => Set[String] = t => {
        val toks = t.split(" ", -1)
        if (toks.length < n) Set.empty
        else toks.sliding(n).map(_.mkString(" ")).toSet
      }
      val perDoc = texts.zipWithIndex
        .map { case (t, i) => i.toLong -> gramsOf(t) }.toMap
      val firstOf = perDoc.toSeq
        .flatMap { case (id, gs) => gs.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      for ((id, gs) <- perDoc) {
        val novel = gs.count(g => firstOf(g) == id)
        assert(got(id) == ((gs.size.toLong, novel.toLong)),
          s"doc $id: got ${got(id)} want (${gs.size}, $novel)")
      }
      assert(got.values.map(_._2).sum == firstOf.size,
        "corpus novelty budget broke")
    }
  }

  test("prefix-sum offsets: zero at the head and each row's offset is " +
    "the previous offset plus the previous value, for ragged shard " +
    "counts") {
    val valsGen = Gen.listOfN(30, Gen.chooseNum(0L, 9L))
    forAll(valsGen, Gen.oneOf(1, 3, 7)) { (vs, shards) =>
      val d = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val got = operators.Ranking
        .globalPrefixSum(d, Seq(col("id").asc), col("v"), "off", shards)
        .select("id", "v", "off").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      got.headOption.foreach { case (_, _, off0) => assert(off0 == 0L) }
      got.sliding(2).foreach {
        case Array((_, pv, po), (_, _, co)) =>
          assert(co == po + pv, s"adjacency broke: $po + $pv != $co")
        case _ =>
      }
    }
  }
}
