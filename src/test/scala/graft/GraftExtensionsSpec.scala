package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The injected SQL functions must resolve and agree with the Column API.
  * Needs its own session (extensions bind at session build).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // Every suite builds through GraftSession, so getOrCreate returns a
  // session with the graft functions registered; the assume() guards
  // below make the dependency explicit if that ever changes.
  private lazy val spark: SparkSession =
    GraftSession.builder().appName("graft-ext-test").getOrCreate()

  test("simhash64 / minhash_signature / cosine_sim resolve in SQL") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"))
    assume(hasExt, "extensions not active on the shared session")
    Seq(("a b c d", Array(1.0f, 0.0f), Array(1.0f, 0.0f)))
      .toDF("text", "va", "vb").createOrReplaceTempView("ext_t")
    val r = spark.sql(
      """SELECT simhash64(text) AS sh,
        |       minhash_signature(text, 3, 8) AS sig,
        |       cosine_sim(va, vb) AS cs
        |FROM ext_t""".stripMargin).collect()(0)
    assert(r.getLong(0) != 0L)
    assert(r.getSeq[Long](1).length == 8)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    // SQL result equals Column-API result
    val viaCol = spark.table("ext_t")
      .select(functions.SketchFunctions.simhash64($"text")).collect()(0).getLong(0)
    assert(r.getLong(0) == viaCol)
  }

  test("word_shingles / rolling_hash_31 / char_ngrams resolve in SQL " +
    "and agree with the Column API") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"))
    assume(hasExt, "extensions not active on the shared session")
    Seq("the quick brown fox", "héllo wörld a b")
      .toDF("text").createOrReplaceTempView("ext_text_t")
    val got = spark.sql(
      """SELECT word_shingles(text, 2) AS ws,
        |       rolling_hash_31(text) AS rh,
        |       char_ngrams(text, 3) AS cg
        |FROM ext_text_t""".stripMargin).collect()
    val viaCol = spark.table("ext_text_t").select(
      operators.Dedup.shingles($"text", 2).as("ws"),
      operators.TextAnalysis.rollingHash($"text").as("rh"),
      operators.Dedup.charNgrams($"text", 3).as("cg")).collect()
    got.zip(viaCol).foreach { case (a, b) =>
      assert(a.getSeq[String](0) == b.getSeq[String](0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getSeq[String](2) == b.getSeq[String](2))
    }
    assert(got(0).getSeq[String](0) ==
      Seq("the quick", "quick brown", "brown fox"))
  }

  test("winnow_fingerprints resolves in SQL and agrees with the " +
    "Column API") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(
        "winnow_fingerprints"))
    assume(hasExt, "extensions not active on the shared session")
    Seq("the quick brown fox jumps over the lazy dog", "a b", "")
      .toDF("text").createOrReplaceTempView("ext_winnow_t")
    val got = spark.sql(
      "SELECT winnow_fingerprints(text, 3, 4) AS fp FROM ext_winnow_t")
      .collect().map(_.getSeq[Long](0))
    val viaCol = spark.table("ext_winnow_t").select(
      functions.SketchFunctions.winnowFingerprints($"text", 3, 4).as("fp"))
      .collect().map(_.getSeq[Long](0))
    got.zip(viaCol).foreach { case (a, b) => assert(a == b) }
    assert(got(0).nonEmpty && got(2).isEmpty)
  }

  test("classifier_margin resolves in SQL with a literal weight array " +
    "and agrees with the Column API, both hash families; non-literal " +
    "weights refuse loudly") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(
        "classifier_margin"))
    assume(hasExt, "extensions not active on the shared session")
    Seq("the quick brown fox", "solo", "a  b ", "")
      .toDF("text").createOrReplaceTempView("ext_clf_t")
    val wSql = (0 until 8).map(j => (j / 8.0 - 0.3).toString)
      .mkString("array(", ", ", ")")
    val w = (0 until 8).map(j => j / 8.0 - 0.3)
    for (fast <- Seq(false, true)) {
      val got = spark.sql(
        s"SELECT classifier_margin(text, $wSql, -0.1, $fast) AS m " +
          "FROM ext_clf_t").collect().map(_.getDouble(0))
      val viaCol = spark.table("ext_clf_t").select(
        functions.SketchFunctions
          .classifierMargin($"text", w, -0.1, fast).as("m"))
        .collect().map(_.getDouble(0))
      got.zip(viaCol).foreach { case (a, b) =>
        assert(a == b, s"fast=$fast: SQL $a != Column $b") }
    }
    val e = intercept[Exception] {
      spark.sql(
        "SELECT classifier_margin(text, array(length(text) * 1.0), 0.0)" +
          " FROM ext_clf_t").collect()
    }
    assert(e.getMessage.contains("foldable literal"), e.getMessage)
    // a foldable-but-non-boolean 4th arg gets the same loud require as
    // every sibling argument, not a raw ClassCastException
    val e2 = intercept[Exception] {
      spark.sql(
        s"SELECT classifier_margin(text, $wSql, 0.0, 1) FROM ext_clf_t")
        .collect()
    }
    assert(e2.getMessage.contains("literal boolean"), e2.getMessage)
  }

  test("char_split resolves in SQL and matches the per-index substr " +
    "formula it replaced (code points, not bytes)") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("char_split"))
    assume(hasExt, "extensions not active on the shared session")
    Seq("abc", "héllo", "字Ω", "", "a").toDF("w")
      .createOrReplaceTempView("ext_split_t")
    val got = spark.sql(
      "SELECT char_split(w) AS cs FROM ext_split_t").collect()
    val want = spark.table("ext_split_t").select(
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.length($"w") >= 1,
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.lit(1),
            org.apache.spark.sql.functions.length($"w")),
          i => $"w".substr(i, org.apache.spark.sql.functions.lit(1))))
        .otherwise(org.apache.spark.sql.functions.array())
        .as("cs")).collect()
    got.zip(want).foreach { case (a, b) =>
      assert(a.getSeq[String](0) == b.getSeq[String](0)) }
  }

  test("image_header_meta resolves in SQL and agrees with the Column " +
    "API on real and malformed payloads") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(
        "image_header_meta"))
    assume(hasExt, "extensions not active on the shared session")
    val png = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a,
      0x1a, 0x0a, 0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt,
      'R'.toInt, 0, 0, 0, 7, 0, 0, 0, 5, 8, 6, 0, 0, 0, 1, 2, 3, 4)
      .map(_.toByte)
    Seq((1L, png), (2L, Array[Byte](9, 9)), (3L, null))
      .toDF("i", "p").createOrReplaceTempView("ext_imghdr_t")
    val got = spark.sql(
      "SELECT i, image_header_meta(p) AS m FROM ext_imghdr_t ORDER BY i")
      .collect()
    val want = spark.table("ext_imghdr_t")
      .select($"i", graft.functions.SketchFunctions
        .imageHeaderMeta($"p").as("m"))
      .orderBy("i").collect()
    got.zip(want).foreach { case (a, b) =>
      assert(a.isNullAt(1) == b.isNullAt(1))
      if (!a.isNullAt(1)) assert(a.getLong(1) == b.getLong(1))
    }
    assert(got(0).getLong(1) ==
      ((1L << 56) | (8L << 48) | (7L << 24) | 5L))
    assert(got(1).getLong(1) == -1L)
    assert(got(2).isNullAt(1))
  }

  test("media_header_meta resolves in SQL and agrees with the Column " +
    "API across all four formats and malformed payloads") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(
        "media_header_meta"))
    assume(hasExt, "extensions not active on the shared session")
    val gif = ("GIF89a".map(_.toInt) ++ Seq(
      0x07, 0x00, 0x05, 0x00, 0x70, 0x00, 0x00)).map(_.toByte).toArray
    val wav = ("RIFF".map(_.toInt) ++ Seq(0x24, 0, 0, 0) ++
      "WAVE".map(_.toInt) ++ "fmt ".map(_.toInt) ++ Seq(
      0x10, 0, 0, 0, 0x01, 0, 0x02, 0, 0x44, 0xac, 0, 0,
      0x10, 0xb1, 0x02, 0, 0x04, 0, 0x10, 0) ++
      "data".map(_.toInt) ++ Seq(0, 0, 0, 0)).map(_.toByte).toArray
    val png = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a,
      0x1a, 0x0a, 0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt,
      'R'.toInt, 0, 0, 0, 7, 0, 0, 0, 5, 8, 6, 0, 0, 0, 1, 2, 3, 4)
      .map(_.toByte)
    Seq((1L, gif), (2L, wav), (3L, png), (4L, Array[Byte](9, 9)),
      (5L, null))
      .toDF("i", "p").createOrReplaceTempView("ext_mediahdr_t")
    val got = spark.sql(
      "SELECT i, media_header_meta(p) AS m FROM ext_mediahdr_t ORDER BY i")
      .collect()
    val want = spark.table("ext_mediahdr_t")
      .select($"i", graft.functions.SketchFunctions
        .mediaHeaderMeta($"p").as("m"))
      .orderBy("i").collect()
    got.zip(want).foreach { case (a, b) =>
      assert(a.isNullAt(1) == b.isNullAt(1))
      if (!a.isNullAt(1)) assert(a.getLong(1) == b.getLong(1))
    }
    assert(got(0).getLong(1) ==
      ((3L << 56) | (8L << 48) | (7L << 24) | 5L))
    assert(got(1).getLong(1) ==
      ((4L << 56) | (16L << 48) | (44100L << 24) | 2L))
    assert(got(2).getLong(1) ==
      ((1L << 56) | (8L << 48) | (7L << 24) | 5L))
    assert(got(3).getLong(1) == -1L)
    assert(got(4).isNullAt(1))
  }

  test("dense_vec_norm2 resolves in SQL and agrees with the Column API") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(
        "dense_vec_norm2"))
    assume(hasExt, "extensions not active on the shared session")
    Seq((1L, Seq((0, 3L), (2, -4L))), (2L, Seq.empty[(Int, Long)]),
        (3L, null.asInstanceOf[Seq[(Int, Long)]]))
      .toDF("i", "p")
      .select($"i", $"p".cast("array<struct<b:int,w:bigint>>").as("p"))
      .createOrReplaceTempView("ext_dvn_t")
    val got = spark.sql(
      """SELECT i, dense_vec_norm2(p, 4) AS d FROM ext_dvn_t ORDER BY i""")
      .select($"i", $"d".getField("vec").as("v"),
        $"d".getField("n2").as("n2")).collect()
    val want = spark.table("ext_dvn_t")
      .select($"i", graft.functions.VectorFunctions
        .denseVecNorm2($"p", 4).as("d"))
      .select($"i", $"d".getField("vec").as("v"),
        $"d".getField("n2").as("n2"))
      .orderBy("i").collect()
    got.zip(want).foreach { case (a, b) =>
      assert(a.isNullAt(1) == b.isNullAt(1))
      if (!a.isNullAt(1)) {
        assert(a.getSeq[Double](1) == b.getSeq[Double](1))
        assert(a.getDouble(2) == b.getDouble(2))
      }
    }
    assert(got(0).getSeq[Double](1) == Seq(3.0, 0.0, -4.0, 0.0) &&
      got(0).getDouble(2) == 25.0)
    assert(got(1).getSeq[Double](1) == Seq(0.0, 0.0, 0.0, 0.0))
    assert(got(2).isNullAt(1))
    // dim-argument surface: a BIGINT literal works (no
    // ClassCastException), a non-literal dim and an out-of-range dim
    // fail with the real message, not an unbound-reference eval error
    assert(spark.sql(
        "SELECT dense_vec_norm2(p, CAST(4 AS BIGINT)).n2 AS n2 " +
          "FROM ext_dvn_t WHERE i = 1").collect()(0).getDouble(0) == 25.0)
    val eNonLit = intercept[Exception](spark.sql(
      "SELECT dense_vec_norm2(p, CAST(i AS INT)) FROM ext_dvn_t"))
    assert(eNonLit.getMessage.contains("integer literal"),
      eNonLit.getMessage)
    val eRange = intercept[Exception](spark.sql(
      "SELECT dense_vec_norm2(p, 0) FROM ext_dvn_t"))
    assert(eRange.getMessage.contains("[1, 65536]"), eRange.getMessage)
  }

  test("md5_long60 resolves in SQL and agrees with the declarative " +
    "md5 chain") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(
        "md5_long60"))
    assume(hasExt, "extensions not active on the shared session")
    Seq((1L, "hello"), (2L, ""), (3L, "日本語"), (4L, null))
      .toDF("i", "t").createOrReplaceTempView("ext_md560_t")
    val got = spark.sql(
      """SELECT i, md5_long60(t) AS n,
                CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) AS h
         FROM ext_md560_t ORDER BY i""").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2))
      if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(2), r.toString)
    }
    assert(got(3).isNullAt(1))
  }

  test("hyperplane_bucket / nearest_centroid / nearest_centroid_dist " +
    "resolve in SQL with literal plane/centroid families and agree " +
    "with the Column API") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("hyperplane_bucket"))
    assume(hasExt, "extensions not active on the shared session")
    Seq(Array(0.3f, -1.2f, 0.8f), Array(-0.5f, 0.1f, 0.0f),
      Array(2.0f, 2.0f, -3.0f))
      .toDF("vec").createOrReplaceTempView("ext_vec_t")
    // SQL double literals (0.5D) keep the cast exact; the injection also
    // folds decimal literals via the Cast, which plain 0.5 exercises
    val got = spark.sql(
      """SELECT hyperplane_bucket(vec,
        |         array(array(1.0D, 0.0D, 0.0D), array(0.5, -0.5, 2.0))) AS hb,
        |       nearest_centroid(vec,
        |         array(array(0.0D, -1.0D, 1.0D), array(1.0D, 1.0D, -1.0D))) AS nc,
        |       nearest_centroid_dist(vec,
        |         array(array(0.0D, -1.0D, 1.0D), array(1.0D, 1.0D, -1.0D))) AS nd
        |FROM ext_vec_t""".stripMargin).collect()
    val planes = Seq(Seq(1.0, 0.0, 0.0), Seq(0.5, -0.5, 2.0))
    val cents = Seq(0 -> Array(0.0, -1.0, 1.0), 1 -> Array(1.0, 1.0, -1.0))
    val viaCol = spark.table("ext_vec_t").select(
      functions.VectorFunctions.hyperplaneBucket($"vec", planes).as("hb"),
      functions.VectorFunctions.nearestCentroid($"vec", cents).as("nc"),
      functions.VectorFunctions.nearestCentroidDist($"vec", cents).as("nd"))
      .collect()
    got.zip(viaCol).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getInt(1) == b.getInt(1))
      assert(a.getStruct(2) == b.getStruct(2))
    }
    // both cells appear across the probe vectors (the family is real)
    assert(got.map(_.getInt(1)).toSet == Set(0, 1))
  }

  test("mat_vec_project resolves in SQL with a literal matrix and " +
    "scale, agreeing with the Column API; non-literal scale refuses") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(
        "mat_vec_project"))
    assume(hasExt, "extensions not active on the shared session")
    Seq(Array(0.3f, -1.2f, 0.8f), Array(-0.5f, 0.1f, 0.0f))
      .toDF("vec").createOrReplaceTempView("ext_mvp_t")
    val got = spark.sql(
      """SELECT mat_vec_project(vec,
        |         array(array(1.0D, -1.0D, 1.0D), array(-1.0D, 1.0D, 1.0D)),
        |         0.5D) AS p
        |FROM ext_mvp_t""".stripMargin).collect()
    val rows = Seq(Seq(1.0, -1.0, 1.0), Seq(-1.0, 1.0, 1.0))
    val viaCol = spark.table("ext_mvp_t").select(
      functions.VectorFunctions.matVecProject($"vec", rows, 0.5).as("p"))
      .collect()
    got.zip(viaCol).foreach { case (a, b) =>
      assert(a.getSeq[Float](0) == b.getSeq[Float](0))
    }
    assert(got(0).getSeq[Float](0).length == 2)
    val e = intercept[Exception](spark.sql(
      """SELECT mat_vec_project(vec,
        |  array(array(1.0D)), CAST(vec[1] AS DOUBLE)) FROM ext_mvp_t"""
        .stripMargin))
    assert(e.getMessage.contains("literal"), e.getMessage)
    // a mistyped child (array<int>) fails ANALYSIS instead of silently
    // reading int bits as floats (ADVICE r20: evalProject's
    // getFloat/getDouble would emit garbage projections)
    Seq(Array(1, 2, 3)).toDF("ivec").createOrReplaceTempView("ext_mvp_i")
    val te = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      """SELECT mat_vec_project(ivec,
        |  array(array(1.0D, 1.0D, 1.0D)), 1.0D) FROM ext_mvp_i"""
        .stripMargin).collect())
    assert(te.getMessage.contains("array<float>") ||
      te.getMessage.contains("DATATYPE_MISMATCH"), te.getMessage)
  }

  test("nearest_cells resolves in SQL with a literal centroid family " +
    "and literal k, agreeing with the Column API") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("nearest_cells"))
    assume(hasExt, "extensions not active on the shared session")
    Seq(Array(0.3f, -1.2f, 0.8f), Array(-0.5f, 0.1f, 0.0f))
      .toDF("vec").createOrReplaceTempView("ext_cells_t")
    val got = spark.sql(
      """SELECT nearest_cells(vec,
        |         array(array(0.0D, -1.0D, 1.0D), array(1.0D, 1.0D, -1.0D),
        |               array(0.0D, 0.0D, 0.0D)), 2) AS cells
        |FROM ext_cells_t""".stripMargin).collect()
    val cents = Seq(0 -> Array(0.0, -1.0, 1.0), 1 -> Array(1.0, 1.0, -1.0),
      2 -> Array(0.0, 0.0, 0.0))
    val viaCol = spark.table("ext_cells_t").select(
      functions.VectorFunctions.nearestCells($"vec", cents, 2).as("cells"))
      .collect()
    got.zip(viaCol).foreach { case (a, b) =>
      assert(a.getSeq[Int](0) == b.getSeq[Int](0))
      assert(a.getSeq[Int](0).size == 2)
    }
  }

  test("batch_merge_pairs resolves in SQL with a literal pair batch, " +
    "agrees with the Column API, and rejects a conflicting batch") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("batch_merge_pairs"))
    assume(hasExt, "extensions not active on the shared session")
    Seq(Seq("t", "h", "e", "t", "a"), Seq("h", "t", "h", "h"))
      .toDF("syms").createOrReplaceTempView("ext_bpe_t")
    val got = spark.sql(
      """SELECT batch_merge_pairs(syms,
        |         array(array('t', 'h'), array('e', 'a'))) AS m
        |FROM ext_bpe_t""".stripMargin).collect()
    val viaCol = spark.table("ext_bpe_t").select(
      functions.BpeFunctions.batchMergePairs($"syms",
        Seq("t" -> "h", "e" -> "a")).as("m")).collect()
    got.zip(viaCol).foreach { case (a, b) =>
      assert(a.getSeq[String](0) == b.getSeq[String](0)) }
    assert(got(0).getSeq[String](0) == Seq("th", "e", "t", "a"))
    // the constructor's non-conflict invariant must fire through the SQL
    // path too, at analysis, not produce silent drift
    val conflict = intercept[Exception] {
      spark.sql("""SELECT batch_merge_pairs(syms,
        array(array('a', 'b'), array('b', 'c'))) AS m FROM ext_bpe_t""")
        .collect()
    }
    assert(conflict.getMessage.contains("non-conflicting") ||
      Option(conflict.getCause)
        .exists(_.getMessage.contains("non-conflicting")))
    // a non-literal family cannot bind instance data — loud rejection
    val nonLit = intercept[Exception] {
      spark.sql("""SELECT batch_merge_pairs(syms,
        array(array(syms[0], 'x'))) AS m FROM ext_bpe_t""").collect()
    }
    assert(nonLit.getMessage.contains("foldable") ||
      Option(nonLit.getCause).exists(_.getMessage.contains("foldable")))
  }

  test("approx_top_k_ss aggregate resolves in SQL") {
    import spark.implicits._
    val hasExt = spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("approx_top_k_ss"))
    assume(hasExt, "extensions not active on the shared session")
    Seq("a", "a", "b").toDF("v").createOrReplaceTempView("ext_agg_t")
    val r = spark.sql(
      "SELECT approx_top_k_ss(v, 2, 8) AS t FROM ext_agg_t").collect()(0)
    val rows = r.getSeq[org.apache.spark.sql.Row](0)
    assert(rows.map(x => (x.getString(0), x.getLong(1))) ==
      Seq(("a", 2L), ("b", 1L)))
  }
}
