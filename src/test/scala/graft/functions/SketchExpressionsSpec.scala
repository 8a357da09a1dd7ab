package graft.functions

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The native one-pass sketch expressions must be bit-identical to their
  * higher-order-function executable specs in Dedup.
  */
class SketchExpressionsSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .filter(col("doc_id") < 100)

  test("SimHash64 expression equals the HOF spec on real documents") {
    val diff = docs.select(
      Dedup.simhash(col("text")).as("spec"),
      SketchFunctions.simhash64(col("text")).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(diff == 0)
  }

  test("SimHashMd5_60 expression equals the HOF spec on real documents") {
    val diff = docs.select(
      Dedup.simhashMd5(col("text")).as("spec"),
      SketchFunctions.simhashMd5_60(col("text")).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(diff == 0)
  }

  test("SimHashMd5_60 parity on non-ASCII, multi-space, and degenerate " +
    "input; single-token fold equals conv(substr(md5,1,15),16,10)") {
    import spark.implicits._
    val df = Seq("é a b c", "漢字 の テスト です ね", "😀 emoji 😀 tokens",
      "mixé ascii ünd ützìl tøkens here", "a  b", " a b ", "   ", "solo")
      .toDF("text")
    val diff = df.select(
      Dedup.simhashMd5(col("text")).as("spec"),
      SketchFunctions.simhashMd5_60(col("text")).as("native"))
      .filter(!(col("spec") <=> col("native"))).count()
    assert(diff == 0)
    // one token -> votes are exactly that token's hash bits, so the
    // signature IS the 60-bit md5-prefix value — the same
    // conv(substr(md5(tok),1,15),16,10) fold the x07 DuckDB oracle runs
    val r = Seq("héllo wörld".replace(" ", ""), "hello").toDF("text")
      .select(SketchFunctions.simhashMd5_60(col("text")).as("sig"),
        conv(substring(md5(col("text")), 1, 15), 16, 10)
          .cast("long").as("fold")).collect()
    r.foreach(row => assert(row.getLong(0) == row.getLong(1)))
  }

  test("MinHashSignature expression equals the HOF spec on real documents") {
    val diff = docs.select(
      Dedup.minhashSignatureHof(col("text"), 3, 32).as("spec"),
      SketchFunctions.minhashSignature(col("text"), 3, 32).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(diff == 0)
  }

  test("ShingleHashSet: Jaccard over hash sets equals Jaccard over " +
    "string shingle sets on real documents") {
    // cross a 40-doc slice with itself: every pair's hash-set Jaccard
    // must equal the string-set Jaccard (64-bit collisions would differ)
    val sl = docs.filter(col("doc_id") < 40)
    val a = sl.select(col("doc_id").as("ia"), col("text").as("ta"))
    val b = sl.select(col("doc_id").as("ib"), col("text").as("tb"))
    val diff = a.crossJoin(b)
      .select(
        Dedup.setJaccard(
          SketchFunctions.shingleHashSet(col("ta"), 3),
          SketchFunctions.shingleHashSet(col("tb"), 3)).as("hashj"),
        Dedup.setJaccard(
          array_distinct(Dedup.shingles(col("ta"), 3)),
          array_distinct(Dedup.shingles(col("tb"), 3))).as("strj"))
      .filter(col("hashj") =!= col("strj")).count()
    assert(diff == 0)
  }

  test("ShingleHashSet: set size matches distinct string shingles; " +
    "empty below k; sorted ascending") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "x x x x x", "a  b c").toDF("text")
    val rows = df.select(
      SketchFunctions.shingleHashSet(col("text"), 3).as("hs"),
      size(array_distinct(Dedup.shingles(col("text"), 3))).as("n"))
      .collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      assert(hs.length == r.getInt(1))
      assert(hs == hs.sorted)
    }
  }

  test("parity holds on NON-ASCII text (byte-offset shingling must not " +
    "mis-slice multi-byte code points)") {
    import spark.implicits._
    // 2-4 byte UTF-8 code points around every boundary the scanners use
    val df = Seq(
      "é a b c", "a é b c d", "漢字 の テスト です ね",
      "mixé ascii ünd ützìl tøkens here", "😀 emoji 😀 tokens 😀 too")
      .toDF("text")
    val sh = df.select(
      Dedup.simhash(col("text")).as("spec"),
      SketchFunctions.simhash64(col("text")).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(sh == 0)
    val mh = df.select(
      Dedup.minhashSignatureHof(col("text"), 2, 8).as("spec"),
      SketchFunctions.minhashSignature(col("text"), 2, 8).as("native"))
      .filter(!(col("spec") <=> col("native"))).count()
    assert(mh == 0)
    val a = df.select(col("text").as("ta"))
    val b = df.select(col("text").as("tb"))
    val sj = a.crossJoin(b).select(
      Dedup.setJaccard(
        SketchFunctions.shingleHashSet(col("ta"), 2),
        SketchFunctions.shingleHashSet(col("tb"), 2)).as("hashj"),
      Dedup.setJaccard(
        array_distinct(Dedup.shingles(col("ta"), 2)),
        array_distinct(Dedup.shingles(col("tb"), 2))).as("strj"))
      .filter(!(col("hashj") <=> col("strj"))).count()
    assert(sj == 0)
  }

  test("parity holds on degenerate whitespace (empty tokens skipped)") {
    import spark.implicits._
    val df = Seq("a  b", " a b ", "a b  c", "   ").toDF("text")
    val diff = df.select(
      Dedup.simhash(col("text")).as("spec"),
      SketchFunctions.simhash64(col("text")).as("native"))
      .filter(col("spec") =!= col("native")).count()
    assert(diff == 0)
    val mh = df.select(
      Dedup.minhashSignatureHof(col("text"), 2, 8).as("spec"),
      SketchFunctions.minhashSignature(col("text"), 2, 8).as("native"))
      .filter(!(col("spec") <=> col("native"))).count()
    assert(mh == 0)
  }

  test("null and short-text behavior") {
    import spark.implicits._
    val df = Seq(Some("a b"), None, Some("a b c d")).toDF("text")
    val r = df.select(
      SketchFunctions.minhashSignature(col("text"), 3, 8).as("sig"),
      SketchFunctions.simhash64(col("text")).as("sh")).collect()
    assert(r(0).isNullAt(0)) // 2 tokens < k=3
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
    assert(!r(2).isNullAt(0) && r(2).getSeq[Long](0).length == 8)
  }

  test("WordShingles equals the declarative HOF formula on real docs " +
    "and adversarial whitespace (the formula it replaced as Dedup." +
    "shingles' implementation)") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // the superseded declarative formula, kept here as the executable spec
    def hofShingles(text: Column, k: Int): Column = {
      val ts = split(text, " ")
      when(size(ts) >= k,
        transform(sequence(lit(0), size(ts) - k),
          i => array_join(slice(ts, i + 1, lit(k)), " ")))
        .otherwise(array().cast(ArrayType(StringType)))
    }
    import spark.implicits._
    val adversarial = Seq("a b c d e", "a  b c", "a b ", " a b", "", "x",
      "héllo wörld déjà vu", "a\tb c d", "  ", "one").toDF("text")
    for (k <- Seq(1, 2, 3, 4)) {
      for (frame <- Seq(adversarial, docs.select(col("text")))) {
        val got = frame.select(
          Dedup.shingles(col("text"), k).as("g"),
          hofShingles(col("text"), k).as("w")).collect()
        got.foreach { r =>
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"k=$k diverged: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
        }
      }
    }
    // null text: empty array, not null (the when/otherwise behavior)
    val onNull = Seq(Option.empty[String]).toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("g")).collect()(0)
    assert(!onNull.isNullAt(0) && onNull.getSeq[String](0).isEmpty)
  }

  test("RollingHash31 and CharNgrams equal the declarative formulas " +
    "they replaced — real docs, non-ASCII, supplementary planes, " +
    "degenerate whitespace, null") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // the superseded declarative formulas, kept as executable specs
    def hofRolling(text: Column): Column =
      when(length(text) === 0, lit(0L))
        .otherwise(aggregate(
          transform(sequence(lit(1), length(text)),
            i => ascii(text.substr(i, lit(1))).cast("long")),
          lit(0L),
          (acc, c) => pmod(acc * 31L + c, lit(2147483647L))))
    def hofNgrams(text: Column, n: Int): Column =
      when(length(text) >= n,
        array_distinct(transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n)))))
        .otherwise(array().cast(ArrayType(StringType)))
    import spark.implicits._
    // seeded pseudo-random fuzz over a mixed alphabet (spaces, ASCII,
    // accents, CJK, a supplementary-plane emoji) — 200 strings of
    // length 0-40, deterministic across runs
    val rnd = new scala.util.Random(42)
    // string units, not chars — keeps the emoji's surrogate pair intact
    val alphabet = Seq("a", "b", " ", "c", "é", "ö", "日", "😀", "x", " ")
    val fuzz = (0 until 200).map { _ =>
      Seq.fill(rnd.nextInt(41))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    }
    val adversarial = (Seq("hello world", "héllo wörld", "日本語のテキスト",
      "a😀b😀a😀b", "  ", "", "x", "aaaa", "ab ab ab") ++ fuzz).toDF("text")
    // CharSplit rides the same fuzz: its declarative twin is the
    // per-index substr enumeration it replaced in Bpe.initSymbols
    def hofSplit(text: Column): Column =
      when(length(text) >= 1,
        transform(sequence(lit(1), length(text)),
          i => text.substr(i, lit(1))))
        .otherwise(array().cast(ArrayType(StringType)))
    for (frame <- Seq(adversarial, docs.select(col("text")))) {
      val got = frame.select(
        Dedup.charNgrams(col("text"), 3).as("gN"),
        hofNgrams(col("text"), 3).as("gH"),
        graft.operators.TextAnalysis.rollingHash(col("text")).as("rN"),
        hofRolling(col("text")).as("rH"),
        graft.functions.BpeFunctions.charSplit(col("text")).as("sN"),
        hofSplit(col("text")).as("sH")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"ngrams diverged: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
        assert(r.getLong(2) == r.getLong(3),
          s"rolling hash diverged: ${r.getLong(2)} vs ${r.getLong(3)}")
        assert(r.getSeq[String](4) == r.getSeq[String](5),
          s"char split diverged: ${r.getSeq[String](4)} vs ${r.getSeq[String](5)}")
      }
    }
    // null text: ngrams empty array, rolling hash NULL (both formulas)
    val onNull = Seq(Option.empty[String]).toDF("text").select(
      Dedup.charNgrams(col("text"), 3).as("g"),
      graft.operators.TextAnalysis.rollingHash(col("text")).as("r"))
      .collect()(0)
    assert(!onNull.isNullAt(0) && onNull.getSeq[String](0).isEmpty)
    assert(onNull.isNullAt(1))
  }

  test("md5_long60 equals its declarative twin conv(substring(md5)) " +
    "on the fuzz corpus, the real corpus, and null") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val alphabet = Seq("a", "b", " ", "c", "é", "ö", "日", "😀", "x")
    val fuzz = (0 until 200).map { _ =>
      Seq.fill(rnd.nextInt(33))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    }
    val frames = Seq(
      (Seq("", "x", "hello", "日本語", "a😀b") ++ fuzz).toDF("text"),
      docs.select(col("text")))
    for (frame <- frames) {
      frame.select(
          SketchFunctions.md5Long60(col("text")).as("n"),
          conv(substring(md5(col("text")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .collect().foreach(r =>
          assert(r.getLong(0) == r.getLong(1),
            s"md5_long60 diverged: ${r.getLong(0)} vs ${r.getLong(1)}"))
    }
    val onNull = Seq(Option.empty[String]).toDF("text")
      .select(SketchFunctions.md5Long60(col("text"))).collect()(0)
    assert(onNull.isNullAt(0))
    // non-negative by construction (60 bits in a signed 64-bit long)
    assert(frames.head.select(min(SketchFunctions.md5Long60(col("text"))))
      .collect()(0).getLong(0) >= 0L)
  }

  test("simhash of single-token text is that token's hash bits sign") {
    import spark.implicits._
    val r = Seq("hello").toDF("text")
      .select(SketchFunctions.simhash64(col("text")),
        xxhash64(col("text"))).collect()(0)
    // with one token, votes are the token's bits: simhash == token hash
    assert(r.getLong(0) == r.getLong(1))
  }

  // ---- image_header_meta: real container bytes ----------------------

  /** The canonical 1x1 RGBA PNG file prefix — real bytes, real CRC
    * (1F15C489 is the correct CRC32 of that IHDR), public knowledge.
    */
  private val png1x1: Array[Byte] = Array(
    0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
    0, 0, 0, 13, 'I', 'H', 'D', 'R',
    0, 0, 0, 1, 0, 0, 0, 1,
    8, 6, 0, 0, 0, 0x1f, 0x15, 0xc4, 0x89).map(_.toByte)

  /** A minimal baseline JPEG header: SOI, JFIF APP0, a 67-byte DQT
    * segment (contents irrelevant to the header walk), then a
    * 1-component SOF0 with height 2 / width 3 — the segment layout of
    * the classic smallest-JPEG fixture.
    */
  private val jpegMin: Array[Byte] = (Seq(
    0xff, 0xd8,
    0xff, 0xe0, 0x00, 0x10, 'J'.toInt, 'F'.toInt, 'I'.toInt, 'F'.toInt,
    0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
    0xff, 0xdb, 0x00, 0x43, 0x00) ++ Seq.fill(64)(0) ++ Seq(
    0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x02, 0x00, 0x03, 0x01,
    0x01, 0x11, 0x00)).map(_.toByte).toArray

  private def meta(b: Array[Byte]): Long = Sketches.imageHeaderMeta(b)
  private def unpack(m: Long): (Long, Long, Long, Long) =
    (m >> 56, (m >> 48) & 0xff, (m >> 24) & 0xffffff, m & 0xffffff)

  test("imageHeaderMeta reads real PNG IHDR and real JPEG SOF bytes") {
    assert(unpack(meta(png1x1)) == ((1L, 8L, 1L, 1L)))
    assert(unpack(meta(jpegMin)) == ((2L, 8L, 3L, 2L)))
    // trailing garbage after a complete header parses identically
    assert(meta(png1x1 ++ Array[Byte](1, 2, 3)) == meta(png1x1))
    assert(meta(jpegMin ++ Array[Byte](0x12, 0x34)) == meta(jpegMin))
  }

  test("imageHeaderMeta walks fill bytes, standalone markers and " +
    "progressive SOF2; rejects EOI/SOS before any SOF") {
    def jpeg(mid: Seq[Int]): Array[Byte] =
      (Seq(0xff, 0xd8) ++ mid).map(_.toByte).toArray
    val sof = Seq(0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x01, 0x00, 0x01,
      0x01, 0x01, 0x11, 0x00)
    // fill bytes before the marker (T.81 B.1.1.2)
    assert(unpack(meta(jpeg(Seq(0xff, 0xff) ++ sof))) == ((2L, 8L, 1L, 1L)))
    // TEM and RSTn are standalone: no length field to skip
    assert(unpack(meta(jpeg(Seq(0xff, 0x01) ++ sof))) == ((2L, 8L, 1L, 1L)))
    assert(unpack(meta(jpeg(Seq(0xff, 0xd3) ++ sof))) == ((2L, 8L, 1L, 1L)))
    // progressive SOF2 carries dimensions in the same layout
    val sof2 = sof.updated(1, 0xc2)
    assert(unpack(meta(jpeg(sof2))) == ((2L, 8L, 1L, 1L)))
    // DHT (C4) is NOT a frame header despite sitting in C0-CF
    assert(unpack(meta(jpeg(Seq(0xff, 0xc4, 0x00, 0x02) ++ sof)))
      == ((2L, 8L, 1L, 1L)))
    assert(meta(jpeg(Seq(0xff, 0xd9))) == -1L) // EOI before SOF
    assert(meta(jpeg(Seq(0xff, 0xda, 0x00, 0x02))) == -1L) // SOS before SOF
    assert(meta(jpeg(Seq(0x00, 0xc0))) == -1L) // marker without 0xFF
    assert(meta(jpeg(Seq(0xff, 0xe0, 0x00, 0x01))) == -1L) // len < 2
  }

  test("imageHeaderMeta rejects malformed PNG structure") {
    def mut(i: Int, v: Int): Array[Byte] = {
      val c = png1x1.clone(); c(i) = v.toByte; c
    }
    assert(meta(mut(0, 0x00)) == -1L) // broken signature
    assert(meta(mut(11, 14)) == -1L) // IHDR length != 13
    assert(meta(mut(12, 'J')) == -1L) // first chunk not IHDR
    assert(meta(mut(19, 0)) == -1L) // width 0
    assert(meta(mut(23, 0)) == -1L) // height 0
    assert(meta(mut(16, 0x01)) == -1L) // width 2^24: exceeds pack field
    assert(meta(Array[Byte]()) == -1L)
    assert(meta("not an image at all".getBytes("UTF-8")) == -1L)
  }

  test("imageHeaderMeta never throws on truncations, and any " +
    "non-sentinel prefix parse equals the full parse") {
    for (fix <- Seq(png1x1, jpegMin); n <- 0 until fix.length) {
      val m = meta(java.util.Arrays.copyOfRange(fix, 0, n))
      assert(m == -1L || m == meta(fix),
        s"prefix $n of ${fix.length} parsed to a DIFFERENT value")
    }
  }

  // ---- media_header_meta: GIF + WAV on top of the image layouts -----

  /** GIF89a signature + 7-byte logical screen descriptor: 7x5,
    * colour resolution 8 bits ((8-1)<<4 = 0x70).
    */
  private val gifMin: Array[Byte] = ("GIF89a".map(_.toInt) ++ Seq(
    0x07, 0x00, 0x05, 0x00, 0x70, 0x00, 0x00)).map(_.toByte).toArray

  /** RIFF/WAVE with a 5-byte (ODD) LIST chunk before the 16-byte PCM
    * fmt chunk — stereo 44.1 kHz 16-bit; the odd size forces the
    * even-alignment skip.
    */
  private val wavMin: Array[Byte] = ("RIFF".map(_.toInt) ++
    Seq(0x33, 0x00, 0x00, 0x00) ++ "WAVE".map(_.toInt) ++
    "LIST".map(_.toInt) ++ Seq(0x05, 0x00, 0x00, 0x00) ++
    Seq(0x69, 0x69, 0x69, 0x69, 0x69, 0x00) ++ // 5 bytes + align pad
    "fmt ".map(_.toInt) ++ Seq(
    0x10, 0x00, 0x00, 0x00, 0x01, 0x00, 0x02, 0x00,
    0x44, 0xac, 0x00, 0x00, 0x10, 0xb1, 0x02, 0x00,
    0x04, 0x00, 0x10, 0x00) ++
    "data".map(_.toInt) ++ Seq(0x00, 0x00, 0x00, 0x00))
    .map(_.toByte).toArray

  private def mmeta(b: Array[Byte]): Long = Sketches.mediaHeaderMeta(b)

  test("mediaHeaderMeta reads GIF LSD and WAV fmt bytes (little-endian, " +
    "odd-chunk alignment), delegates images, rejects malformed " +
    "structure") {
    assert(unpack(mmeta(gifMin)) == ((3L, 8L, 7L, 5L)))
    assert(unpack(mmeta(wavMin)) == ((4L, 16L, 44100L, 2L)))
    // GIF87a is equally valid; any other version byte is not GIF
    assert(mmeta(gifMin.updated(4, '7'.toByte)) == mmeta(gifMin))
    assert(mmeta(gifMin.updated(4, '8'.toByte)) == -1L)
    // zero dimensions reject (LE: byte 6 is width's low byte)
    assert(mmeta(gifMin.updated(6, 0.toByte)) == -1L)
    assert(mmeta(gifMin.updated(8, 0.toByte)) == -1L)
    // WAV: no fmt chunk before the buffer ends
    assert(mmeta(("RIFF".map(_.toInt) ++ Seq(4, 0, 0, 0) ++
      "WAVE".map(_.toInt)).map(_.toByte).toArray) == -1L)
    // fmt chunk size below WAVEFORMAT's 16 bytes
    val shortFmt = wavMin.clone()
    shortFmt(wavMin.indexOfSlice("fmt ".getBytes) + 4) = 14.toByte
    assert(mmeta(shortFmt) == -1L)
    // zero channels / zero rate / zero bits all reject via the pack
    val fmtOff = wavMin.indexOfSlice("fmt ".getBytes)
    def zeroed(off: Int, n: Int): Array[Byte] = {
      val c = wavMin.clone()
      (0 until n).foreach(j => c(fmtOff + 8 + off + j) = 0)
      c
    }
    assert(mmeta(zeroed(2, 2)) == -1L) // nChannels
    assert(mmeta(zeroed(4, 4)) == -1L) // nSamplesPerSec
    assert(mmeta(zeroed(14, 2)) == -1L) // wBitsPerSample
    // images delegate to imageHeaderMeta bit-for-bit
    assert(mmeta(png1x1) == meta(png1x1))
    assert(mmeta(jpegMin) == meta(jpegMin))
    assert(mmeta("junk".getBytes("UTF-8")) == -1L)
    assert(mmeta(Array[Byte]()) == -1L)
    // trailing garbage after a complete header parses identically
    assert(mmeta(gifMin ++ Array[Byte](1, 2)) == mmeta(gifMin))
    assert(mmeta(wavMin ++ Array[Byte](1, 2)) == mmeta(wavMin))
  }

  test("mediaHeaderMeta never throws on truncations, and any " +
    "non-sentinel prefix parse equals the full parse") {
    for (fix <- Seq(gifMin, wavMin, png1x1, jpegMin);
         n <- 0 until fix.length) {
      val m = mmeta(java.util.Arrays.copyOfRange(fix, 0, n))
      assert(m == -1L || m == mmeta(fix),
        s"prefix $n of ${fix.length} parsed to a DIFFERENT value")
    }
  }

  test("every native's generated code COMPILES and matches interpreted " +
    "eval (Catalyst silently falls back to interpreted eval when " +
    "doGenCode output fails to compile, so DataFrame-level parity " +
    "alone cannot catch a broken doGenCode — GenerateUnsafeProjection " +
    "has no fallback and throws)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String

    val text = BoundReference(0, StringType, nullable = true)
    val strExprs = Seq(
      SimHash64(text), SimHashMd5_60(text), WordShingles(text, 3),
      RollingHash31(text), CharNgrams(text, 3), ShingleHashSet(text, 3),
      MinHashSignature(text, 3, 16), CharSplit(text),
      WinnowFingerprints(text, 3, 4), WinnowFingerprints(text, 1, 1),
      ClassifierMargin(text,
        (0 until 16).map(j => j / 16.0 - 0.4).toIndexedSeq,
        bias = -0.1, fastHash = false),
      ClassifierMargin(text,
        (0 until 16).map(j => j / 16.0 - 0.4).toIndexedSeq,
        bias = -0.1, fastHash = true),
      Md5Long60(text))
    // this line IS the compile assertion: no interpreted fallback here
    val proj = GenerateUnsafeProjection.generate(strExprs)
    def norm(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (a: ArrayData, ArrayType(LongType, _)) => a.toLongArray.toSeq
      case (a: ArrayData, ArrayType(StringType, _)) =>
        a.toObjectArray(StringType).map(String.valueOf).toSeq
      case (other, _) => other
    }
    for (s <- Seq("a b c d e", "", "x", null, "é 字 a b ω", " a  b ",
        "tok " * 40)) {
      val row = InternalRow(
        if (s == null) null else UTF8String.fromString(s))
      val out = proj(row)
      strExprs.zipWithIndex.foreach { case (e, i) =>
        val interp = norm(e.eval(row), e.dataType)
        val gen = if (out.isNullAt(i)) null
          else norm(out.get(i, e.dataType), e.dataType)
        assert(gen == interp, s"${e.prettyName} on ${String.valueOf(s)}")
      }
    }
    // BatchMergePairs takes an array input — same check on its own
    val syms = BoundReference(0, ArrayType(StringType), nullable = true)
    val bm = BatchMergePairs(syms, Seq("a" -> "b", "c" -> "d", "字" -> "ω"))
    val projA = GenerateUnsafeProjection.generate(Seq(bm))
    for (in <- Seq(Seq("a", "b", "c", "d"), Seq("a", "a", "b", "b"),
        Seq("字", "ω", "字"), Seq.empty[String], null)) {
      val row = InternalRow(
        if (in == null) null
        else new GenericArrayData(
          in.map(UTF8String.fromString).toArray[Any]))
      val out = projA(row)
      val interp = norm(bm.eval(row), bm.dataType)
      val gen = if (out.isNullAt(0)) null
        else norm(out.get(0, bm.dataType), bm.dataType)
      assert(gen == interp, s"batch_merge_pairs on $in")
    }
    // ImageHeaderMeta / MediaHeaderMeta take binary input — same check
    val bin = BoundReference(0, BinaryType, nullable = true)
    val ih = ImageHeaderMeta(bin)
    val mh = MediaHeaderMeta(bin)
    val projB = GenerateUnsafeProjection.generate(Seq(ih, mh))
    for (in <- Seq(
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
          0, 0, 0, 13, 'I', 'H', 'D', 'R', 0, 0, 0, 2, 0, 0, 0, 3,
          8, 6, 0, 0, 0, 1, 2, 3, 4),
        Array[Byte](0xff.toByte, 0xd8.toByte),
        gifMin, wavMin,
        Array[Byte](1, 2, 3), Array.empty[Byte], null)) {
      val row = InternalRow(in)
      val out = projB(row)
      Seq(ih, mh).zipWithIndex.foreach { case (e, i) =>
        val interp = e.eval(row)
        val gen = if (out.isNullAt(i)) null else out.get(i, e.dataType)
        assert(gen == interp,
          s"${e.prettyName} on ${String.valueOf(in)}")
      }
    }

    // HyperplaneBucket / NearestCentroid (instance-state families) —
    // double-array input; NearestCentroid also returns null on dim
    // mismatch, exercising its isNull re-check
    val vec = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val hb = HyperplaneBucket(vec,
      Seq(Seq(1.0, -1.0, 0.5), Seq(-0.2, 0.4, 0.1)))
    val nc = NearestCentroid(vec,
      Seq((0, Array(1.0, 2.0, 3.0)), (1, Array(-1.0, -2.0, 0.0))))
    val mv = MatVecProject(vec,
      Seq(Seq(1.0, -1.0, 1.0), Seq(-1.0, 1.0, 1.0)), 0.5)
    val projV = GenerateUnsafeProjection.generate(Seq(hb, nc, mv))
    for (in <- Seq(Seq(1.0, 2.0, 3.0), Seq(-1.0, -2.0, 0.0),
        Seq(0.5), Seq.empty[Double], null)) {
      val row = InternalRow(
        if (in == null) null
        else new GenericArrayData(in.map(Double.box).toArray[Any]))
      val out = projV(row)
      Seq(hb, nc).zipWithIndex.foreach { case (e, i) =>
        val interp = e.eval(row)
        val gen = if (out.isNullAt(i)) null else out.get(i, e.dataType)
        assert(gen == interp, s"${e.prettyName} on $in")
      }
      val mvInterp = mv.eval(row)
      if (out.isNullAt(2)) assert(mvInterp == null, s"mat_vec on $in")
      else assert(out.getArray(2).toFloatArray.toSeq ==
        mvInterp.asInstanceOf[ArrayData].toFloatArray.toSeq,
        s"mat_vec on $in")
    }
    // DenseVecNorm2 takes array<struct<int,long>> input — same check
    val pairsRef = BoundReference(0,
      ArrayType(StructType(Seq(
        StructField("b", IntegerType), StructField("w", LongType)))),
      nullable = true)
    val dvn = graft.functions.DenseVecNorm2(pairsRef, 4)
    val projP = GenerateUnsafeProjection.generate(Seq(dvn))
    def pairsRow(in: Seq[(Int, Long)]): InternalRow = InternalRow(
      if (in == null) null
      else new GenericArrayData(in.map { case (b, w) =>
        InternalRow(b, w) }.toArray[Any]))
    for (in <- Seq(Seq(0 -> 3L, 2 -> -5L), Seq.empty[(Int, Long)],
        Seq(4 -> 1L), Seq(-1 -> 1L), null)) {
      val row = pairsRow(in)
      val out = projP(row)
      val interp = dvn.eval(row)
      if (out.isNullAt(0)) assert(interp == null, s"dense on $in")
      else {
        val gen = out.getStruct(0, 2)
        val ir = interp.asInstanceOf[InternalRow]
        assert(gen.getArray(0).toDoubleArray.toSeq ==
          ir.getArray(0).toDoubleArray.toSeq, s"dense vec on $in")
        assert(gen.getDouble(1) == ir.getDouble(1), s"dense n2 on $in")
      }
    }
  }
}
