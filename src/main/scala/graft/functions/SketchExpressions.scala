package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text sketches.
  *
  * The pure higher-order-function formulations in Dedup.scala are correct
  * but interpreted: Spark's lambda HOFs don't participate in whole-stage
  * codegen, and a 64-bit simhash built from per-bit lambdas evaluates
  * thousands of interpreted nodes per document. These expressions do one
  * compiled pass over the UTF8 bytes per row (xxHash64 of each
  * space-separated token, then the sketch fold in a tight loop) — the shape a
  * 100 TB map-side must have. Hash family and semantics match
  * graft.operators.Dedup exactly (asserted in SketchExpressionsSpec).
  */
object Sketches {

  private val SEED = 42L

  /** xxHash64 of the UTF-8 byte range [lo, hi) of `text`, Spark's
    * seed-42 variant — identical to functions.xxhash64(col) on a string
    * whose bytes are exactly that range (xxhash64 hashes the raw UTF-8
    * bytes). Hashing the range in place is both the correctness fix and
    * the fast path: the token/shingle boundary scan below works in BYTE
    * offsets, and UTF8String.substring is CODE-POINT indexed — feeding
    * it byte offsets silently mis-slices any non-ASCII document — while
    * hashing the byte range directly needs no offset translation and no
    * per-shingle substring allocation at all.
    */
  @inline private def byteRangeHash(text: UTF8String, lo: Int, hi: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      text.getBaseObject, text.getBaseOffset + lo, hi - lo, SEED)

  /** Separator byte positions of the space-only tokenizer, framed by a
    * leading -1 and a trailing numBytes sentinel: token t spans bytes
    * (bounds(t), bounds(t+1)) exclusive/exclusive, and tokenCount =
    * bounds.length - 1. The ONE definition of tokenization every
    * native shares — the split contract (single space byte 0x20, tabs/
    * newlines are token content, adjacent separators yield empty
    * tokens) is a cross-engine agreement with the HOF/SQL twins, so a
    * change here must never be applied to one native and not another.
    */
  private def tokenBounds(
      text: UTF8String): scala.collection.mutable.ArrayBuffer[Int] = {
    val n = text.numBytes()
    val bounds = new scala.collection.mutable.ArrayBuffer[Int](64)
    bounds += -1
    var i = 0
    while (i < n) {
      if (text.getByte(i) == ' '.toByte) bounds += i
      i += 1
    }
    bounds += n
    bounds
  }

  /** One-pass 64-bit simhash over space-separated tokens (the tokenizer
    * splits ONLY on the single space byte 0x20 — tabs/newlines stay token
    * content — matching the HOF twin's split(text, " "); any cross-engine
    * SQL twin must use the same space-only split or pairs diverge).
    */
  def simhash64(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = text.numBytes()
    var start = 0
    def consume(end: Int): Unit = {
      if (end > start) {
        val h = byteRangeHash(text, start, end)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    while (i < n) {
      // single-byte ' ' separator: substring on byte offsets is safe
      if (text.getByte(i) == ' '.toByte) { consume(i); start = i + 1 }
      i += 1
    }
    consume(n)
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5(s) as a 60-bit non-negative long — the
    * compiled one-pass twin of conv(substring(md5(s), 1, 15), 16, 10):
    * one digest, no 32-char hex string allocation, no base-16 string
    * parse (the chain's cost is what made the md5 dial of
    * TfIdf.hashedVec 2-3x its xxhash64 twin before this native). Same
    * hash family simhashMd5_60 folds per token; same cross-engine
    * contract — any engine with md5 replays it from the hex prefix.
    */
  def md5Long60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** One-pass 60-bit simhash over space-separated tokens (space-only
    * split, see simhash64) where the per-token hash is the first 15 hex
    * chars of md5(token) as a 60-bit integer —
    * i.e. conv(substr(md5(tok),1,15),16,10). Unlike the xxhash64 variant
    * this hash has an exact cross-engine SQL twin (DuckDB md5 + a hex
    * digit fold), which is what makes x07's pair output fully
    * oracle-checkable: multi-index Hamming blocking is COMPLETE by
    * pigeonhole, so the blocked pipeline's output provably equals the
    * all-pairs Hamming ball the oracle computes. 60 bits (not 64)
    * because 15 hex digits are the widest md5 prefix that fits a signed
    * 64-bit int in both engines without unsigned-overflow gymnastics.
    */
  def simhashMd5_60(text: UTF8String): Long = {
    val bytes = text.getBytes
    val md = md5Local.get()
    val votes = new Array[Int](60)
    def consume(start: Int, end: Int): Unit = if (end > start) {
      md.reset()
      md.update(bytes, start, end - start)
      val d = md.digest()
      // first 15 hex chars = big-endian 64-bit prefix >>> 4
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var i = 0
    var start = 0
    val n = bytes.length
    while (i < n) {
      // single-byte ' ' separator: byte offsets are UTF-8 safe
      if (bytes(i) == ' '.toByte) { consume(start, i); start = i + 1 }
      i += 1
    }
    consume(start, n)
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private val P = 2147483647L // 2^31 - 1, matches Dedup.hashFamily

  /** Distinct shingle hashes (full 64-bit xxhash64 of each k-word
    * shingle), sorted ascending: the cheap per-doc SET REPRESENTATION the
    * near-dup verifier joins back — Jaccard over these equals Jaccard
    * over the string shingle sets (64-bit collisions are ~n^2/2^64).
    * Carrying 8-byte hashes instead of shingle strings cuts the verify
    * join's bytes ~10x, and the one compiled pass replaces the
    * interpreted slice+array_join+array_distinct HOF chain that
    * dominated x06's runtime. Empty array (not null) below k tokens,
    * matching Dedup.shingles.
    */
  def shingleHashSet(text: UTF8String, shingleK: Int): ArrayData = {
    val bounds = tokenBounds(text)
    val nTokens = bounds.length - 1
    if (nTokens < shingleK) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nTokens - shingleK + 1)
    var t = 0
    while (t + shingleK <= nTokens) {
      hs(t) = byteRangeHash(text, bounds(t) + 1, bounds(t + shingleK))
      t += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 0
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w)) { w += 1; hs(w) = hs(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w + 1))
  }

  /** Winnowing fingerprints (Schleimer et al. 2003): sorted distinct
    * rightmost-min-per-window selections over md5-grid k-gram hashes —
    * the one-pass compiled twin of graft.operators.Winnow's HOF
    * formulation (equivalence fuzz-pinned in WinnowSpec). The gram
    * hash is the first 4 md5 bytes as an unsigned 32-bit value,
    * identical to conv(substr(md5(gram),1,8),16,10) and therefore
    * DuckDB-replayable; the gram's bytes are the raw byte range
    * between separator positions (equal to the space-joined token
    * slice because the separator is the single space byte — the
    * wordShingles argument). Empty array below k tokens; fewer than w
    * hashes -> the min of what exists (the short-document clamp).
    * Window scan is O(m·w); w is small by construction (the scheme's
    * density target is 2/(w+1)) — a monotonic deque would make it
    * O(m) if a large-w variant ever appears.
    */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bounds = tokenBounds(text)
    val nTokens = bounds.length - 1
    if (nTokens < k) return new GenericArrayData(Array.empty[Long])
    val bytes = text.getBytes
    val m = nTokens - k + 1
    val hs = new Array[Long](m)
    val md = md5Local.get()
    var t = 0
    while (t < m) {
      val lo = bounds(t) + 1
      val hi = bounds(t + k)
      md.reset()
      md.update(bytes, lo, hi - lo)
      val d = md.digest()
      hs(t) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      t += 1
    }
    val nwin = math.max(m - w + 1, 1)
    val sel = new Array[Long](nwin)
    var j = 0
    while (j < nwin) {
      val end = math.min(j + w, m)
      var best = j
      var p = j + 1
      // <= keeps the RIGHTMOST minimum — the standard winnowing
      // tie-break, and the one the SQL twin's reversed list_indexof
      // replays
      while (p < end) { if (hs(p) <= hs(best)) best = p; p += 1 }
      sel(j) = hs(best)
      j += 1
    }
    java.util.Arrays.sort(sel)
    var o = 0
    var r = 1
    while (r < sel.length) {
      if (sel(r) != sel(o)) { o += 1; sel(o) = sel(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, o + 1))
  }

  /** Position-carrying winnowing selections: the same hash + window
    * scan as winnowFingerprints, but each selection keeps its 1-BASED
    * gram index — the half of Schleimer et al. §4 that makes a MOSS
    * report actionable (which SPANS overlap, not just how many
    * fingerprints). Output: array<struct<fp,pos>> sorted by pos,
    * distinct by construction (consecutive windows re-selecting the
    * same gram dedupe on the position — a position determines its fp,
    * so (fp, pos) pairs are exactly the distinct selected positions,
    * matching the SQL twin's DISTINCT). The token span covered by a
    * row is [pos, pos+k-1], which is what Winnow.coveragePairs
    * explodes. winnowFingerprints stays the cheaper form for callers
    * that only bucket (x61): its output is ~2/(w+1) of gram count with
    * no struct overhead.
    */
  def winnowFingerprintPositions(text: UTF8String, k: Int,
      w: Int): ArrayData = {
    val bounds = tokenBounds(text)
    val nTokens = bounds.length - 1
    if (nTokens < k) return new GenericArrayData(Array.empty[AnyRef])
    val bytes = text.getBytes
    val m = nTokens - k + 1
    val hs = new Array[Long](m)
    val md = md5Local.get()
    var t = 0
    while (t < m) {
      val lo = bounds(t) + 1
      val hi = bounds(t + k)
      md.reset()
      md.update(bytes, lo, hi - lo)
      val d = md.digest()
      hs(t) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      t += 1
    }
    val nwin = math.max(m - w + 1, 1)
    val picked = new Array[Boolean](m)
    var nPicked = 0
    var j = 0
    while (j < nwin) {
      val end = math.min(j + w, m)
      var best = j
      var p = j + 1
      while (p < end) { if (hs(p) <= hs(best)) best = p; p += 1 }
      if (!picked(best)) { picked(best) = true; nPicked += 1 }
      j += 1
    }
    val out = new Array[AnyRef](nPicked)
    var o = 0
    var i = 0
    while (i < m) {
      if (picked(i)) {
        out(o) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](hs(i), i + 1))
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Word k-shingle strings in one pass (see WordShingles below for the
    * why). Byte-offset slicing is safe here for non-ASCII too: the
    * slice bounds are separator byte positions, so every slice is a
    * whole number of code points; fromBytes wraps without copying.
    */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val bounds = tokenBounds(text)
    val nTokens = bounds.length - 1
    if (nTokens < k) return new GenericArrayData(Array.empty[AnyRef])
    val bytes = text.getBytes
    val out = new Array[AnyRef](nTokens - k + 1)
    var t = 0
    while (t + k <= nTokens) {
      out(t) = UTF8String.fromBytes(bytes, bounds(t) + 1,
        bounds(t + k) - bounds(t) - 1)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Polynomial 31-rolling hash over CODE POINTS mod 2^31-1 in one pass
    * — bit-identical to the declarative aggregate/transform/ascii
    * formula it replaces, which was O(len²): UTF8String.substring is
    * code-point indexed and scans from the string head on every call,
    * inside an interpreted lambda. Spark's ascii() returns
    * codePointAt(0) of the first character (checked against the 4.1.2
    * bytecode), so iterating codePointAt with charCount steps replicates
    * ascii(substr(i, 1)) exactly, supplementary planes included. Empty
    * text hashes to 0; nulls are handled by the expression wrapper.
    */
  def rollingHash31(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Distinct character n-grams (code-point slices) in first-occurrence
    * order — one pass, replacing transform(sequence(...),
    * i => substr(i, n)) + array_distinct, which was O(len²) for the
    * same substring-scan reason. Byte-offset slicing at code-point
    * boundaries keeps non-ASCII intact; LinkedHashSet reproduces
    * array_distinct's first-occurrence order. Empty below n code
    * points.
    */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val nb = text.numBytes()
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    while (i < nb) {
      starts += i
      i += UTF8String.numBytesForFirstByte(text.getByte(i))
    }
    starts += nb
    val nChars = starts.length - 1
    if (nChars < n) return new GenericArrayData(Array.empty[AnyRef])
    val bytes = text.getBytes
    val seen = new java.util.LinkedHashSet[UTF8String]
    var t = 0
    while (t + n <= nChars) {
      seen.add(UTF8String.fromBytes(bytes, starts(t),
        starts(t + n) - starts(t)))
      t += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** MinHash signature over k-word shingles, one pass: shingle hashes are
    * xxhash64 of the joined shingle text mod p, then numHashes
    * (a*h+b) mod p minima. Coefficients regenerate Dedup.hashFamily
    * (same seed-42 java Random stream).
    */
  def minhashSig(text: UTF8String, shingleK: Int, as: Array[Long],
      bs: Array[Long]): ArrayData = {
    // token boundaries
    val bounds = tokenBounds(text)
    val nTokens = bounds.length - 1
    if (nTokens < shingleK) return null
    val numHashes = as.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t + shingleK <= nTokens) {
      // shingle = bytes between (bounds(t)+1) and bounds(t+shingleK)
      val h = {
        val x = byteRangeHash(text, bounds(t) + 1, bounds(t + shingleK)) % P
        if (x < 0) x + P else x
      }
      var j = 0
      while (j < numHashes) {
        val v = (as(j) * h + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  /** One-pass hashed unigram+bigram linear margin — the compiled twin
    * of Classifier.ngramScore's HOF fold (bit-identical doubles,
    * asserted in ClassifierSpec): bias + Σ weights(bucket(feature)),
    * unigram weights added left-to-right first, then bigram weights,
    * the same association order as the fold. Because the tokenizer is
    * the shared space-only split (tokenBounds), the bigram feature
    * "tok_i tok_{i+1}" is EXACTLY the original byte range spanning
    * both tokens and their single separator byte — so the xxhash64
    * family hashes ranges in place with zero allocation, and the md5
    * family digests one contiguous slice per feature. Empty text
    * yields split's one empty token, matching the HOF/SQL twins.
    */
  def classifierMargin(text: UTF8String, weights: Array[Double],
      bias: Double, fastHash: Boolean): Double = {
    val d = weights.length
    val bounds = tokenBounds(text)
    val nTok = bounds.length - 1
    val bytes = if (fastHash) null else text.getBytes
    val md = if (fastHash) null else md5Local.get()
    def bucket(lo: Int, hi: Int): Int =
      if (fastHash) {
        val h = byteRangeHash(text, lo, hi) % d
        (if (h < 0) h + d else h).toInt
      } else {
        md.reset()
        md.update(bytes, lo, hi - lo)
        val dig = md.digest()
        // conv(substr(md5hex,1,8),16,10) = first 4 digest bytes as an
        // unsigned 32-bit big-endian int
        val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        (h % d).toInt
      }
    var score = bias
    var t = 0
    while (t < nTok) {
      score += weights(bucket(bounds(t) + 1, bounds(t + 1)))
      t += 1
    }
    t = 0
    while (t < nTok - 1) {
      score += weights(bucket(bounds(t) + 1, bounds(t + 2)))
      t += 1
    }
    score
  }

  /** image_header_meta(bytes): width/height/bit-depth of a PNG or JPEG
    * payload read straight from the container bytes — the FIRST thing an
    * actual multimodal ingest computes per blob, and the real half of
    * the Multimodal story (the pixel decode stays stubbed; container
    * METADATA needs no codec, just the published layouts).
    *
    * PNG (ISO 15948 / RFC 2083 §5.3): the 8-byte signature, then the
    * IHDR chunk, which MUST come first — 4-byte length (always 13),
    * "IHDR", width/height as big-endian 32-bit, bit depth and colour
    * type bytes. The CRC is deliberately NOT verified: header
    * extraction reads structure, it does not validate payloads.
    *
    * JPEG (ITU-T T.81 §B.2): SOI, then marker segments — 0xFF, a marker
    * byte (any number of 0xFF fill bytes allowed before it, §B.1.1.2),
    * and for non-standalone markers a big-endian 16-bit length that
    * includes itself. Dimensions live in the first SOFn frame header
    * (0xC0-0xCF minus DHT/JPG/DAC = C4/C8/CC): sample precision byte,
    * then lines (height) and samples-per-line (width), each BE16. The
    * walk skips APPn/COM/quantization/etc segments by their declared
    * lengths, so per-row variable-length segments genuinely exercise it.
    *
    * Returns one packed non-negative long — fmt<<56 | depth<<48 |
    * width<<24 | height (fmt 1 = png, 2 = jpeg) — or -1 for anything
    * unparseable: wrong signature, truncated buffer, malformed segment
    * length, EOI/SOS before any SOF, zero or >= 2^24 dimensions (the
    * pack's field width; real containers top out far below). Two
    * SPEC-LEGAL shapes deliberately share the -1 sentinel with
    * corruption: a JPEG SOF with lines=0 (height deferred to a DNL
    * marker, T.81 §B.2.2 — vanishingly rare in stored files, and the
    * height is genuinely not in the header), and a PNG dimension in
    * [2^24, 2^31) (legal per spec, beyond the pack's field width).
    * Callers that must distinguish out-of-representable-range from
    * malformed should not count -1 rows as corrupt without a second
    * look at the leading bytes. A sentinel rather than SQL NULL keeps
    * the generated code a primitive-long assignment; the Column wrapper
    * surfaces NULL fields.
    */
  def imageHeaderMeta(bytes: Array[Byte]): Long = {
    def be32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def be16(off: Int): Int =
      ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    def pack(fmt: Long, depth: Long, w: Long, h: Long): Long =
      if (w <= 0 || h <= 0 || w >= (1L << 24) || h >= (1L << 24)) -1L
      else (fmt << 56) | (depth << 48) | (w << 24) | h
    if (bytes.length >= 26 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && bytes(4) == 0x0d && bytes(5) == 0x0a &&
        bytes(6) == 0x1a && bytes(7) == 0x0a) {
      if (be32(8) != 13L || bytes(12) != 'I' || bytes(13) != 'H' ||
          bytes(14) != 'D' || bytes(15) != 'R') return -1L
      return pack(1L, bytes(24) & 0xffL, be32(16), be32(20))
    }
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) return -1L
    var pos = 2
    while (pos + 1 < bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return -1L
      var p = pos
      while (p + 1 < bytes.length && (bytes(p + 1) & 0xff) == 0xff)
        p += 1 // fill bytes (T.81 §B.1.1.2)
      if (p + 1 >= bytes.length) return -1L
      val marker = bytes(p + 1) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 &&
          marker != 0xc8 && marker != 0xcc) {
        // SOFn: length(2), precision(1), lines(2), samples/line(2)
        if (p + 9 > bytes.length) return -1L
        return pack(2L, bytes(p + 4) & 0xffL, be16(p + 7), be16(p + 5))
      }
      if (marker == 0xd9 || marker == 0xda) return -1L // EOI/SOS, no SOF
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos = p + 2 // standalone markers carry no length field
      } else {
        if (p + 4 > bytes.length) return -1L
        val len = be16(p + 2)
        if (len < 2) return -1L
        pos = p + 2 + len
      }
    }
    -1L
  }

  /** media_header_meta(bytes): imageHeaderMeta extended to the other
    * two prefix-bounded public container layouts a multimodal ingest
    * meets — GIF (logical screen descriptor) and WAV/RIFF (fmt chunk);
    * a media pipeline is not image-only. Same packed-long convention:
    * fmt<<56 | depth<<48 | a<<24 | b, where for images (fmt 1 png /
    * 2 jpeg / 3 gif) a = width, b = height, depth = bit depth (for GIF:
    * colour-resolution bits, the LSD packed field's bits-per-primary
    * declaration, GIF89a §18); for WAV (fmt 4) a = sample rate (Hz —
    * the 2^24 field bound is 16.7 MHz, far above any real rate), b =
    * channel count, depth = bits per sample. -1 for anything
    * unparseable, same contract (and same spec-legal-shares-the-
    * sentinel caveats) as imageHeaderMeta.
    *
    * GIF (GIF89a spec §17-18): "GIF87a"/"GIF89a", then the 7-byte
    * logical screen descriptor — width and height as LITTLE-endian
    * 16-bit (GIF is LE, unlike PNG/JPEG), then the packed byte whose
    * bits 4-6 hold colour resolution - 1.
    *
    * WAV (RIFF 1991 / WAVEFORMATEX): "RIFF", LE32 riff size, "WAVE",
    * then chunks — 4-byte id, LE32 size, payload padded to EVEN length
    * (the RIFF word-alignment rule). Fields live in the "fmt " chunk:
    * wFormatTag LE16, nChannels LE16, nSamplesPerSec LE32, then
    * nAvgBytesPerSec/nBlockAlign, wBitsPerSample LE16 at offset 14
    * (chunk size >= 16). The walk skips unknown chunks (JUNK, LIST,
    * bext, ...) by their declared sizes, so per-row variable-length
    * prefixes exercise it like JPEG's APPn/COM walk.
    */
  def mediaHeaderMeta(bytes: Array[Byte]): Long = {
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def le32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def pack(fmt: Long, depth: Long, a: Long, b: Long): Long =
      if (a <= 0 || b <= 0 || a >= (1L << 24) || b >= (1L << 24) ||
          depth <= 0 || depth > 255) -1L
      else (fmt << 56) | (depth << 48) | (a << 24) | b
    if (bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      val cr = ((bytes(10) >> 4) & 0x7) + 1
      return pack(3L, cr, le16(6), le16(8))
    }
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
        bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
      var pos = 12L // Long cursor: a declared LE32 size can reach 2^32-1
      while (pos + 8 <= bytes.length) {
        val p = pos.toInt
        val size = le32(p + 4)
        if (bytes(p) == 'f' && bytes(p + 1) == 'm' &&
            bytes(p + 2) == 't' && bytes(p + 3) == ' ') {
          if (size < 16 || p + 8 + 16 > bytes.length) return -1L
          return pack(4L, le16(p + 22), le32(p + 12), le16(p + 10))
        }
        pos += 8L + size + (size & 1L) // even-pad rule
      }
      return -1L
    }
    imageHeaderMeta(bytes)
  }
}

/** simhash(text): LongType. Null in -> null out. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Sketches.simhash64(input.asInstanceOf[UTF8String])
  override def prettyName: String = "simhash64"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** simhash_md5_60(text): LongType 60-bit signature. Null in -> null out. */
case class SimHashMd5_60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Sketches.simhashMd5_60(input.asInstanceOf[UTF8String])
  override def prettyName: String = "simhash_md5_60"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.simhashMd5_60($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashMd5_60 =
    copy(child = newChild)
}

/** minhash signature(text): array<bigint> of length numHashes, null when
  * the document has fewer than shingleK tokens.
  */
case class MinHashSignature(child: Expression, shingleK: Int,
    numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // same coefficient stream as Dedup.hashFamily (seed 42)
  @transient private lazy val (as, bs) = {
    val rnd = new scala.util.Random(42)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = rnd.nextInt(Int.MaxValue - 1).toLong + 1
      b(i) = rnd.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (a, b)
  }

  /** Public for generated code: the coefficient family lives on this
    * instance, so codegen calls back through an object reference
    * (ctx.addReferenceObj) rather than a static — the instance-state
    * variant of SimHash64's static-call pattern.
    */
  def evalSig(text: UTF8String): ArrayData =
    Sketches.minhashSig(text, shingleK, as, bs)

  override def nullSafeEval(input: Any): Any =
    evalSig(input.asInstanceOf[UTF8String])
  override def prettyName: String = "minhash_signature"
  // the sketch itself returns null below shingleK tokens, so the
  // generated code must re-check for null AFTER the call — plain
  // defineCodeGen would leave isNull false and hand downstream
  // operators a null ArrayData
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSignature", this,
      classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.evalSig($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** word_shingles(text): the k-shingle STRINGS themselves in one pass —
  * the native twin of the declarative HOF formula Dedup.shingles used
  * to be (`transform(sequence(...), i => array_join(slice(tokens, ...`),
  * whose interpreted lambda re-evaluated the token SPLIT on every
  * iteration: O(tokens²) per document, measured at 50s for 2M grams on
  * 400-token docs where the split itself costs 0.5s — a real hazard at
  * web-document lengths (10³-10⁴ tokens). Byte-sliced: tokens split on
  * SINGLE spaces, so k tokens joined by " " are exactly the original
  * byte range between the bounding separators — each shingle is one
  * zero-copy fromBytes view, no join, no re-split. Empty array (not
  * null) below k tokens; consecutive/trailing separators yield the same
  * empty tokens the declarative split kept (SketchExpressionsSpec pins
  * the equivalence).
  */
case class WordShingles(child: Expression, shingleK: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.wordShingles(input.asInstanceOf[UTF8String], shingleK)
  override def prettyName: String = "word_shingles"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.wordShingles($c, $shingleK)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** rolling_hash_31(text): one-pass code-point rolling hash (see
  * Sketches.rollingHash31). Null in, null out — the Column wrapper in
  * TextAnalysis replicates the old formula's null/empty behavior.
  */
case class RollingHash31(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Sketches.rollingHash31(input.asInstanceOf[UTF8String])
  override def prettyName: String = "rolling_hash_31"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.rollingHash31($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash31 =
    copy(child = newChild)
}

/** char_ngrams(text): one-pass distinct code-point n-gram strings (see
  * Sketches.charNgrams).
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.charNgrams(input.asInstanceOf[UTF8String], n)
  override def prettyName: String = "char_ngrams"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.charNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** shingle_hash_set(text): sorted distinct xxhash64 of each k-shingle;
  * empty array below k tokens.
  */
case class ShingleHashSet(child: Expression, shingleK: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.shingleHashSet(input.asInstanceOf[UTF8String], shingleK)
  override def prettyName: String = "shingle_hash_set"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.shingleHashSet($c, $shingleK)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** winnow_fingerprints(text, k, w): sorted distinct winnowing
  * fingerprint hashes (see Sketches.winnowFingerprints).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  // enforced at construction (= plan time), not per row: the SQL
  // surface reaches this constructor directly, bypassing the operator
  // wrapper's requires — without this, w = 0 indexes past the hash
  // array in every task and k = 0 hands md5 a negative length
  require(k >= 1, s"winnow_fingerprints: gram width must be >= 1, got $k")
  require(w >= 1, s"winnow_fingerprints: window must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)
  override def prettyName: String = "winnow_fingerprints"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.winnowFingerprints($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** winnow_fingerprint_positions(text, k, w): position-carrying winnow
  * selections as array<struct<fp,pos>> (see
  * Sketches.winnowFingerprintPositions).
  */
case class WinnowFingerprintPositions(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1,
    s"winnow_fingerprint_positions: gram width must be >= 1, got $k")
  require(w >= 1,
    s"winnow_fingerprint_positions: window must be >= 1, got $w")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("fp", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Sketches.winnowFingerprintPositions(input.asInstanceOf[UTF8String], k, w)
  override def prettyName: String = "winnow_fingerprint_positions"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.winnowFingerprintPositions($c, $k, $w)")
  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprintPositions =
    copy(child = newChild)
}

/** classifier_margin(text): the hashed unigram+bigram linear margin in
  * one compiled pass (see Sketches.classifierMargin). Weights travel as
  * a codegen reference object, not a Catalyst literal — a k-bucket
  * array literal would otherwise be re-materialized per row by the HOF
  * fold this replaces. Value-equal on (weights content, bias, family)
  * so structurally identical plans stay dedup-able.
  */
case class ClassifierMargin(child: Expression, weights: IndexedSeq[Double],
    bias: Double, fastHash: Boolean) extends UnaryExpression {
  require(weights.nonEmpty, "classifier_margin: need at least one weight")
  require(!bias.isNaN && !bias.isInfinite,
    s"classifier_margin: bias must be finite, got $bias")
  // one conversion at plan time; eval reads the primitive array
  private val warr: Array[Double] = weights.toArray
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    Sketches.classifierMargin(
      input.asInstanceOf[UTF8String], warr, bias, fastHash)
  override def prettyName: String = "classifier_margin"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("clfWeights", warr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Sketches.classifierMargin($c, $w, ${bias}D, $fastHash)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): ClassifierMargin =
    copy(child = newChild)
}

/** image_header_meta(bytes): packed PNG/JPEG header metadata in one
  * compiled pass over the payload bytes (see Sketches.imageHeaderMeta
  * for the layouts and the -1 unparseable sentinel). BinaryType in,
  * LongType out; null in -> null out.
  */
case class ImageHeaderMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Sketches.imageHeaderMeta(input.asInstanceOf[Array[Byte]])
  override def prettyName: String = "image_header_meta"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.imageHeaderMeta($c)")
  override protected def withNewChildInternal(
      newChild: Expression): ImageHeaderMeta =
    copy(child = newChild)
}

/** md5_long60(s): first 15 hex chars of md5(s) as a 60-bit long in one
  * compiled pass (see Sketches.md5Long60 — the engine-portable hash the
  * md5 dials of hashedVec/simhash use). StringType in, LongType out;
  * null in -> null out.
  */
case class Md5Long60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Sketches.md5Long60(input.asInstanceOf[UTF8String])
  override def prettyName: String = "md5_long60"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.md5Long60($c)")
  override protected def withNewChildInternal(
      newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

/** media_header_meta(bytes): packed PNG/JPEG/GIF/WAV header metadata in
  * one compiled pass over the payload bytes (see Sketches.mediaHeaderMeta
  * for the layouts and the -1 unparseable sentinel). BinaryType in,
  * LongType out; null in -> null out.
  */
case class MediaHeaderMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Sketches.mediaHeaderMeta(input.asInstanceOf[Array[Byte]])
  override def prettyName: String = "media_header_meta"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sketches.mediaHeaderMeta($c)")
  override protected def withNewChildInternal(
      newChild: Expression): MediaHeaderMeta =
    copy(child = newChild)
}

object SketchFunctions {
  /** Column API: one-pass native simhash (drop-in for Dedup.simhash). */
  def simhash64(c: Column): Column =
    ColumnShim.toColumn(SimHash64(ColumnShim.toExpression(c)))

  /** Column API: one-pass native md5-prefix 60-bit simhash (the
    * cross-engine-reproducible variant; see Sketches.simhashMd5_60).
    */
  def simhashMd5_60(c: Column): Column =
    ColumnShim.toColumn(SimHashMd5_60(ColumnShim.toExpression(c)))

  /** Column API: one-pass native minhash signature. */
  def minhashSignature(c: Column, shingleK: Int, numHashes: Int): Column =
    ColumnShim.toColumn(
      MinHashSignature(ColumnShim.toExpression(c), shingleK, numHashes))

  /** Column API: one-pass native distinct-shingle-hash set. */
  def shingleHashSet(c: Column, shingleK: Int): Column =
    ColumnShim.toColumn(ShingleHashSet(ColumnShim.toExpression(c), shingleK))

  /** Column API: one-pass native winnowing fingerprints. */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    ColumnShim.toColumn(
      WinnowFingerprints(ColumnShim.toExpression(c), k, w))

  /** Column API: one-pass native position-carrying winnow selections. */
  def winnowFingerprintPositions(c: Column, k: Int, w: Int): Column =
    ColumnShim.toColumn(
      WinnowFingerprintPositions(ColumnShim.toExpression(c), k, w))

  /** Column API: one-pass native word-shingle strings. */
  def wordShingles(c: Column, shingleK: Int): Column =
    ColumnShim.toColumn(WordShingles(ColumnShim.toExpression(c), shingleK))

  /** Column API: one-pass native code-point rolling hash. */
  def rollingHash31(c: Column): Column =
    ColumnShim.toColumn(RollingHash31(ColumnShim.toExpression(c)))

  /** Column API: one-pass native distinct char n-grams. */
  def charNgrams(c: Column, n: Int): Column =
    ColumnShim.toColumn(CharNgrams(ColumnShim.toExpression(c), n))

  /** Column API: one-pass native classifier margin (the compiled twin
    * of Classifier.ngramScore's fold).
    */
  def classifierMargin(c: Column, weights: Seq[Double], bias: Double,
      fastHash: Boolean): Column =
    ColumnShim.toColumn(ClassifierMargin(
      ColumnShim.toExpression(c), weights.toIndexedSeq, bias, fastHash))

  /** Column API: one-pass native PNG/JPEG header parse (packed long;
    * see Multimodal.imageHeaderDecode for the unpacked-columns form).
    */
  def imageHeaderMeta(c: Column): Column =
    ColumnShim.toColumn(ImageHeaderMeta(ColumnShim.toExpression(c)))

  /** Column API: one-pass native PNG/JPEG/GIF/WAV header parse (packed
    * long; see Multimodal.mediaHeaderDecode for the unpacked-columns
    * form).
    */
  def mediaHeaderMeta(c: Column): Column =
    ColumnShim.toColumn(MediaHeaderMeta(ColumnShim.toExpression(c)))

  /** Column API: one-pass native 60-bit md5-prefix hash (drop-in for
    * conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)).
    */
  def md5Long60(c: Column): Column =
    ColumnShim.toColumn(Md5Long60(ColumnShim.toExpression(c)))
}
