package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the BPE training loop (Bpe.scala).
  *
  * Two costs in the round-10 loop motivated these:
  *  - `initSymbols` enumerated characters via per-index `substr` — the
  *    same head-scan shape (UTF8String.substring is code-point indexed
  *    and scans from the string head) that was O(len²) per document in
  *    the text tier; harmless on short words, ruinous on a degenerate
  *    10⁴-char "word" (URL, DNA string, no-space CJK run).
  *  - the batched merge application chained one `regexp_replace`
  *    projection PER MERGE: O(batch) plan nodes per round made the
  *    driver re-plan/re-codegen a 256-deep expression tree every round
  *    (measured 6.1 s/round at 8,192 merges, SCALE.md) and each vocab
  *    row ran `batch` regex passes — O(merges) total regex applications
  *    per row over a training run.
  *
  * `CharSplit` is the one-pass character enumerator; `BatchMergePairs`
  * applies a WHOLE non-conflicting merge batch in one left-to-right
  * pass — one plan node per round regardless of batch size, one scan of
  * each symbol sequence per round.
  */
object BpeNatives {

  /** One code-point-per-element split, one pass over the UTF-8 bytes —
    * the native twin of `transform(sequence(1, length(w)),
    * i => substr(w, i, 1))`, which scanned from the string head per
    * index (O(len²) code-point steps per word). Each element is a
    * zero-copy byte-range view; empty string yields an empty array.
    */
  def charSplit(text: UTF8String): ArrayData = {
    val nb = text.numBytes()
    if (nb == 0) return new GenericArrayData(Array.empty[AnyRef])
    val bytes = text.getBytes
    // over-allocate to byte count, shrink after the scan: avoids a
    // second boundary pass for the exact code-point count
    val out = new Array[AnyRef](nb)
    var w = 0
    var i = 0
    while (i < nb) {
      // clamp to the remaining bytes: a truncated multibyte tail
      // (malformed UTF-8 from binary/corrupt input) must yield a
      // bounded final symbol, not a view past the array end
      val len = math.min(UTF8String.numBytesForFirstByte(bytes(i)), nb - i)
      out(w) = UTF8String.fromBytes(bytes, i, len)
      w += 1
      i += len
    }
    new GenericArrayData(
      if (w == nb) out else java.util.Arrays.copyOf(out, w))
  }
}

/** char_split(w): array of single-code-point strings. Null in -> null
  * out (Bpe.initSymbols wraps with coalesce to preserve the old
  * formula's null -> empty behavior).
  */
case class CharSplit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BpeNatives.charSplit(input.asInstanceOf[UTF8String])
  override def prettyName: String = "char_split"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeNatives.charSplit($c)")
  override protected def withNewChildInternal(newChild: Expression): CharSplit =
    copy(child = newChild)
}

/** batch_merge_pairs(syms): apply a whole batch of pairwise
  * NON-CONFLICTING merges (a, b) -> ab to a symbol sequence in one
  * left-to-right pass over non-overlapping occurrences.
  *
  * Equivalence to sequential application IN THE GIVEN (rank) ORDER —
  * what the replaced `mergeOnce` foldLeft computed, and what BpeSpec's
  * round-trip replay pins. The constructor enforces exactly
  * `Bpe.selectNonConflicting`'s invariant: operands are pairwise
  * distinct across pairs, and no operand equals an EARLIER pair's
  * concatenation. Under it,
  *  - occurrences of different pairs can never overlap (an overlap at
  *    positions (i-1,i),(i,i+1) would force one pair's b to equal the
  *    other's a), and
  *  - no EARLIER pair's output can feed a LATER pair (a later operand
  *    equal to an earlier concat is rejected), so the fold's later
  *    passes see exactly the occurrences present in the input — which
  *    is what the single scan consumes. (A later pair MAY name an
  *    earlier operand's concatenation, e.g. (es,t) ranked before
  *    (e,s): the fold runs (es,t) before any new "es" exists, and the
  *    scan never revisits its own output — both skip it, consistently.
  *    Only the given order carries this guarantee, which is the order
  *    training applies and the replay test replays.)
  *
  * Lookup is alloc-free: `first` maps a pair's left symbol to its index
  * (a left symbol is unique across a non-conflicting batch), `seconds`/
  * `mergeds` hold the right symbol and the concatenation. One hash
  * probe per position, no per-position allocation, one output array.
  */
case class BatchMergePairs(child: Expression, pairs: Seq[(String, String)])
    extends UnaryExpression {
  // enforce selectNonConflicting's invariant, not just distinct left
  // symbols: a batch like (a,b),(b,c) passes the weaker check but the
  // one-pass scan would apply (a,b) at a position where the ranked
  // sequential order applies (b,c) first — the given-order equivalence
  // argued above needs the full invariant, so a direct caller handing
  // us anything weaker must fail loudly, not drift silently
  require({
    val used = scala.collection.mutable.Set.empty[String]
    pairs.forall { case (a, b) =>
      !used(a) && !used(b) && { used ++= Seq(a, b, a + b); true }
    }
  }, "batch must be pairwise non-conflicting (no shared symbols, no " +
    "operand naming an earlier pair's concatenation) — use " +
    "Bpe.selectNonConflicting")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val first: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](pairs.size * 2)
    pairs.zipWithIndex.foreach { case ((a, _), i) =>
      m.put(UTF8String.fromString(a), Integer.valueOf(i))
    }
    m
  }
  @transient private lazy val seconds: Array[UTF8String] =
    pairs.map(p => UTF8String.fromString(p._2)).toArray
  @transient private lazy val mergeds: Array[UTF8String] =
    pairs.map(p => UTF8String.fromString(p._1 + p._2)).toArray

  /** Public for generated code (doGenCode calls through a reference to
    * this expression instance).
    */
  def applyMerges(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var w = 0
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var merged: UTF8String = null
      if (i + 1 < n) {
        val idx = first.get(s)
        if (idx != null && arr.getUTF8String(i + 1).equals(seconds(idx))) {
          merged = mergeds(idx)
        }
      }
      if (merged != null) { out(w) = merged; w += 1; i += 2 }
      else { out(w) = s; w += 1; i += 1 }
    }
    new GenericArrayData(
      if (w == n) out else java.util.Arrays.copyOf(out, w))
  }

  override def nullSafeEval(input: Any): Any =
    applyMerges(input.asInstanceOf[ArrayData])
  override def prettyName: String = "batch_merge_pairs"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("batchMergePairs", this,
      classOf[BatchMergePairs].getName)
    defineCodeGen(ctx, ev, c => s"$ref.applyMerges($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BatchMergePairs =
    copy(child = newChild)
}

object BpeFunctions {
  /** Column API: one-pass native per-code-point split. */
  def charSplit(c: Column): Column =
    ColumnShim.toColumn(CharSplit(ColumnShim.toExpression(c)))

  /** Column API: one-pass application of a non-conflicting merge batch. */
  def batchMergePairs(c: Column, pairs: Seq[(String, String)]): Column =
    ColumnShim.toColumn(BatchMergePairs(ColumnShim.toExpression(c), pairs))
}
