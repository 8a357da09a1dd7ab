package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (Aggregator[IN, BUF, OUT]) for corpus token
  * statistics — the user-facing way to add an aggregate the built-ins
  * lack, with full partial-aggregation semantics: `reduce` runs map-side,
  * `merge` combines partials across the shuffle, so the operator scales
  * exactly like a built-in (bytes shuffled = one 32-byte buffer per
  * group, independent of corpus size).
  */
object CorpusStats {

  case class Buf(n: Long, sumTok: Long, minTok: Long, maxTok: Long)
  case class Stats(n_docs: Long, sum_tokens: Long, min_tokens: Long,
      max_tokens: Long, avg_tokens: Double)

  /** Input = per-document token count (computed by a native expression
    * upstream; the aggregate only folds longs).
    */
  val agg: Aggregator[Long, Buf, Stats] = new Aggregator[Long, Buf, Stats] {
    def zero: Buf = Buf(0L, 0L, Long.MaxValue, Long.MinValue)
    def reduce(b: Buf, tok: Long): Buf =
      Buf(b.n + 1, b.sumTok + tok, math.min(b.minTok, tok),
        math.max(b.maxTok, tok))
    def merge(a: Buf, b: Buf): Buf =
      Buf(a.n + b.n, a.sumTok + b.sumTok, math.min(a.minTok, b.minTok),
        math.max(a.maxTok, b.maxTok))
    def finish(b: Buf): Stats =
      if (b.n == 0) Stats(0, 0, 0, 0, 0.0)
      else Stats(b.n, b.sumTok, b.minTok, b.maxTok,
        b.sumTok.toDouble / b.n)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
