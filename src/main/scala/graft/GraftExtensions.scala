package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, MinHashSignature, SimHash64}

/** SparkSessionExtensions wiring: exposes the native graft expressions to
  * the SQL surface, so `spark.sql("SELECT simhash64(text) ...")` works
  * anywhere DataFrame code does. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(session =>
      graft.plans.IntervalJoinRewrite(session))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit simhash of whitespace tokens"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(text, k, n) - minhash over k-shingles, n hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(t, k, n) => MinHashSignature(t,
          k.eval().asInstanceOf[Int], n.eval().asInstanceOf[Int])
        case Seq(t) => MinHashSignature(t, 3, 32)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(text[, k, n])")
      }))
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("approx_top_k_ss"),
      info("approx_top_k_ss",
        "approx_top_k_ss(col, k, capacity) - SpaceSaving heavy hitters"),
      (args: Seq[Expression]) => graft.functions.ApproxTopK(args(0),
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles",
        "word_shingles(text, k) - k-token shingle strings, one pass"),
      (args: Seq[Expression]) => graft.functions.WordShingles(args(0),
        args(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("rolling_hash_31"),
      info("rolling_hash_31",
        "rolling_hash_31(text) - code-point 31-rolling hash mod 2^31-1"),
      (args: Seq[Expression]) => graft.functions.RollingHash31(args.head)))
    e.injectFunction((FunctionIdentifier("char_ngrams"),
      info("char_ngrams",
        "char_ngrams(text, n) - distinct char n-grams, first-occurrence order"),
      (args: Seq[Expression]) => graft.functions.CharNgrams(args(0),
        args(1).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("char_split"),
      info("char_split",
        "char_split(text) - one string per code point, one pass"),
      (args: Seq[Expression]) => graft.functions.CharSplit(args.head)))
  }
}

/** Session factory with the engine's standard configuration: the settings
  * every entry point (Verify, Bench, Cli, tests) needs to behave
  * identically — UTC, right-sized shuffle partitions for local mode, AQE,
  * the events-nanos reader flag, and the graft SQL functions.
  */
object GraftSession {
  def builder(master: String = "local[4]",
      shufflePartitions: Int = 4): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
}
