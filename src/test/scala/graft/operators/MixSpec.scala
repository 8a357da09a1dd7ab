package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MixSpec extends SparkTestBase {

  import spark.implicits._

  // (domain, n_tok): two big domains, one small
  private def corpus = Seq(
    ("web", 90000L), ("web", 90000L),
    ("code", 20000L),
    ("wiki", 4000L), ("wiki", 1000L))
    .toDF("source", "n_tok")

  test("weights are sqrt-proportional, normalized, and upweight small " +
    "domains vs their raw token share") {
    val w = Mix.weights(corpus, "source", col("n_tok"), 100000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(w.keySet == Set("web", "code", "wiki"))
    val (_, webTok, webW, _) = w("web")
    val (_, wikiTok, wikiW, _) = w("wiki")
    assert(webTok == 180000L && wikiTok == 5000L)
    // normalized
    assert(math.abs(w.values.map(_._3).sum - 1.0) < 1e-5)
    // sqrt temperature: wiki's weight share > its token share
    assert(wikiW / (wikiW + webW) > wikiTok.toDouble / (wikiTok + webTok))
    // and ordered the same way as the masses
    assert(webW > w("code")._3 && w("code")._3 > wikiW)
  }

  test("rates hit the token target in expectation and clamp at 1.0") {
    val rows = Mix.weights(corpus, "source", col("n_tok"), 100000L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    rows.foreach { case (_, tok, weight, rate) =>
      val unclamped = 100000.0 * weight / tok
      if (unclamped >= 1.0) assert(rate == 1.0)
      else assert(math.abs(rate - unclamped) < 1e-6)
    }
    // the small domain upsample-clamps, the big one downsamples
    val byName = rows.map(r => r._1 -> r._4).toMap
    assert(byName("wiki") == 1.0 && byName("web") < 1.0)
  }

  test("invalid target is refused") {
    intercept[IllegalArgumentException] {
      Mix.weights(corpus, "source", col("n_tok"), 0L)
    }
  }
}
