package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking.globalOrdinal must be byte-identical to the unpartitioned
  * row_number window it replaces, for any shard count — the sharded
  * formulation is the scale path, the global window is the spec.
  */
class RankingSpec extends SparkTestBase {

  private lazy val vocab = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(explode(split(col("text"), " ")).as("tok"))
    .groupBy("tok").agg(count(lit(1)).as("cnt"))

  private def specRank = vocab.select(col("tok"),
    (row_number().over(
      Window.orderBy(col("cnt").desc, col("tok").asc)) - 1L).as("tok_id"))

  test("sharded global ordinal equals the single-window row_number " +
    "for awkward shard counts") {
    val expected = specRank.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (shards <- Seq(1, 3, 7, 32)) {
      val got = Ranking.globalOrdinal(vocab,
        Seq(col("cnt").desc, col("tok").asc), "tok_id", shards)
        .select("tok", "tok_id")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"mismatch at shards=$shards")
    }
  }

  test("more shards than rows, and empty input") {
    import spark.implicits._
    val tiny = Seq(("b", 5L), ("a", 5L), ("c", 9L)).toDF("tok", "cnt")
    val got = Ranking.globalOrdinal(tiny,
      Seq(col("cnt").desc, col("tok").asc), "tok_id", 16)
      .select("tok", "tok_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("c" -> 0L, "a" -> 1L, "b" -> 2L))
    val empty = Ranking.globalOrdinal(tiny.filter(lit(false)),
      Seq(col("cnt").desc), "tok_id", 4)
    assert(empty.count() == 0)
  }

  test("refuses inputs that collide with reserved temp/output names " +
    "(withColumn would silently replace them)") {
    import spark.implicits._
    val clash = Seq(("a", 1L, 0)).toDF("tok", "cnt", "__pid")
    intercept[IllegalArgumentException] {
      Ranking.globalOrdinal(clash, Seq(col("cnt").desc), "tok_id", 2)
    }
    val outClash = Seq(("a", 1L)).toDF("tok", "tok_id")
    intercept[IllegalArgumentException] {
      Ranking.globalOrdinal(outClash, Seq(col("tok").asc), "tok_id", 2)
    }
  }

  test("refuses to run with exchange reuse disabled (sampled range " +
    "boundaries are only branch-consistent under one materialization)") {
    import spark.implicits._
    val tiny = Seq(("a", 1L)).toDF("tok", "cnt")
    withSQLConf("spark.sql.exchange.reuse" -> "false") {
      intercept[IllegalArgumentException] {
        Ranking.globalOrdinal(tiny, Seq(col("cnt").desc), "tok_id", 2)
      }
    }
  }

  test("sharded exclusive prefix sum equals the single-window form for " +
    "awkward shard counts, including first-row zero") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("n_tokens"))
    val expected = docs.select(col("doc_id"),
      coalesce(sum(col("n_tokens")).over(Window.orderBy(col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("tok_offset"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expected.values.min == 0L)
    for (shards <- Seq(1, 3, 7, 32)) {
      val got = Ranking.globalPrefixSum(docs, Seq(col("doc_id").asc),
        col("n_tokens"), "tok_offset", shards)
        .select("doc_id", "tok_offset")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"mismatch at shards=$shards")
    }
  }

  test("prefix sum of ones is the ordinal (the two forms agree on " +
    "their shared special case)") {
    import spark.implicits._
    val tiny = Seq(("b", 5L), ("a", 5L), ("c", 9L)).toDF("tok", "cnt")
    val ord = Ranking.globalOrdinal(tiny,
      Seq(col("cnt").desc, col("tok").asc), "r", 4)
      .select("tok", "r").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ps = Ranking.globalPrefixSum(tiny,
      Seq(col("cnt").desc, col("tok").asc), lit(1L), "r", 4)
      .select("tok", "r").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ps == ord)
  }

  test("globalPrefixSum shares globalOrdinal's guards: reserved names " +
    "and exchange-reuse") {
    import spark.implicits._
    val clash = Seq(("a", 1L, 0)).toDF("tok", "cnt", "__v")
    intercept[IllegalArgumentException] {
      Ranking.globalPrefixSum(clash, Seq(col("cnt").desc), col("cnt"),
        "o", 2)
    }
    withSQLConf("spark.sql.exchange.reuse" -> "false") {
      intercept[IllegalArgumentException] {
        Ranking.globalPrefixSum(Seq(("a", 1L)).toDF("tok", "cnt"),
          Seq(col("cnt").desc), col("cnt"), "o", 2)
      }
    }
  }
}
