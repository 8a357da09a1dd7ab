package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class NoveltySpec extends SparkTestBase {
  import spark.implicits._

  private def run(n: Int, rows: (Long, String)*) =
    Novelty.firstSeenFraction(rows.toDF("id", "text"), "id", "text", n)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("every gram is novel exactly once, attributed to its min-id doc") {
    // doc 1 introduces "a b" and "b c"; doc 2 repeats "a b" (not novel
    // there) and introduces "b d"; doc 3 is wholly seen grams
    val out = run(2,
      (1L, "a b c"),
      (2L, "a b d"),
      (3L, "a b c"))
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    // corpus budget: total novel == 3 distinct grams ("a b","b c","b d")
    assert(out.values.map(_._2).sum == 3L)
  }

  test("corpus budget: sum of n_novel equals the number of distinct " +
    "grams in the corpus (each gram novel exactly once)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Novelty.firstSeenFraction(docs, "doc_id", "text", 4)
    val totalNovel = out.agg(sum("n_novel")).head().getLong(0)
    val distinctGrams = docs
      .filter(size(split(col("text"), " ")) >= 4)
      .select(explode(transform(
        sequence(lit(0), size(split(col("text"), " ")) - lit(4)),
        i => array_join(slice(split(col("text"), " "),
          (i + lit(1)).cast("int"), lit(4)), " "))).as("g"))
      .distinct().count()
    assert(totalNovel == distinctGrams,
      s"novel=$totalNovel distinct=$distinctGrams")
    // and in id order the curve is non-trivial: the first doc is all
    // novel, later docs mostly not
    val first = out.orderBy("doc_id").limit(1).head()
    assert(first.getDouble(3) == 1.0)
  }

  test("docs shorter than the gram width report zeros, not missing rows") {
    val out = run(3, (1L, "one two"), (2L, "one two three"))
    assert(out(1L) == ((0L, 0L, 0.0)))
    assert(out(2L) == ((1L, 1L, 1.0)))
  }

  test("within-doc gram repeats count once (distinct grams per doc)") {
    val out = run(2, (1L, "x y x y x y"))
    // grams: "x y","y x","x y","y x","x y" -> distinct {"x y","y x"}
    assert(out(1L) == ((2L, 2L, 1.0)))
  }

  test("reserved working names fail loudly instead of colliding") {
    val e = intercept[IllegalArgumentException] {
      Novelty.firstSeenFraction(
        Seq((1L, "a", 2L)).toDF("id", "text", "n_novel"),
        "id", "text", 2)
    }
    assert(e.getMessage.contains("reserves"))
  }
}
