package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TfIdfSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry cherry"),
    (3L, "apple date")).toDF("id", "text")

  test("tf, df and score compute the textbook values") {
    val out = TfIdf.topTerms(docs, "id", "text", 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    // df: apple 2, banana 2, cherry 2, date 1; N = 3
    val idf2 = math.log(3.0 / 2.0)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out.contains((1L, "apple", 2L, 2L, r4(2 * idf2))))
    assert(out.contains((2L, "cherry", 3L, 2L, r4(3 * idf2))))
    assert(out.contains((3L, "date", 1L, 1L, r4(math.log(3.0)))))
  }

  test("top-k ranks by rounded score desc with term as tiebreak and " +
    "caps at k per document") {
    val out = TfIdf.topTerms(docs, "id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: apple 2·ln1.5 beats banana/cherry 1·ln1.5
    assert(out(1L) == "apple")
    // doc 2: cherry 3·ln1.5 ≈ 1.2164 beats banana ≈ 0.4055
    assert(out(2L) == "cherry")
    // doc 3: date 1·ln3 ≈ 1.0986 beats apple 1·ln1.5
    assert(out(3L) == "date")
    assert(TfIdf.topTerms(docs, "id", "text", 2)
      .groupBy("id").count().collect().forall(_.getLong(1) <= 2))
  }

  test("terms present in every document score exactly zero, and ties " +
    "at zero break on term order") {
    val all = Seq((1L, "same text"), (2L, "same text")).toDF("id", "text")
    val out = TfIdf.topTerms(all, "id", "text", 2)
      .orderBy("id", "rn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(4)))
    assert(out.forall(_._3 == 0.0))
    assert(out.map(_._2).toSeq == Seq("same", "text", "same", "text"))
  }
}
