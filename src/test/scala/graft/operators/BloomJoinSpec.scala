package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val fact = (1L to 1000L).map(i => (i, i % 100))
    .toDF("fact_id", "fk")
  private lazy val dim = Seq((3L, "a"), (7L, "b"), (42L, "c"))
    .toDF("dk", "name")

  test("result equals the plain inner join (false positives scrubbed)") {
    val bloomed = BloomJoin.join(fact, dim, "fk", "dk", expectedItems = 10L)
      .select("fact_id", "fk", "dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fact_id", "fk", "dk", "name")
    assert(bloomed.except(plain).count() == 0)
    assert(plain.except(bloomed).count() == 0)
    assert(bloomed.count() == 30) // 10 fact rows per dim key
  }

  test("bloom pre-filter prunes most of the fact side before the join") {
    val bf = dim.stat.bloomFilter("dk", 10L, 0.01)
    val kept = fact.filter(udf((k: Long) => bf.mightContainLong(k))
      .apply(col("fk"))).count()
    // 30 true matches; fpp 1% on the other 970 rows leaves a wide margin.
    assert(kept >= 30 && kept <= 80, s"bloom kept $kept of 1000")
  }

  test("null fact keys are dropped, not passed to the filter") {
    val withNulls = fact.union(Seq((9999L, null.asInstanceOf[java.lang.Long]))
      .map(t => (t._1, Option(t._2).map(Long2long).getOrElse(0L)))
      .toDF("fact_id", "fk").withColumn("fk",
        when(col("fact_id") === 9999L, lit(null)).otherwise(col("fk"))))
    val r = BloomJoin.join(withNulls, dim, "fk", "dk", expectedItems = 10L)
    assert(r.filter(col("fact_id") === 9999L).count() == 0)
  }
}
