package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("codes stay in [-127, 127] and the max-magnitude element hits 127") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = Quantize.withInt8(emb, "embedding", "scale", "codes")
    val stats = q.select(
      array_min(col("codes")).as("mn"), array_max(col("codes")).as("mx"),
      greatest(abs(array_min(col("codes"))), abs(array_max(col("codes"))))
        .as("absmx"))
      .agg(min("mn"), max("mx"), min("absmx")).collect()(0)
    assert(stats.getInt(0) >= -127 && stats.getInt(1) <= 127)
    assert(stats.getInt(2) == 127) // scale is per-vector max|v|/127
  }

  test("dequantized vectors approximate the originals within scale/2") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val q = Quantize.withInt8(emb, "embedding", "scale", "codes")
    val maxErr = q.select(
      array_max(zip_with(col("embedding"),
        Quantize.dequantize(col("codes"), col("scale")),
        (o, r) => abs(o.cast("double") - r))).as("err"),
      col("scale"))
      .filter(col("err") > col("scale") * 0.5 + 1e-12)
      .count()
    assert(maxErr == 0, "reconstruction error exceeded half a step")
  }

  test("zero vector quantizes to zero codes with zero scale") {
    val df = Seq(Array(0.0f, 0.0f, 0.0f)).toDF("embedding")
    val r = Quantize.withInt8(df, "embedding", "scale", "codes").collect()(0)
    assert(r.getAs[Double]("scale") == 0.0)
    assert(r.getSeq[Int](r.fieldIndex("codes")) == Seq(0, 0, 0))
  }
}
