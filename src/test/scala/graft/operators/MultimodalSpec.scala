package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private lazy val bin = Multimodal.asBinary(
    spark.read.parquet(s"$sfDir/documents.parquet").limit(50),
    "doc_id", "text")

  test("asBinary computes digest and byte length natively") {
    val r = bin.collect()
    assert(r.length == 50)
    r.foreach { row =>
      val payload = row.getAs[Array[Byte]]("payload")
      assert(row.getAs[Long]("byte_len") == payload.length)
      assert(row.getAs[String]("sha256").matches("[0-9a-f]{64}"))
    }
  }

  test("decodeFeatures runs per partition and is deterministic") {
    val a = Multimodal.decodeFeatures(spark, bin).collect()
      .sortBy(_.mediaId)
    val b = Multimodal.decodeFeatures(spark, bin.repartition(7)).collect()
      .sortBy(_.mediaId)
    assert(a.length == 50)
    assert(a.toSeq == b.toSeq) // partitioning must not change results
    a.foreach { m =>
      assert(m.width >= 1 && m.width <= 1920)
      assert(m.height >= 1 && m.height <= 1080)
      assert(m.channels == 1 || m.channels == 3)
    }
  }

  test("fakeDecode is a pure function of bytes") {
    val x = "hello".getBytes("UTF-8")
    assert(Multimodal.fakeDecode(x) == Multimodal.fakeDecode(x.clone()))
  }
}
