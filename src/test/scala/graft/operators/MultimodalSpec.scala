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

  test("resizeAndFeaturize emits fixed-width vectors usable by the ANN ops") {
    val out = Multimodal.resizeAndFeaturize(spark, bin, 224, 224, 16)
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(r => r.width == 224 && r.height == 224))
    // vectors feed straight into the similarity operator
    val df = out.toDF().select(col("mediaId").as("id"),
      col("features").as("vec"))
    val q = df.limit(1).select(col("id").as("qid"), col("vec").as("qvec"))
    val top = Similarity.bruteForceTopK(q, df, 3)
    assert(top.count() == 3)
  }

  test("sampleFrames explodes payloads into ordered per-frame rows") {
    val frames = Multimodal.sampleFrames(spark, bin, frameBytes = 64,
      stride = 2).collect()
    assert(frames.nonEmpty)
    // per media: frame indices are even (stride 2) and digests differ
    val byMedia = frames.groupBy(_.mediaId)
    byMedia.values.foreach { fs =>
      assert(fs.forall(_.frameIdx % 2 == 0))
      assert(fs.map(_.sha256).distinct.length == fs.length)
      assert(fs.forall(_.nBytes <= 64))
    }
    // deterministic under repartitioning
    val again = Multimodal.sampleFrames(spark, bin.repartition(5), 64, 2)
      .collect().sortBy(f => (f.mediaId, f.frameIdx)).toSeq
    assert(again == frames.sortBy(f => (f.mediaId, f.frameIdx)).toSeq)
  }

  test("sampleFrames at stride 1 conserves every payload byte") {
    // narrow import: functions.bin would shadow this suite's `bin` frame
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    val all = Multimodal.sampleFrames(spark, bin, frameBytes = 64, stride = 1)
      .toDF().groupBy("mediaId").agg(sum("nBytes").as("frame_bytes"),
        count(lit(1)).as("n_frames"), max("frameIdx").as("max_idx"))
    val lens = bin.select(col("media_id"), col("byte_len"))
    val bad = all.join(lens, col("mediaId") === col("media_id"))
      .filter(col("frame_bytes") =!= col("byte_len") ||
        col("n_frames") =!= col("max_idx") + 1)
      .count()
    assert(bad == 0) // no byte lost or duplicated, no frame index gap
  }

  test("imageHeaderDecode inverts the header constructors for every " +
    "(w, h, depth, pad) dial, and surfaces unparseable rows as nulls") {
    import spark.implicits._
    val dials = (for (i <- 1L to 60L) yield i).toDF("i")
      .select(col("i"),
        (col("i") * 977 % 65000 + 1).cast("int").as("w"),
        (col("i") * 131 % 50000 + 1).cast("int").as("h"),
        when(col("i") % 3 === 0, 16).otherwise(8).as("dep"),
        (col("i") % 13).cast("int").as("pad"))
    val png = Multimodal.imageHeaderDecode(
      dials.select(col("i"),
        Multimodal.pngHeaderBytes(col("w"), col("h"), col("dep"),
          lit(6)).as("p")), "i", "p")
    png.collect().foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(1) == "png")
      assert(r.getInt(2) == (i * 977 % 65000 + 1).toInt, s"w at $i")
      assert(r.getInt(3) == (i * 131 % 50000 + 1).toInt, s"h at $i")
      assert(r.getInt(4) == (if (i % 3 == 0) 16 else 8), s"depth at $i")
    }
    val jpg = Multimodal.imageHeaderDecode(
      dials.select(col("i"),
        Multimodal.jpegHeaderBytes(col("w"), col("h"), col("pad"))
          .as("p")), "i", "p")
    // JPEG dims are BE16 fields: the dial arithmetic stays under 2^16
    jpg.collect().foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(1) == "jpeg")
      assert(r.getInt(2) == (i * 977 % 65000 + 1).toInt, s"w at $i")
      assert(r.getInt(3) == (i * 131 % 50000 + 1).toInt, s"h at $i")
      assert(r.getInt(4) == 8)
    }
    // unparseable payloads and null payloads: all four fields null
    val bad = Multimodal.imageHeaderDecode(
      Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
        .toDF("i", "p"), "i", "p").collect()
    bad.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) &&
        r.isNullAt(4))
    }
  }

  test("imageHeaderDecode reads real files through the binaryFile " +
    "source — the actual multimodal ingestion path, end to end") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-media").toFile
    // a REAL complete 1x1 PNG (the canonical 67-byte transparent
    // pixel: signature, IHDR w/ its correct CRC, IDAT, IEND)
    val png = (Seq(
      0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".map(_.toInt) ++ Seq(
      0, 0, 0, 1, 0, 0, 0, 1, 8, 6, 0, 0, 0, 0x1f, 0x15, 0xc4, 0x89,
      0, 0, 0, 0x0a) ++ "IDAT".map(_.toInt) ++ Seq(
      0x78, 0x9c, 0x63, 0x00, 0x01, 0x00, 0x00, 0x05, 0x00, 0x01,
      0x0d, 0x0a, 0x2d, 0xb4, 0, 0, 0, 0) ++ "IEND".map(_.toInt) ++
      Seq(0xae, 0x42, 0x60, 0x82)).map(_.toByte).toArray
    // a minimal real-structure JPEG header (SOI, JFIF APP0, DQT, SOF0
    // 2x3) with an EOI so the file is well-formed front to back
    val jpg = (Seq(
      0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10) ++ "JFIF".map(_.toInt) ++ Seq(
      0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xdb, 0x00, 0x43, 0x00) ++ Seq.fill(64)(0) ++ Seq(
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x02, 0x00, 0x03, 0x01,
      0x01, 0x11, 0x00, 0xff, 0xd9)).map(_.toByte).toArray
    java.nio.file.Files.write(
      new java.io.File(dir, "a.png").toPath, png)
    java.nio.file.Files.write(
      new java.io.File(dir, "b.jpg").toPath, jpg)
    val files = spark.read.format("binaryFile").load(dir.getAbsolutePath)
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        col("content"))
    val got = Multimodal.imageHeaderDecode(files, "name", "content")
      .orderBy("name").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "a.png" &&
      got(0).getString(1) == "png" && got(0).getInt(2) == 1 &&
      got(0).getInt(3) == 1 && got(0).getInt(4) == 8)
    assert(got(1).getString(0) == "b.jpg" &&
      got(1).getString(1) == "jpeg" && got(1).getInt(2) == 3 &&
      got(1).getInt(3) == 2 && got(1).getInt(4) == 8)
  }

  test("imageHeaderDecode reserves its output column names") {
    import spark.implicits._
    val clash = Seq((1L, Array[Byte](0))).toDF("i", "width")
    val e = intercept[IllegalArgumentException](
      Multimodal.imageHeaderDecode(clash, "i", "width"))
    assert(e.getMessage.contains("reserves column name"))
  }
}
