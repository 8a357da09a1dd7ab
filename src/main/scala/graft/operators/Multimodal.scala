package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata structs; decode/feature
  * steps run per-partition over iterators (the Scala analogue of
  * mapInPandas' batch shape) so a real codec would amortize its init cost
  * across a partition, not pay it per row.
  *
  * The actual byte→pixels decode is STUBBED (no image/audio libs in this
  * container): `fakeDecode` derives deterministic pseudo-metadata from the
  * bytes. Everything around it — schema, encoders, partition-iterator
  * plumbing, digesting, batching — is real and tested; swapping in javacv/
  * soundlibs later means replacing one function body.
  */
object Multimodal {

  /** Typed metadata a decoder would produce for an image-ish payload. */
  case class MediaMeta(
      mediaId: Long, byteLen: Long, sha256: String,
      width: Int, height: Int, channels: Int)

  /** STUB decode: deterministic fake dimensions derived from the payload
    * bytes. A real implementation would hand `bytes` to an image codec.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    (((h & 0x7fffffff) % 1920) + 1, (((h >> 8) & 0x7fffffff) % 1080) + 1,
      if ((h & 1) == 0) 3 else 1)
  }

  /** Binary ingestion: project an id + binary payload (here: utf-8 text
    * bytes standing in for a media blob) with digest + length computed as
    * native expressions — these never leave codegen.
    */
  def asBinary(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      sha2(col(payloadCol).cast("binary"), 256).as("sha256"),
      octet_length(col(payloadCol)).cast("long").as("byte_len"))

  /** Decode + feature-extract over partition iterators. Batch shape
    * mirrors mapInPandas: one decoder instantiation per partition, rows
    * streamed through it.
    */
  def decodeFeatures(spark: SparkSession, binDf: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    binDf.select("media_id", "payload", "sha256", "byte_len")
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { rows =>
        // real codec init would happen here, once per partition
        rows.map { case (id, bytes, sha, len) =>
          val (w, h, c) = fakeDecode(bytes)
          MediaMeta(id, len, sha, w, h, c)
        }
      }
  }

  /** Resized-image metadata + a fixed-size feature vector. STUB resample:
    * a real implementation hands the payload to a resize kernel; the fake
    * derives a deterministic dim-`featDim` embedding from rolling byte
    * windows so the downstream plumbing (fixed-width array schema, ANN
    * compatibility) is exercised for real.
    */
  case class ResizedMedia(mediaId: Long, width: Int, height: Int,
      features: Array[Float])

  def resizeAndFeaturize(spark: SparkSession, binDf: DataFrame,
      targetW: Int, targetH: Int, featDim: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    binDf.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val feats = new Array[Float](featDim)
          var i = 0
          while (i < bytes.length) {
            feats(i % featDim) += (bytes(i) & 0xff) / 255.0f
            i += 1
          }
          ResizedMedia(id, targetW, targetH, feats)
        }
      }
  }

  /** Frame sampling for video-ish payloads: emit every `stride`-th chunk
    * of `frameBytes` bytes as its own row (media_id, frame_idx, digest,
    * n_bytes) — the explode-shaped operator a frame pipeline needs. The
    * chunking is the stub; the one-to-many row shape, per-frame digests,
    * and ordering are the real plumbing.
    */
  case class Frame(mediaId: Long, frameIdx: Int, sha256: String,
      nBytes: Int)

  def sampleFrames(spark: SparkSession, binDf: DataFrame,
      frameBytes: Int, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    binDf.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        (0 until bytes.length by frameBytes).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (off, i) =>
            val end = math.min(off + frameBytes, bytes.length)
            val chunk = java.util.Arrays.copyOfRange(bytes, off, end)
            val hex = md.digest(chunk).map("%02x".format(_)).mkString
            Frame(id, i, hex, end - off)
          }
      }
  }
}
