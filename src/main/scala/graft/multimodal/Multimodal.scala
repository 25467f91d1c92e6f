package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/
 * video travel as opaque BINARY columns with typed metadata; decode /
 * feature-extraction / resize / frame-sampling run as *batched*
 * partition-local transforms (the Scala/Tungsten equivalent of the
 * mapInPandas batch shape — one buffer of records at a time, vectorizable
 * per batch, no per-row JVM<->native churn).
 *
 * The actual codec calls are STUBBED deterministically (this container
 * ships no image/audio libraries): [[MediaCodec.decodeStub]] derives
 * metadata + a feature vector purely from the bytes. The Spark-side
 * contract — schema, batching, null handling, partition preservation —
 * is real and tested; swapping in a real codec changes only the stub body.
 */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(format: String, width: Int, height: Int,
      channels: Int, durationMs: Long)

  final case class MediaRow(id: Long, mediaType: String, media: Array[Byte])
  final case class DecodedRow(id: Long, mediaType: String, meta: MediaMeta,
      features: Array[Float])
  final case class FrameRow(id: Long, frameIdx: Int, frameBytes: Array[Byte])

  object MediaCodec {
    /** STUB — deterministic fake decode: header-derived metadata and a
     * 16-dim byte-histogram feature. A real build replaces this body with
     * an actual codec (??? markers intentionally absent: the stub must
     * run in tests). */
    def decodeStub(mediaType: String, bytes: Array[Byte]): (MediaMeta, Array[Float]) = {
      val w = if (bytes.length >= 2) ((bytes(0) & 0xff) << 4 | (bytes(1) & 0x0f)) + 1 else 1
      val h = if (bytes.length >= 4) ((bytes(2) & 0xff) << 4 | (bytes(3) & 0x0f)) + 1 else 1
      val channels = mediaType match {
        case "image" => 3
        case "audio" => 1
        case _ => 3
      }
      val hist = new Array[Float](16)
      bytes.foreach(b => hist((b & 0xff) >> 4) += 1f)
      val n = math.max(1, bytes.length)
      var i = 0
      while (i < 16) { hist(i) /= n; i += 1 }
      (MediaMeta(mediaType, w, h, channels, bytes.length.toLong), hist)
    }

    /** STUB frame sampler: every `stride`-th 64-byte slice is a "frame". */
    def sampleFramesStub(bytes: Array[Byte], stride: Int): Array[Array[Byte]] =
      (0 until bytes.length by (64 * stride)).map { off =>
        java.util.Arrays.copyOfRange(bytes, off, math.min(off + 64, bytes.length))
      }.toArray

    /** STUB resize — nearest-neighbor over the payload interpreted as a
     * stride-`rowStride` single-channel image (hSrc = len/rowStride rows,
     * zero-padded when the payload is shorter than one row). Pure integer
     * arithmetic (truncating division) so the transform replays exactly
     * in SQL; a real build swaps in a codec + interpolating resampler
     * behind the same (id, pixels) contract. */
    def resizeStub(bytes: Array[Byte], w2: Int, h2: Int,
        rowStride: Int): Array[Int] = {
      val hSrc = math.max(1, bytes.length / rowStride)
      val out = new Array[Int](w2 * h2)
      var y = 0
      while (y < h2) {
        val srcY = y * hSrc / h2
        var x = 0
        while (x < w2) {
          val srcIdx = srcY * rowStride + x * rowStride / w2
          out(y * w2 + x) = if (srcIdx < bytes.length) bytes(srcIdx) & 0xff else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Batched decode: (id, media_type, media BINARY) ->
   * (id, media_type, meta STRUCT, features ARRAY<FLOAT>). */
  def decode(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("media_type").as("mediaType"), col("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        // batch shape: pull batchSize rows, process as one buffer
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (meta, feats) = MediaCodec.decodeStub(r.mediaType, r.media)
            DecodedRow(r.id, r.mediaType, meta, feats)
          }
        }
      }
      .toDF("id", "media_type", "meta", "features")
  }

  /** Batched frame sampling for video/audio payloads ->
   * one row per (id, frame_idx). */
  def sampleFrames(df: DataFrame, stride: Int = 4, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("media_type").as("mediaType"), col("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            MediaCodec.sampleFramesStub(r.media, stride).zipWithIndex
              .map { case (f, i) => FrameRow(r.id, i, f) }
          }
        }
      }
      .toDF("id", "frame_idx", "frame_bytes")
  }

  final case class ResizedRow(id: Long, width: Int, height: Int,
      pixels: Array[Int])

  /** Batched resize: (id, media_type, media BINARY) ->
   * (id, width, height, pixels ARRAY<INT>) at the target dimensions. */
  def resize(df: DataFrame, width: Int = 8, height: Int = 8,
      rowStride: Int = 64, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("media_type").as("mediaType"), col("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            ResizedRow(r.id, width, height,
              MediaCodec.resizeStub(r.media, width, height, rowStride))
          }
        }
      }
      .toDF("id", "width", "height", "pixels")
  }

  /** Join decoded features back onto an embedding search: media similarity
   * = cosine top-k over the stub features (plumbing demo). */
  def featureTopK(decoded: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = decoded.where(col("id") === queryId)
      .select(col("features").as("qf"))
    decoded.join(broadcast(q))
      .select(col("id"),
        graft.functions.Distances.cosine(col("qf"), col("features")).as("dist"))
      .orderBy(col("dist"), col("id"))
      .limit(k)
  }
}
