package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Decoded-media metadata produced by the (stubbed) decoder. */
final case class MediaInfo(id: Long, width: Int, height: Int, frames: Int, codec: String)

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * `binary` columns with typed metadata alongside.
 *
 * The Spark-side mechanics are real and tested — binary payload column,
 * byte-level metadata extraction as codegen'd expressions, and a batched
 * per-partition decode pass (the shape a JNI/FFI decoder needs: one library
 * handle per partition, bytes in, struct out). The decode itself is a
 * clearly-marked deterministic STUB because no media codecs ship in this
 * environment; swapping `fakeDecode` for a real decoder changes no plumbing.
 *
 * Scale notes: payload bytes stay in the executor (no driver collect); decode
 * is a narrow mapPartitions (no shuffle); metadata-only queries prune the
 * payload column at the parquet scan, so `SELECT meta FROM media` never reads
 * the blobs.
 */
object Multimodal {

  /** Attach a binary payload column. In production this is the raw media blob
    * column of the table; here we derive bytes from a string column so the
    * plumbing is exercisable on the text testdata. */
  def withPayload(df: DataFrame, src: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(src), "UTF-8"))

  /** Byte-level metadata, no decode: size, content hash, leading-bytes magic.
    * Pure expressions — runs inside the scan stage. */
  def extractMeta(df: DataFrame, key: String, payloadCol: String = "payload"): DataFrame =
    df.select(
      col(key).as("id"),
      length(col(payloadCol)).cast("long").as("n_bytes"),
      lower(hex(substring(col(payloadCol), 1, 4))).as("magic"),
      md5(col(payloadCol)).as("content_md5"))

  /** Deterministic fake decode — STUB for the real codec call. Derives fake
    * dimensions from the payload bytes so tests are stable. */
  private def fakeDecode(id: Long, payload: Array[Byte]): MediaInfo = {
    val n = payload.length
    MediaInfo(id,
      width = 16 + (n % 640),
      height = 16 + ((n / 7) % 480),
      frames = 1 + (n % 24),
      codec = if (n % 2 == 0) "fake/even" else "fake/odd")
  }

  /**
   * Batched decode pass: one decoder context per partition, rows streamed
   * through it. Mirrors how a real image/audio decoder is integrated (library
   * init per partition, not per row; bytes never leave the executor).
   */
  def decode(df: DataFrame, key: String, payloadCol: String = "payload"): Dataset[MediaInfo] = {
    val rows = df.select(col(key).cast("long"), col(payloadCol))
    rows.mapPartitions { it =>
      // real integration point: open codec/library handle here, close after
      it.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(Encoders.product[MediaInfo])
  }

  /** Frame sampling shape: every kth frame index of a decoded video row —
    * generates (id, frame_idx) without materializing frames. */
  def sampleFrameIndexes(decoded: Dataset[MediaInfo], everyK: Int): DataFrame =
    decoded.toDF().select(col("id"),
      explode(sequence(lit(0), col("frames") - 1, lit(everyK))).as("frame_idx"))

  /** A resized payload row (width/height are the requested target). */
  final case class ResizedMedia(id: Long, width: Int, height: Int, payload: Array[Byte])

  /**
   * Resize pass — same batched per-partition shape as [[decode]]. The STUB
   * "resize" deterministically truncates the payload to the target byte budget
   * (w*h*3, an RGB frame) so output sizes are data-derived and testable; a
   * real implementation swaps the body for the codec's scale call, changing
   * no plumbing, schema, or partitioning.
   */
  def resize(df: DataFrame, key: String, targetW: Int, targetH: Int,
             payloadCol: String = "payload"): Dataset[ResizedMedia] = {
    val budget = targetW * targetH * 3
    val rows = df.select(col(key).cast("long"), col(payloadCol))
    rows.mapPartitions { it =>
      // real integration point: open codec/scaler handle here, close after
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        ResizedMedia(r.getLong(0), targetW, targetH,
          java.util.Arrays.copyOf(bytes, math.min(bytes.length, budget)))
      }
    }(Encoders.product[ResizedMedia])
  }
}
