package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary`
  * columns with typed metadata travelling alongside. The actual codec
  * step is STUBBED (no image/audio libraries ship in this environment) —
  * `FakeCodec.decode` derives deterministic pseudo-metadata from the
  * bytes — but every Spark-side concern is real and tested:
  * binary-column schema, per-partition batched decode via mapPartitions
  * (the JVM analog of arrow-batched mapInPandas: amortize per-batch
  * codec setup, never collect to the driver), and downstream relational
  * processing of the decoded struct.
  *
  * Scale notes (100 TB of media): decode is embarrassingly parallel —
  * one pass, no shuffle; partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes` on the parquet scan. A real codec
  * drops into `FakeCodec.decode` without touching the plumbing.
  */
object MediaPipeline {

  case class MediaMeta(n_bytes: Long, width: Int, height: Int, frames: Int)
  case class DecodedDoc(doc_id: Long, n_bytes: Long, width: Int, height: Int, frames: Int)

  /** Deterministic stand-in for an image/audio/video codec. A real
    * implementation would parse `bytes`; this derives stable
    * pseudo-dimensions so tests have exact expectations.
    */
  object FakeCodec {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      // cheap deterministic content hash (not security-relevant)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val hAbs = math.abs(h)
      MediaMeta(n, 64 + (hAbs % 576).toInt, 64 + (hAbs / 576 % 416).toInt, 1 + (hAbs % 120).toInt)
    }
  }

  /** Batched decode: one codec "session" per partition, rows processed
    * in a single pass — the mapPartitions shape a real codec needs.
    * Input df must have (doc_id: Long, payload: Binary).
    */
  def decodeDocuments(df: DataFrame): Dataset[DecodedDoc] = {
    implicit val enc = Encoders.product[DecodedDoc]
    df.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        // per-partition codec init would happen here
        rows.map { case (id, payload) =>
          val m = FakeCodec.decode(payload)
          DecodedDoc(id, m.n_bytes, m.width, m.height, m.frames)
        }
      }
  }

  case class ResizedDoc(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Resize plumbing: same mapPartitions shape as decode, emitting a new
    * payload plus target dimensions. The pixel work is stubbed — the fake
    * "resampler" deterministically folds the source bytes into a
    * w*h/64-byte payload — but the contract a real resizer needs is
    * enforced: bounded output size, per-partition batching, no driver
    * collect, deterministic output for identical input.
    */
  def resizeDocuments(df: DataFrame, w: Int, h: Int): Dataset[ResizedDoc] = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    implicit val enc = Encoders.product[ResizedDoc]
    df.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        val outLen = math.max(1, w * h / 64)
        rows.map { case (id, payload) =>
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < payload.length) {
            out(i % outLen) = (out(i % outLen) + payload(i)).toByte
            i += 1
          }
          ResizedDoc(id, w, h, out)
        }
      }
  }

  /** Frame sampling: one row per kept frame (every `step`-th of the
    * decoded frame count) — pure relational explode over the decoded
    * metadata, no shuffle, so it scales with the scan. A real pipeline
    * would decode the kept frames' payloads in a subsequent
    * mapPartitions pass.
    */
  def sampleFrames(decoded: Dataset[DecodedDoc], step: Int): DataFrame = {
    require(step > 0, "step must be positive")
    decoded.toDF()
      .select(col("doc_id"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(step))).as("frame_idx"))
  }
}
