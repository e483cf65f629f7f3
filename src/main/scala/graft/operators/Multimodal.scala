package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Multimodal binary-column surface (declared half; the mapPartitions
  * decode plumbing lives in graft.multimodal.MediaPipeline and is
  * spec-tested). This query treats document text bytes as an opaque
  * payload: byte length, SHA-256 content fingerprint, and
  * deterministic pseudo-dimensions derived from the digest — the exact
  * metadata shape a real media table carries, fully SQL-expressible so
  * the DuckDB oracle can verify it.
  */
object Multimodal extends QueryModule {

  val multimodalBinaryMeta = Q(
    "multimodal_binary_meta",
    (spark, dir) => {
      import spark.implicits._
      Tables
        .documents(spark, dir)
        .select(
          $"doc_id",
          octet_length($"text").as("n_bytes"),
          sha2($"text".cast("binary"), 256).as("sha"))
        .withColumn("width",
          lit(64) + (ascii(substring($"sha", 1, 1)) * 256 + ascii(substring($"sha", 2, 1))) % 576)
        .withColumn("height",
          lit(64) + (ascii(substring($"sha", 3, 1)) * 256 + ascii(substring($"sha", 4, 1))) % 416)
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, n_bytes, sha,
        64 + (ascii(substr(sha, 1, 1)) * 256 + ascii(substr(sha, 2, 1))) % 576 AS width,
        64 + (ascii(substr(sha, 3, 1)) * 256 + ascii(substr(sha, 4, 1))) % 416 AS height
      FROM (
        SELECT doc_id,
          octet_length(encode(text)) AS n_bytes,
          sha256(text) AS sha
        FROM documents)
      ORDER BY doc_id
    """.stripMargin.trim))

  /** Frame sampling declared relationally: frame count is derived from
    * the sha fingerprint (so the DuckDB oracle can reproduce it — the
    * mapPartitions codec path computing real frame counts is spec-tested
    * in MediaPipelineSpec), then every 8th frame index is exploded out.
    * One row per kept frame, no shuffle: scales with the scan.
    */
  val multimodalFrameSample = Q(
    "multimodal_frame_sample",
    (spark, dir) => {
      import spark.implicits._
      Tables
        .documents(spark, dir)
        .select($"doc_id", sha2($"text".cast("binary"), 256).as("sha"))
        .withColumn("frames",
          lit(1) + (ascii(substring($"sha", 5, 1)) * 256 + ascii(substring($"sha", 6, 1))) % 120)
        .select($"doc_id", $"frames",
          explode(sequence(lit(0), $"frames" - 1, lit(8))).as("frame_idx"))
        .orderBy($"doc_id", $"frame_idx")
    },
    Some("""
      SELECT doc_id,
        CAST(frames AS BIGINT) AS frames,
        CAST(UNNEST(range(0, frames, 8)) AS BIGINT) AS frame_idx
      FROM (
        SELECT doc_id,
          1 + (ascii(substr(sha256(text), 5, 1)) * 256
               + ascii(substr(sha256(text), 6, 1))) % 120 AS frames
        FROM documents)
      ORDER BY doc_id, frame_idx
    """.stripMargin.trim))

  def qs: Seq[Q] = Seq(multimodalBinaryMeta, multimodalFrameSample)
}
