package graft

import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}

/** The multimodal plumbing must be real even though the codec is a stub:
  * binary columns survive the scan, the mapPartitions decode is
  * distributed and deterministic, and the decoded struct is relational
  * downstream.
  */
class MediaPipelineSpec extends SparkSpecBase {

  private def payloads = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))

  test("decode preserves row count, schema, and determinism") {
    val out = MediaPipeline.decodeDocuments(payloads)
    assert(out.schema("n_bytes").dataType == LongType)
    assert(out.schema("width").dataType == IntegerType)
    val a = out.collect().map(_.toString).sorted.toSeq
    val b = MediaPipeline.decodeDocuments(payloads.repartition(7)).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b, "decode depends on partitioning")
    assert(a.size == payloads.count())
  }

  test("decoded metadata matches the codec applied driver-side") {
    import spark.implicits._
    val rows = MediaPipeline.decodeDocuments(payloads).collect()
      .map(d => d.doc_id -> d).toMap
    val local = payloads.as[(Long, Array[Byte])].collect()
    for ((id, bytes) <- local) {
      val m = MediaPipeline.FakeCodec.decode(bytes)
      val d = rows(id)
      assert((d.n_bytes, d.width, d.height, d.frames) == (m.n_bytes, m.width, m.height, m.frames))
    }
  }

  test("decoded output joins back relationally") {
    val joined = MediaPipeline.decodeDocuments(payloads).toDF()
      .join(Tables.documents(spark, sfDir), "doc_id")
    assert(joined.filter(col("n_bytes") =!= length(col("text"))).count() == 0)
  }

  test("resize emits bounded payloads, deterministically, for every row") {
    val out = MediaPipeline.resizeDocuments(payloads, 128, 96).collect()
    assert(out.length == payloads.count())
    val expectedLen = 128 * 96 / 64
    assert(out.forall(r => r.width == 128 && r.height == 96 &&
      r.payload.length == expectedLen))
    val again = MediaPipeline.resizeDocuments(payloads.repartition(5), 128, 96)
      .collect().map(r => r.doc_id -> r.payload.toSeq).toMap
    for (r <- out)
      assert(again(r.doc_id) == r.payload.toSeq, s"resize nondeterministic for ${r.doc_id}")
  }

  test("frame sampling keeps every 8th frame index per decoded doc") {
    import spark.implicits._
    val decoded = MediaPipeline.decodeDocuments(payloads)
    val sampled = MediaPipeline.sampleFrames(decoded, 8)
      .select($"doc_id", $"frames", $"frame_idx")
      .as[(Long, Int, Int)].collect()
    val byDoc = sampled.groupBy(_._1)
    val frames = decoded.collect().map(d => d.doc_id -> d.frames).toMap
    assert(byDoc.keySet == frames.keySet, "every doc must emit at least frame 0")
    for ((id, rows) <- byDoc) {
      val idxs = rows.map(_._3).sorted.toSeq
      assert(idxs == (0 until frames(id) by 8).toSeq, s"doc $id kept $idxs")
    }
  }
}
