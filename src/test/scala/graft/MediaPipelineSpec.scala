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
}
