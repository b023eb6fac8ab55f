package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark

  private def media = Multimodal.asMediaTable(SparkT.table("documents"))

  test("media table carries binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("n_bytes").dataType.typeName == "long")
    assert(media.count() == 500)
  }

  test("batch decode emits one feature row per payload, stable sha") {
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() == 500)
    // mapPartitions sha must equal the declarative sha2 path
    val joined = feats.toDF().select(col("doc_id"), col("sha256").as("sha_mp"))
      .join(Multimodal.metadataFeatures(media).select(col("doc_id"), col("sha256")), "doc_id")
    assert(joined.filter(col("sha_mp") =!= col("sha256")).count() == 0)
  }

  test("stub decoder is deterministic in payload bytes") {
    val a = Multimodal.StubDecoder.decode("same bytes".getBytes)
    val b = Multimodal.StubDecoder.decode("same bytes".getBytes)
    assert(a == b)
  }

  test("frame sample plan caps frames and strides deterministically") {
    val planned = Multimodal.frameSamplePlan(media, stride = 10, maxFrames = 8)
    val r = planned.select(size(col("sampled_frames")).as("n")).collect()
    assert(r.forall(_.getInt(0) <= 8))
  }
}
