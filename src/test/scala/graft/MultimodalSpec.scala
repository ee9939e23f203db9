package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"), (2L, ""), (3L, "x" * 100)).toDF("doc_id", "text")

  test("withBlob produces a BINARY column carrying the exact bytes") {
    val blobs = Multimodal.withBlob(docs, "doc_id", "text")
    assert(blobs.schema("blob").dataType.typeName == "binary")
    val got = blobs.select("doc_id", "blob").as[(Long, Array[Byte])].collect().toMap
    assert(new String(got(1L), "UTF-8") == "hello world")
    assert(got(2L).isEmpty)
  }

  test("decodeFeaturesStub: deterministic fixed-shape features, empty-safe") {
    val out = Multimodal.decodeFeaturesStub(
      Multimodal.withBlob(docs, "doc_id", "text"), spark)
    assert(out.schema == Multimodal.featureSchema)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) == 11L)               // n_bytes
    assert(rows(2L).getLong(1) == 0L)                // empty blob ok
    assert(rows(1L).getSeq[Float](5).length == 8)    // fixed feature dim
    // determinism: same input → same feature
    val again = Multimodal.decodeFeaturesStub(
      Multimodal.withBlob(docs, "doc_id", "text"), spark).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](5)).toMap
    assert(again(3L) == rows(3L).getSeq[Float](5))
  }

  test("resizeMeta: fits within maxSide, preserves aspect, never upscales") {
    val decoded = Multimodal.decodeFeaturesStub(
      Multimodal.withBlob(docs, "doc_id", "text"), spark)
    val got = Multimodal.resizeMeta(decoded, maxSide = 32)
      .select("doc_id", "width", "height", "out_width", "out_height")
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, w, h, ow, oh) =>
      assert(ow <= 32 && oh <= 32 && ow >= 1 && oh >= 1, s"doc $id out of bounds")
      assert(ow <= w && oh <= h, s"doc $id upscaled")
      if (math.max(w, h) <= 32) assert(ow == w && oh == h, s"doc $id needlessly resized")
      // aspect preserved within ceil rounding: same scale applied to both
      else {
        val s = 32.0 / math.max(w, h)
        assert(ow == math.max(1, math.ceil(w * s).toInt), s"doc $id width scale")
        assert(oh == math.max(1, math.ceil(h * s).toInt), s"doc $id height scale")
      }
    }
  }

  test("sampleChunks: chunk count and strided fingerprints") {
    val out = Multimodal.sampleChunks(
      Multimodal.withBlob(docs, "doc_id", "text"), spark, chunkSize = 16, stride = 4)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getInt(1) == 7)                  // 100 bytes → 7 chunks of 16
    assert(byId(3L).getSeq[Long](2).length == 2)     // chunks 0 and 4 sampled
    assert(byId(2L).getInt(1) == 0)
    // identical chunks ("x"*16) hash identically
    val fps = byId(3L).getSeq[Long](2)
    assert(fps(0) == fps(1))
  }
}
