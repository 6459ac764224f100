package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val rows = Seq(
      (1L, "hello world".getBytes("UTF-8"), "text/plain"),
      (2L, Array[Byte](0, 1, 2, 3, -1), "application/octet-stream"),
      (3L, Array.empty[Byte], "application/octet-stream"))
    rows.toDF("media_id", "media", "format")
  }

  test("feature extraction: schema, determinism, exact checksums") {
    val out1 = Multimodal.extractFeatures(media, batchSize = 2)
    assert(out1.schema == Multimodal.featureSchema)
    val r1 = out1.collect().sortBy(_.getLong(0))
    val r2 = Multimodal.extractFeatures(media, batchSize = 1).collect().sortBy(_.getLong(0))
    assert(r1.map(_.toSeq).sameElements(r2.map(_.toSeq)), "batch size changed results")
    val byId = r1.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 11L) // n_bytes of "hello world"
    assert(byId(1L).getLong(2) == Multimodal.checksum("hello world".getBytes("UTF-8")))
    assert(byId(3L).getSeq[Float](3).toList == List.fill(8)(0f)) // empty blob → zeros
    assert(byId(2L).getSeq[Float](3)(2) == 255f) // max byte of (0,1,2,3,0xff)
  }

  test("documents table flows through the multimodal plumbing") {
    val m = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001/documents.parquet")
    assert(m.schema == Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(m)
    val n = feats.count()
    assert(n == m.count() && n > 0)
    // checksum is a pure function of bytes → re-run identical
    val a = feats.orderBy("media_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val b = Multimodal.extractFeatures(m).orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(a.sameElements(b))
  }
}
