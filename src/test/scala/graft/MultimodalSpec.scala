package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val rows = Seq(
      (1L, "hello world".getBytes("UTF-8"), "text/plain"),
      (2L, Array[Byte](0, 1, 2, 3, -1), "application/octet-stream"),
      (3L, Array.empty[Byte], "application/octet-stream"),
      (4L, null: Array[Byte], "application/octet-stream")) // nullable blob
    rows.toDF("media_id", "media", "format")
  }

  test("feature extraction: schema, determinism, exact checksums") {
    val out1 = Multimodal.extractFeatures(media)
    assert(out1.schema == Multimodal.featureSchema)
    val r1 = out1.collect().sortBy(_.getLong(0))
    val r2 = Multimodal.extractFeatures(media).collect().sortBy(_.getLong(0))
    assert(r1.map(_.toSeq).sameElements(r2.map(_.toSeq)), "re-run changed results")
    val byId = r1.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 11L) // n_bytes of "hello world"
    assert(byId(1L).getLong(2) == Multimodal.checksum("hello world".getBytes("UTF-8")))
    assert(byId(3L).getSeq[Float](3).toList == List.fill(8)(0f)) // empty blob → zeros
    assert(byId(4L).getLong(1) == 0L && byId(4L).getSeq[Float](3).toList == List.fill(8)(0f),
      "NULL blob must degrade like the empty blob, not NPE the task")
    assert(byId(2L).getSeq[Float](3)(2) == 255f) // max byte of (0,1,2,3,0xff)
  }

  test("imageDecode: real ImageIO decode of in-memory PNG and BMP fixtures") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def bmp(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, png(4, 3, 0xff0000), "image/png"),      // solid red
      (2L, bmp(2, 2, 0x0000ff), "image/bmp"),      // solid blue
      (3L, "not an image".getBytes("UTF-8"), "text/plain"))
    val df = rows.toDF("media_id", "media", "format")
    val out = Multimodal.extractFeatures(df, decodeFn = Multimodal.imageDecode)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    // features: (width, height, meanR, meanG, meanB, meanA, pixels, 0)
    assert(out(1L).take(5) == Seq(4f, 3f, 255f, 0f, 0f), s"png: ${out(1L)}")
    assert(out(1L)(6) == 12f)
    assert(out(2L).take(5) == Seq(2f, 2f, 0f, 0f, 255f), s"bmp: ${out(2L)}")
    assert(out(3L).forall(_ == -1f), "undecodable bytes must degrade to -1s, not fail")
  }

  test("thumbnail: deterministic nearest-neighbor grid, exact pixels; frames clamp to the blob") {
    // a 4x4 image with distinct quadrant colors: a 2x2 thumbnail must pick
    // the exact top-left pixel of each quadrant (grid sampling, not
    // platform-interpolated scaling)
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val quad = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, quad((y / 2) * 2 + x / 2))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    val t = Multimodal.thumbnail(bytes, 2, 2)
    assert(t.toSeq == Seq(255f, 0f, 0f, 0f, 255f, 0f, 0f, 0f, 255f, 255f, 255f, 255f), t.toSeq)
    assert(Multimodal.thumbnail("junk".getBytes("UTF-8"), 2, 2).isEmpty)
    // DataFrame-level plumbing
    val df = Seq((1L, bytes), (2L, "junk".getBytes("UTF-8"))).toDF("media_id", "media")
    val out = Multimodal.extractThumbnails(df, 2, 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L).length == 12 && out(2L).isEmpty)
    // frame sampling: n evenly spaced windows, clamped at the tail
    val blob = (0 until 100).map(_.toByte).toArray
    val frames = Multimodal.sampleFrames(blob, n = 3, frameSize = 10)
    assert(frames.length == 3)
    assert(frames(0).head == 0.toByte && frames(2).head == 90.toByte)
    assert(frames.forall(_.length == 10))
    assert(Multimodal.sampleFrames(Array.empty[Byte], 3, 10).isEmpty)
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
