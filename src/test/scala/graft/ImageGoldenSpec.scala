package graft

import org.apache.spark.sql.Row

import graft.multimodal.Multimodal

/** Byte-exact golden-image gate for the REAL decode path: a checked-in
  * 4×2 PNG and BMP with hand-computed expected features/thumbnails. The
  * expectations are derived from the pixel design ON PAPER (not from
  * running the code), so any cross-JVM or cross-decoder drift in
  * `imageDecode`/`thumbnail` — whose stated contract is bit-identical
  * output everywhere — fails here.
  *
  * Fixture layout (sRGB):
  *   row 0: red(255,0,0)  green(0,255,0)  blue(0,0,255)  white(255,255,255)
  *   row 1: black(0,0,0)  gray(128,128,128) yellow(255,255,0) cyan(0,255,255)
  */
class ImageGoldenSpec extends SparkSpec {

  private def fixtureBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  // hand-computed: sums over the 8 pixels above
  //   R: 255+0+0+255 + 0+128+255+0   = 893  -> mean 111.625
  //   G: 0+255+0+255 + 0+128+255+255 = 1148 -> mean 143.5
  //   B: 0+0+255+255 + 0+128+0+255   = 893  -> mean 111.625
  //   A: opaque everywhere           -> mean 255
  private val expectedFeatures =
    Array(4f, 2f, 111.625f, 143.5f, 111.625f, 255f, 8f, 0f)

  // nearest-neighbor 2×1 grid: sx = x·4/2 ∈ {0, 2}, sy = 0
  //   -> pixels (0,0)=red and (2,0)=blue
  private val expectedThumb2x1 = Array(255f, 0f, 0f, 0f, 0f, 255f)

  // 4×2 identity grid returns every pixel in row-major order
  private val expectedThumb4x2 = Array[Float](
    255, 0, 0,   0, 255, 0,   0, 0, 255,   255, 255, 255,
    0, 0, 0,     128, 128, 128, 255, 255, 0, 0, 255, 255)

  for (name <- Seq("fixture_4x2.png", "fixture_4x2.bmp")) {
    test(s"$name: imageDecode features are byte-exact") {
      assert(Multimodal.imageDecode(fixtureBytes(name)).toSeq == expectedFeatures.toSeq)
    }
    test(s"$name: thumbnail grids are byte-exact") {
      val bytes = fixtureBytes(name)
      assert(Multimodal.thumbnail(bytes, 2, 1).toSeq == expectedThumb2x1.toSeq)
      assert(Multimodal.thumbnail(bytes, 4, 2).toSeq == expectedThumb4x2.toSeq)
    }
  }

  // WAV fixture: 16-bit signed mono PCM @ 8000 Hz, samples
  // [0, 16384, 32767, 16384, 0, -16384, -32768, -16384]. Expectations
  // computed independently (Python): sumAbs = 131071 -> meanAbs =
  // 131071/8/32768; maxAbs = 32768/32768 = 1; rms1000 =
  // 1000·sqrt((2 + (32767/32768)²)/8); one +/- sign flip -> zc = 1.
  test("fixture_tri.wav: audioDecode features are byte-exact") {
    val got = Multimodal.audioDecode(fixtureBytes("fixture_tri.wav")).toSeq
    assert(got == Seq(8000f, 1f, 8f, 0.4999961853027344f, 1f,
      612.3662109375f, 1f, 16f), got)
  }

  test("fixture_tri.aiff: the big-endian AIFF twin decodes to identical features") {
    // same samples as the WAV, stored big-endian: a byte-order bug in the
    // 16-bit assembly would produce garbage amplitudes here
    assert(Multimodal.audioDecode(fixtureBytes("fixture_tri.aiff")).toSeq ==
      Multimodal.audioDecode(fixtureBytes("fixture_tri.wav")).toSeq)
  }

  test("audioDecode degrades per row on undecodable or non-PCM bytes") {
    assert(Multimodal.audioDecode(Array[Byte](1, 2, 3)).toSeq == Seq.fill(8)(-1f))
    assert(Multimodal.audioDecode(Array.empty[Byte]).toSeq == Seq.fill(8)(-1f))
    // an image is not audio: same degrade, no crash
    assert(Multimodal.audioDecode(fixtureBytes("fixture_4x2.png")).toSeq == Seq.fill(8)(-1f))
  }

  // 3-frame animated GIF, 3×2 solid frames: red, green, blue — per-frame
  // features are exact means of pure primaries (GIF palettes preserve them)
  test("fixture_anim.gif: multi-frame decode is byte-exact per stored frame") {
    val gif = fixtureBytes("fixture_anim.gif")
    val all = Multimodal.gifFrameFeatures(gif, n = 3)
    assert(all.map(_.toSeq).toSeq == Seq(
      Seq(0f, 3f, 2f, 255f, 0f, 0f, 255f, 6f),
      Seq(1f, 3f, 2f, 0f, 255f, 0f, 255f, 6f),
      Seq(2f, 3f, 2f, 0f, 0f, 255f, 255f, 6f)))
    // n = 2 samples the endpoints; n > total clamps to every frame
    assert(Multimodal.gifFrameFeatures(gif, 2).map(_(0)).toSeq == Seq(0f, 2f))
    assert(Multimodal.gifFrameFeatures(gif, 10).map(_(0)).toSeq == Seq(0f, 1f, 2f))
    // degrade: non-GIF image formats and garbage yield empty, never throw
    assert(Multimodal.gifFrameFeatures(fixtureBytes("fixture_4x2.png"), 3).isEmpty)
    assert(Multimodal.gifFrameFeatures(Array[Byte](9, 9, 9), 3).isEmpty)
  }

  test("golden fixtures flow through the DataFrame plumbing unchanged") {
    val png = fixtureBytes("fixture_4x2.png")
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, png, "image/png", Integer.valueOf(4), Integer.valueOf(2)),
        Row(2L, null, "image/png", null, null))), // NULL blob degrades per row
      Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(media, Multimodal.imageDecode)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).getSeq[Float](3) == expectedFeatures.toSeq)
    assert(feats(1L).getLong(1) == png.length.toLong)
    assert(feats(1L).getLong(2) == Multimodal.checksum(png))
    assert(feats(2L).getSeq[Float](3) == Seq.fill(8)(-1f)) // empty bytes: undecodable
    val thumbs = Multimodal.extractThumbnails(media, 2, 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(thumbs(1L) == expectedThumb2x1.toSeq)
    assert(thumbs(2L).isEmpty)
  }
}
