package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * Three decoders plug into the same `decodeFn` slot:
  *  - [[imageDecode]] — a REAL image decode via the JDK's `javax.imageio`
  *    (PNG/BMP/GIF/JPEG need no external codec libs), emitting
  *    width/height/per-channel means;
  *  - [[audioDecode]] — a REAL PCM audio decode via the JDK's
  *    `javax.sound.sampled` (WAV/AIFF/AU readers ship with the JRE),
  *    emitting rate/channels/amplitude statistics;
  *  - [[fakeDecode]] — a deterministic byte-statistics stand-in for
  *    formats whose codecs are absent here (video), keeping the
  *    plumbing testable on arbitrary blobs.
  *
  * Scale notes: rows STREAM through the partition iterator one at a time
  * (at most one decoded blob in flight per task — the iterator is the
  * memory bound); the operators are embarrassingly parallel (no shuffle);
  * blob-heavy tables should be stored with a small
  * `spark.sql.files.maxPartitionBytes` so tasks stay balanced by bytes,
  * not row count.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = true),
    StructField("media", BinaryType, nullable = true),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Deterministic stand-in for a real decoder: 8 "features" derived from
    * byte statistics (mean, extremes, coarse histogram). Pure function of
    * the bytes — reproducible across runs and engines. */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    if (bytes.isEmpty) return Array.fill(8)(0f)
    var sum = 0L; var mn = 255; var mx = 0
    val hist = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b; if (b < mn) mn = b; if (b > mx) mx = b
      hist(b >> 6) += 1
      i += 1
    }
    Array(sum.toFloat / bytes.length, mn.toFloat, mx.toFloat, bytes.length.toFloat,
      hist(0).toFloat, hist(1).toFloat, hist(2).toFloat, hist(3).toFloat)
  }

  /** Real image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG — readers
    * ship with the JRE, no external codecs). Features: width, height,
    * mean R/G/B, mean alpha, pixel count, 0. Deterministic: pixel data is
    * read through `getRGB` (sRGB ints), and the means are exact integer
    * sums divided once. Undecodable bytes → all-(-1) features, so a mixed
    * or corrupt corpus degrades per row, never fails the job. */
  def imageDecode(bytes: Array[Byte]): Array[Float] = {
    // NonFatal, not IOException: ImageIO decoders throw RuntimeExceptions
    // on malformed input (CMMException on broken ICC profiles, AIOOBE on
    // truncated data) — any of those must degrade this ROW, not kill the job
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return Array.fill(8)(-1f)
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sa += (p >>> 24) & 0xff; sr += (p >>> 16) & 0xff
        sg += (p >>> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Array(w.toFloat, h.toFloat, sr.toFloat / n, sg.toFloat / n, sb.toFloat / n,
      sa.toFloat / n, n.toFloat, 0f)
  }

  /** Deterministic nearest-neighbor thumbnail resize: decodes via ImageIO
    * and samples a w×h grid of sRGB pixels directly — deliberately NOT
    * `Graphics2D.drawImage` scaling, whose interpolation varies across
    * JVMs/platforms; integer grid sampling is bit-identical everywhere.
    * Output: row-major [r, g, b] float triples (length 3·w·h), or empty
    * on undecodable bytes (degrade per row, never fail the job). */
  def thumbnail(bytes: Array[Byte], w: Int, h: Int): Array[Float] = {
    require(w >= 1 && h >= 1, "need w >= 1 and h >= 1")
    // NonFatal (see imageDecode): decoder RuntimeExceptions degrade the row
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return Array.empty[Float]
    val out = new Array[Float](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.getWidth / w).toInt
        val sy = (y.toLong * img.getHeight / h).toInt
        val p = img.getRGB(sx, sy)
        val base = 3 * (y * w + x)
        out(base) = ((p >>> 16) & 0xff).toFloat
        out(base + 1) = ((p >>> 8) & 0xff).toFloat
        out(base + 2) = (p & 0xff).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` — PCM WAV,
    * AIFF and AU readers ship with the JRE, no external codec libs (the
    * audio counterpart of [[imageDecode]]; video alone keeps the honest
    * byte-window stand-in, as no JDK video codec exists). Features:
    * [sampleRate, channels, frames, meanAbs, maxAbs, rms1000, zeroCross,
    * bitsPerSample] over channel-interleaved PCM samples normalized to
    * [-1, 1). Integer sums keep mean/max/zero-cross exact; rms does one
    * sqrt at the end (correctly-rounded IEEE — identical everywhere).
    * Undecodable or non-PCM bytes → all-(-1) features, degrading the ROW
    * (same contract as [[imageDecode]]). Supports 8-bit (signed — what
    * AIFF/AU emit — or unsigned, WAV's form) and 16-bit signed
    * little/big-endian PCM — the formats the JDK readers themselves
    * emit. */
  def audioDecode(bytes: Array[Byte]): Array[Float] = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (in == null) return Array.fill(8)(-1f)
    try {
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val ok = (signed && (bits == 16 || bits == 8)) || // AIFF/AU emit SIGNED 8-bit
               (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
      if (!ok) return Array.fill(8)(-1f)
      val data = in.readAllBytes()
      val bytesPerSample = bits / 8
      val n = data.length / bytesPerSample
      var sumAbs = 0L; var maxAbs = 0L; var sumSq = 0.0; var zc = 0L
      var prevSign = 0
      var i = 0
      while (i < n) {
        val v: Int =
          if (bits == 8) { if (signed) data(i).toInt else (data(i) & 0xff) - 128 }
          else {
            val off = i * 2
            if (fmt.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
            else (data(off + 1) << 8) | (data(off) & 0xff)
          }
        val a = math.abs(v.toLong)
        sumAbs += a; if (a > maxAbs) maxAbs = a
        val scale = if (bits == 8) 128.0 else 32768.0
        val x = v / scale
        sumSq += x * x
        val sign = java.lang.Integer.signum(v)
        if (sign != 0) { if (prevSign != 0 && sign != prevSign) zc += 1; prevSign = sign }
        i += 1
      }
      val scale = if (bits == 8) 128f else 32768f
      val frames = n.toLong / math.max(1, fmt.getChannels)
      Array(fmt.getSampleRate, fmt.getChannels.toFloat, frames.toFloat,
        if (n == 0) 0f else sumAbs.toFloat / n / scale,
        maxAbs.toFloat / scale,
        if (n == 0) 0f else (1000.0 * math.sqrt(sumSq / n)).toFloat,
        zc.toFloat, bits.toFloat)
    } catch { case scala.util.control.NonFatal(_) => Array.fill(8)(-1f) }
    finally in.close()
  }

  /** Deterministic frame sampling over an opaque media blob: `n` evenly
    * spaced fixed-size byte windows (the shape a real container demuxer
    * would fill with decoded frames — video/audio codecs are absent here,
    * so the "frame" is an honest byte window; the Spark-side contract —
    * binary in, bounded array-of-frames out, embarrassingly parallel —
    * is the real one). Windows are clamped to the blob. */
  def sampleFrames(bytes: Array[Byte], n: Int, frameSize: Int): Array[Array[Byte]] = {
    require(n >= 1 && frameSize >= 1, "need n >= 1 and frameSize >= 1")
    if (bytes.isEmpty) return Array.empty
    (0 until n).map { i =>
      val start = if (n == 1) 0 else ((bytes.length.toLong - 1) * i / (n - 1)).toInt
      val s = math.min(start, math.max(0, bytes.length - frameSize))
      java.util.Arrays.copyOfRange(bytes, s, math.min(bytes.length, s + frameSize))
    }.toArray
  }

  /** Real MULTI-FRAME decode for the one motion format the JDK can read:
    * animated GIF (ImageIO's reader exposes every stored frame). Samples
    * up to `n` evenly spaced frame indices (same spacing rule as
    * [[sampleFrames]]) and emits [[imageDecode]]-shaped features per
    * frame, prefixed with the frame index:
    * [frameIdx, w, h, meanR, meanG, meanB, meanA, pixels].
    *
    * Honesty note: features are per STORED frame — GIF delta frames are
    * not composited onto their predecessors (compositing policy belongs
    * to a renderer, and a delta frame's own statistics are the
    * deterministic, engine-independent choice). Undecodable or
    * single-image-format bytes yield an empty result (degrade per row);
    * a plain single-frame GIF yields one frame. Codec-less containers
    * (MP4 etc.) still use [[fakeDecode]]/[[sampleFrames]] byte windows. */
  def gifFrameFeatures(bytes: Array[Byte], n: Int): Array[Array[Float]] = {
    require(n >= 1, "need n >= 1")
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (iis == null) return Array.empty
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Array.empty
      val reader = readers.next()
      try {
        reader.setInput(iis)
        if (reader.getFormatName.toLowerCase != "gif") return Array.empty
        val total = reader.getNumImages(true)
        if (total <= 0) return Array.empty
        val idxs =
          if (n == 1 || total == 1) Array(0)
          else (0 until math.min(n, total))
            .map(i => ((total - 1).toLong * i / (math.min(n, total) - 1)).toInt)
            .distinct.toArray
        idxs.map { i =>
          val img = reader.read(i)
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sa += (p >>> 24) & 0xff; sr += (p >>> 16) & 0xff
              sg += (p >>> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val np = w.toLong * h
          Array(i.toFloat, w.toFloat, h.toFloat, sr.toFloat / np, sg.toFloat / np,
            sb.toFloat / np, sa.toFloat / np, np.toFloat)
        }
      } catch { case scala.util.control.NonFatal(_) => Array.empty[Array[Float]] }
      finally reader.dispose()
    } finally iis.close()
  }

  /** FNV-1a over the blob — the deterministic per-row checksum. */
  def checksum(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Shared per-partition row mapper: rows STREAM through one at a time
    * (the partition iterator is the memory bound — at most one decoded
    * blob in flight per task), no shuffle, embarrassingly parallel. A
    * vectorized decoder would batch INSIDE its decode fn; an iterator
    * `grouped(n)` layer here would not change what reaches the decoder,
    * only re-wrap the same per-row calls. */
  private def perRow(media: DataFrame, schema: StructType)(f: Row => Row): DataFrame =
    media.sparkSession.createDataFrame(
      // a NULL media_id (the column is declared nullable) has nothing to
      // key its features by — drop the row, per-row degradation like the
      // NULL-blob case, instead of getLong NPE-ing the whole job
      media.select("media_id", "media").filter(col("media_id").isNotNull)
        .rdd.mapPartitions(_.map(f)), schema)

  /** Per-row feature extraction. `decodeFn` is the pluggable decode step
    * (default: [[fakeDecode]] stub; [[imageDecode]] for real images).
    * A NULL blob (the media column is declared nullable) degrades to the
    * empty-bytes row — per-row degradation, never a task NPE. */
  def extractFeatures(media: DataFrame,
                      decodeFn: Array[Byte] => Array[Float] = fakeDecode): DataFrame =
    perRow(media, featureSchema) { r =>
      val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
      Row(r.getLong(0), bytes.length.toLong, checksum(bytes), decodeFn(bytes).toSeq)
    }

  val thumbSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("thumb", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Per-row thumbnailing — same plumbing contract as [[extractFeatures]];
    * rows whose bytes don't decode produce an empty thumb. */
  def extractThumbnails(media: DataFrame, w: Int, h: Int): DataFrame = {
    require(w >= 1 && h >= 1, "need w >= 1 and h >= 1")
    perRow(media, thumbSchema) { r =>
      val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
      Row(r.getLong(0), thumbnail(bytes, w, h).toSeq)
    }
  }

  /** Builds a media table from the documents fixture (text bytes as the
    * blob) — lets the plumbing run against real testdata without binary
    * fixtures. */
  def fromDocuments(spark: SparkSession, docsParquet: String): DataFrame =
    spark.read.parquet(docsParquet)
      .select(col("doc_id").as("media_id"),
        col("text").cast(BinaryType).as("media"),
        lit("text/plain").as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"))
}
