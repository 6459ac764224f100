package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side mechanics — schema, partitioning, batch shape, the
  * mapPartitions pipeline — are real and tested. The actual byte decoding
  * is STUBBED with a deterministic fake ([[fakeDecode]]): the image/audio
  * codec libraries are not available in this environment, so the stub
  * stands in where a JNI/ImageIO decode would run. Swapping in a real
  * decoder changes only the body of `decodeFn`.
  *
  * Scale notes: rows are processed in bounded batches (`batchSize`) so a
  * partition of large blobs never materializes fully in heap; the operator
  * is embarrassingly parallel (no shuffle); blob-heavy tables should be
  * stored with a small `spark.sql.files.maxPartitionBytes` so tasks stay
  * balanced by bytes, not row count.
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

  /** FNV-1a over the blob — the deterministic per-row checksum. */
  def checksum(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Batched per-partition feature extraction. `decodeFn` is the pluggable
    * decode step (default: [[fakeDecode]] stub). */
  def extractFeatures(media: DataFrame, batchSize: Int = 64,
                      decodeFn: Array[Byte] => Array[Float] = fakeDecode): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a vectorized decoder would process a chunk
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Row(id, bytes.length.toLong, checksum(bytes), decodeFn(bytes).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
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
