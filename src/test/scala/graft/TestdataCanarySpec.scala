package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.events.EventOps

/** Testdata schema-drift canary. Round 8 lost six gates, the bench, and a
  * plan-audit spec to a silent driver-side regeneration of
  * `events.parquet` (`ts` flipped from TIMESTAMP(NANOS), read as Long via
  * nanosAsLong, to plain `timestamp[us]`). This spec converts the next
  * such drift into a NAMED failure:
  *
  *  1. every table the gates read must exist at sf0.01 and parse;
  *  2. each table must still carry the columns the gates select, with a
  *     type our readers accept;
  *  3. [[EventOps.tsMicros]] must handle BOTH events-`ts` encodings that
  *     have shipped (ns-as-Long and µs-timestamp), proven on synthesized
  *     frames with known epoch values, truncation semantics included.
  */
class TestdataCanarySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  // column → acceptable types, per table, as the gates consume them.
  // (Only the columns gates actually select — extra columns are fine.)
  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region"   -> Map("r_regionkey" -> num, "r_name" -> str),
    "nation"   -> Map("n_nationkey" -> num, "n_name" -> str, "n_regionkey" -> num),
    "customer" -> Map("c_custkey" -> num, "c_nationkey" -> num, "c_acctbal" -> dbl),
    "supplier" -> Map("s_suppkey" -> num, "s_nationkey" -> num),
    "part"     -> Map("p_partkey" -> num, "p_retailprice" -> dbl),
    "orders"   -> Map("o_orderkey" -> num, "o_custkey" -> num,
      "o_totalprice" -> dbl, "o_orderdate" -> dateish,
      "o_orderstatus" -> str, "o_orderpriority" -> str),
    // l_shipdate / o_orderdate have shipped as timestamp[us]; the date
    // functions the gates apply (year/month/quarter/date_trunc) accept
    // DATE and both timestamp flavors alike
    "lineitem" -> Map("l_orderkey" -> num, "l_partkey" -> num,
      "l_suppkey" -> num, "l_linenumber" -> num, "l_quantity" -> dbl,
      "l_extendedprice" -> dbl, "l_returnflag" -> str, "l_linestatus" -> str),
    "events"   -> Map("event_id" -> num, "user_id" -> num, "ts" -> tsish,
      "event_type" -> str, "value" -> dbl, "props" -> str),
    "documents" -> Map("doc_id" -> num, "text" -> str, "source" -> str,
      "n_chars" -> num),
    "embeddings" -> Map("vec_id" -> num, "label" -> num,
      "embedding" -> Set[DataType](ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false))),
  )

  private def num: Set[DataType] = Set(LongType, IntegerType)
  private def str: Set[DataType] = Set(StringType)
  private def dbl: Set[DataType] = Set(DoubleType, FloatType)
  private def dateish: Set[DataType] =
    Set(DateType, TimestampNTZType, TimestampType)
  private def tsish: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  test("canary: every gate-read table exists at every SF with accepted column types") {
    // all three: Verify runs at sf0.01, Bench at sf0.1, smoke at sf0.001 —
    // a drift at ANY of them takes a driver artifact down
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                      "/root/testdata/sf0.1")) {
      contract.foreach { case (table, cols) =>
        val path = s"$sfDir/$table.parquet"
        assert(Files.exists(Paths.get(path)), s"testdata table missing: $path")
        val schema = spark.read.parquet(path).schema
        cols.foreach { case (name, ok) =>
          val field = schema.find(_.name == name)
          assert(field.isDefined, s"$path $table.$name vanished from testdata (drift)")
          assert(ok.contains(field.get.dataType),
            s"$path $table.$name drifted to ${field.get.dataType} — readers accept $ok")
        }
      }
    }
  }

  test("canary: tsMicros handles the live events.ts encoding end-to-end") {
    // whatever encoding the driver shipped THIS round must flow through the
    // shared helper into finite BIGINT micros, and agree with DuckDB's
    // epoch_us on a spot value (epoch math re-derived in JVM time APIs)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val got = ev.select(col("ts"), EventOps.tsMicros(ev).as("tus"))
      .orderBy("tus").limit(1).collect()(0)
    val tus = got.getLong(1)
    ev.schema("ts").dataType match {
      case LongType =>
        assert(tus == Math.floorDiv(got.getLong(0), 1000L) ||
          tus == got.getLong(0) / 1000L) // truncation parity checked below
      case TimestampNTZType =>
        val ldt = got.getAs[java.time.LocalDateTime](0)
        assert(tus == ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
          + ldt.getNano / 1000L)
      case TimestampType =>
        val inst = got.getAs[java.sql.Timestamp](0).toInstant
        assert(tus == inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
      case other => fail(s"unaccepted ts type $other")
    }
  }

  test("canary: tsMicros on the ns-as-Long encoding (synthesized)") {
    import spark.implicits._
    // ns → µs must TRUNCATE toward zero (DuckDB parity): -1500 ns → -1 µs,
    // -1 ns → 0, 1500 ns → 1
    val df = Seq(-1500L, -1L, 0L, 1L, 1500L, 1700000000123456789L)
      .toDF("ts")
    val got = df.select(EventOps.tsMicros(df)).as[Long].collect().toSeq
    assert(got == Seq(-1L, 0L, 0L, 0L, 1L, 1700000000123456L))
  }

  test("canary: tsMicros on the µs-timestamp encoding (synthesized)") {
    import spark.implicits._
    // TIMESTAMP_NTZ path: write timestamp[us] parquet, read back, convert
    val micros = Seq(0L, 1L, 1700000000123456L, -86400000000L)
    val tmp = Files.createTempDirectory("canary_us").toString
    micros.toDF("us").select(timestamp_micros(col("us"))
        .cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    assert(back.schema("ts").dataType == TimestampNTZType,
      s"round-trip did not produce TIMESTAMP_NTZ: ${back.schema("ts").dataType}")
    val got = back.select(EventOps.tsMicros(back)).as[Long].collect().toSeq.sorted
    assert(got == micros.sorted)
  }

  test("canary: tsMicros rejects an unknown ts type loudly") {
    import spark.implicits._
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException](EventOps.tsMicros(df))
    assert(e.getMessage.contains("schema drift"))
  }
}
