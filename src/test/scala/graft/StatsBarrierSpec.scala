package graft

import org.apache.spark.sql.functions._

import graft.operators.Checkpoints

/** Regression gate for the round-9 q91 bench hang: Spark 4's
  * `localCheckpoint` copies the origin plan's statistics onto the
  * checkpoint leaf, so an iterative operator that checkpoints each round
  * and joins the result with itself SQUARES the sizeInBytes estimate per
  * round — the BigInt bit-count doubles (26 → ~100k bits in 12 rounds
  * unclamped) until the size-only join estimator spends minutes in
  * BigInteger multiplication during PLANNING. `Checkpoints.checkpoint`
  * must keep every leaf's estimate ≤ Long.MaxValue so loop lineages plan
  * in constant-size integer math. */
class StatsBarrierSpec extends SparkSpec {

  test("checkpoint stats stay bounded through self-join rounds (no doubling)") {
    import spark.implicits._
    var labels = Checkpoints.checkpoint(
      spark.range(100).toDF("id").as("a")
        .join(spark.range(100).toDF("id").as("b"), $"a.id" === $"b.id")
        .select($"a.id"))
    val bits = (1 to 10).map { _ =>
      labels = Checkpoints.checkpoint(
        labels.as("x").join(labels.as("y"), $"x.id" === $"y.id").select($"x.id"))
      labels.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    }
    // unclamped, round 10 is ~13k bits; clamped, every round is ≤ 64
    assert(bits.forall(_ <= 64), s"stats grew unboundedly: $bits")
    // and the data itself is intact after 10 barrier round-trips
    assert(labels.as[Long].collect().sorted.toSeq == (0L until 100L))
  }

  test("50 checkpoint rounds with a join per round: bounded stats AND bounded planning time") {
    // the 10-round pin above catches the doubling; this one covers the
    // depths real operators reach — BPE learn can run 50+ merge rounds,
    // CC on an adversarial chain iterates past 20 — where an unclamped
    // lineage would already be minutes into BigInt multiplication
    import spark.implicits._
    var cur = Checkpoints.checkpoint(spark.range(50).toDF("id"))
    val t0 = System.nanoTime()
    val bits = (1 to 50).map { _ =>
      cur = Checkpoints.checkpoint(
        cur.as("x").join(cur.as("y"), $"x.id" === $"y.id").select($"x.id"))
      cur.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(bits.forall(_ <= 64), s"stats grew past 64 bits: ${bits.max}")
    // 50 eager checkpoint jobs of 50 rows each: seconds. The unclamped
    // failure mode is minutes of driver-side planning by round ~15.
    assert(secs < 120, s"50 rounds took ${secs}s — planning is blowing up")
    assert(cur.as[Long].collect().sorted.toSeq == (0L until 50L))
    Checkpoints.releaseAll()
  }

  test("barrier forwards the origin's constraints (not just bounded stats)") {
    // ADVICE r9: passing None for originConstraints discarded the
    // not-null/equality facts localCheckpoint propagates, costing
    // downstream constraint-based pruning on checkpointed frames
    import spark.implicits._
    val origin = spark.range(100).toDF("id").filter($"id" > 10)
    val rawCons = origin.queryExecution.optimizedPlan.constraints
    assume(rawCons.nonEmpty, "origin plan should carry constraints")
    val cp = Checkpoints.checkpoint(origin)
    val cons = cp.queryExecution.analyzed.constraints
    assert(cons.nonEmpty,
      s"checkpoint leaf lost its constraints (origin had: $rawCons)")
    Checkpoints.release(cp)
  }

  test("no operator bypasses Checkpoints.checkpoint with a raw localCheckpoint") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filterNot(_.toString.endsWith("operators/Checkpoints.scala"))
      .filter(p => java.nio.file.Files.readString(p).contains(".localCheckpoint("))
      .map(_.toString).toList
    assert(offenders.isEmpty,
      s"raw localCheckpoint outside Checkpoints.checkpoint (stats clamp " +
        s"and release registry bypassed): $offenders")
  }

  test("a small checkpoint keeps a truthful (small) size for broadcast planning") {
    import spark.implicits._
    val small = Checkpoints.checkpoint(Seq(1L, 2L, 3L).toDF("id"))
    val size = small.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size > 0 && size < 1000000,
      s"expected a truthful small estimate, got $size")
  }

  test("checkpoint result stays releasable (registry still sees the backing RDD)") {
    import spark.implicits._
    val cp = Checkpoints.checkpoint(Seq(1L, 2L).toDF("id"))
    assert(cp.as[Long].collect().toSet == Set(1L, 2L))
    assert(Checkpoints.release(cp), "release must find the clamped frame's RDD")
  }
}
