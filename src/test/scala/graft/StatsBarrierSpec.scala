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
