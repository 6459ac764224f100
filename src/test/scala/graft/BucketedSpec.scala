package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.sources.Bucketed

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  // exchanges are INSERTED by EnsureRequirements, which runs in the
  // executedPlan preparations — sparkPlan never shows them; AQE is
  // disabled around these asserts so executedPlan is the prepared plan,
  // not an AdaptiveSparkPlanExec wrapper hiding it
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  private def noAqe[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("same-key same-count bucketed tables join with ZERO exchanges, " +
       "and the result matches the plain join") {
    val fact = (1 to 2000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
    val dim = (0L to 96L).map(k => (k, s"d$k")).toDF("k", "name")
    Bucketed.saveBucketed(fact, "graft_spec_fact", "k", nBuckets = 4)
    Bucketed.saveBucketed(dim, "graft_spec_dim", "k", nBuckets = 4)
    // below the broadcast threshold a dim this size would broadcast and
    // hide the exchange question — force the shuffle-join planner path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try noAqe {
      val bucketed = Bucketed.table(spark, "graft_spec_fact")
        .join(Bucketed.table(spark, "graft_spec_dim"), "k")
      assert(exchanges(bucketed) == 0,
        s"bucketed join still shuffles:\n${bucketed.queryExecution.executedPlan}")
      // control on the SAME storage path minus the buckets — a
      // local-relation control would dodge the question (Spark plans
      // in-memory joins differently)
      val dir = java.nio.file.Files.createTempDirectory("graft_bucket_ctl").toString
      fact.write.parquet(s"$dir/fact"); dim.write.parquet(s"$dir/dim")
      val plain = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), "k")
      assert(exchanges(plain) > 0, "control: the unbucketed join must shuffle")
      assert(bucketed.collect().map(_.toSeq).toSet ==
        plain.collect().map(_.toSeq).toSet)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("aggregation on the bucket key also skips its exchange") {
    noAqe {
      val agg = Bucketed.table(spark, "graft_spec_fact")
        .groupBy("k").agg(sum("v").as("s"))
      assert(exchanges(agg) == 0,
        s"bucketed groupBy still shuffles:\n${agg.queryExecution.executedPlan}")
    }
  }

  test("rejects a missing key column and a non-positive bucket count") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException](
      Bucketed.saveBucketed(df, "graft_spec_bad", "nope", 4))
    intercept[IllegalArgumentException](
      Bucketed.saveBucketed(df, "graft_spec_bad", "k", 0))
  }
}
