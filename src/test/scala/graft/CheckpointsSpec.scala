package graft

import graft.operators.Checkpoints
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.storage.StorageLevel

/** The checkpoint release handles: blocks must actually leave the block
  * manager on release, scoped{} must free exactly its own thread's
  * checkpoints, and the operators that checkpoint internally must leave
  * nothing live after release. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def persistentRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("checkpoint registers and release frees the backing blocks") {
    val before = persistentRddIds
    val cp = Checkpoints.checkpoint(Seq(1L, 2L, 3L).toDF("x"))
    assert(cp.collect().length == 3)
    val added = persistentRddIds -- before
    assert(added.nonEmpty, "localCheckpoint should persist a backing RDD")
    assert(Checkpoints.release(cp), "release should find the backing RDD")
    assert((persistentRddIds & added).isEmpty, "blocks not freed")
    assert(!Checkpoints.release(cp), "second release must be a no-op")
  }

  test("release on a non-checkpoint frame is a no-op") {
    assert(!Checkpoints.release(Seq(1L).toDF("x")))
  }

  test("scoped frees checkpoints created inside, and only those") {
    val outside = Checkpoints.checkpoint(Seq(10L).toDF("x"))
    assert(outside.collect().length == 1)
    val before = persistentRddIds
    var insideIds: Set[Int] = Set.empty
    Checkpoints.scoped {
      val in = Checkpoints.checkpoint(Seq(20L, 21L).toDF("x"))
      assert(in.collect().length == 2)
      insideIds = persistentRddIds -- before
      assert(insideIds.nonEmpty)
    }
    assert((persistentRddIds & insideIds).isEmpty, "scope did not free its checkpoint")
    // the outside checkpoint must still be live and usable
    assert(outside.collect().length == 1)
    assert(Checkpoints.release(outside))
  }

  test("releaseAll frees every live graft checkpoint") {
    val a = Checkpoints.checkpoint(Seq(1L).toDF("x"))
    val b = Checkpoints.checkpoint(Seq(2L).toDF("x"))
    a.collect(); b.collect()
    assert(Checkpoints.liveCount >= 2)
    assert(Checkpoints.releaseAll() >= 2)
    assert(Checkpoints.liveCount == 0)
  }

  test("Bench.interQueryCleanup leaves liveCount == 0 after a checkpointing gate") {
    // the bench loop's between-queries contract: a gate whose operators
    // checkpoint internally (nearDedup does, for the LSH candidate table)
    // must leave NOTHING pinned once the cleanup runs — otherwise one
    // query's blocks pressure the next query's measurement
    val docs = (1L to 50L).map(i => (i, if (i % 4 == 0) s"same near dup body ${i % 8}"
      else s"distinct words for doc $i only")).toDF("doc_id", "text")
    assert(graft.text.Dedup.nearDedup(docs).collect().nonEmpty)
    assert(Checkpoints.liveCount > 0,
      "expected the gate to have created live checkpoints")
    Bench.interQueryCleanup(spark)
    assert(Checkpoints.liveCount == 0, "cleanup left checkpoints pinned")
    assert(spark.sharedState.cacheManager.isEmpty, "cleanup left cached frames")
  }

  test("nearDedup under scoped leaves no live blocks once results are materialized") {
    val docs = (1L to 60L).map(i => (i, if (i % 3 == 0) s"shared dup text block number ${i % 6}"
      else s"unique document $i with its own words")).toDF("doc_id", "text")
    val before = persistentRddIds
    val out = Checkpoints.scoped {
      graft.text.Dedup.nearDedup(docs).collect() // materialize INSIDE the scope
    }
    assert(out.nonEmpty)
    val leaked = persistentRddIds -- before
    assert(leaked.isEmpty, s"blocks leaked after scoped nearDedup: $leaked")
  }

  test("PipelineCli.run leaks no persisted frames on mid-pipeline failure") {
    val before = persistentRddIds
    // text = element_at(array, doc_id) explodes under ANSI for doc_id 2 —
    // but only when TEXT is evaluated, which first happens while
    // materializing the 'filtered' cache (docs.count() prunes it away), so
    // the failure lands mid-pipeline with two frames already pinned
    val bad = Seq(1L, 2L).toDF("doc_id")
      .select(col("doc_id"),
        expr("element_at(array('ok text here'), CAST(doc_id AS INT))").as("text"))
    val thrown = intercept[Exception] {
      PipelineCli.run(bad, minQuality = -1000L, maxDupFrac1000 = 2000L)
    }
    assert(!thrown.isInstanceOf[IllegalStateException])
    assert((persistentRddIds -- before).isEmpty,
      "failure path leaked persisted frames or checkpoint blocks")
  }
}
