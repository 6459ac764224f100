package graft

import graft.operators.Association

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{c,d} 5:{a} — with item ids as longs
  private val baskets = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L), (2L, 20L),
    (3L, 10L), (3L, 20L),
    (4L, 30L), (4L, 40L),
    (5L, 10L)).toDF("bk", "i")

  test("hand example: counts and exact lift fractions") {
    val got = Association.frequentPairs(baskets, "bk", "i", minSupport = 2L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // item counts: 10→4, 20→3, 30→2, 40→1 (pruned); n_baskets = 5
    // pairs on frequent items: (10,20)→3, (10,30)→1(<2 dropped), (20,30)→1(<2 dropped)
    assert(got == Seq((10L, 20L, 3L, 4L, 3L, 5L, 15L, 12L)))
  }

  test("duplicate (basket, item) rows do not inflate any count") {
    val dup = baskets.union(baskets).union(baskets)
    val a = Association.frequentPairs(baskets, "bk", "i", 2L).collect().toSeq
    val b = Association.frequentPairs(dup, "bk", "i", 2L).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("property: A-Priori prune is lossless — minSupport s equals the " +
       "unpruned run filtered to pair support >= s") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(600)((rnd.nextInt(60).toLong, rnd.nextInt(25).toLong))
      .toDF("bk", "i")
    val all = Association.frequentPairs(data, "bk", "i", minSupport = 1L)
      .collect().map(_.toSeq)
    for (s <- Seq(2L, 3L, 5L)) {
      val pruned = Association.frequentPairs(data, "bk", "i", s)
        .collect().map(_.toSeq).toSet
      // item counts and n_baskets are computed over the FULL basket table
      // in both runs, so rows coincide exactly; only the support filter
      // (pair_cnt at index 2) differs
      val expect = all.filter(r => r(2).asInstanceOf[Long] >= s).toSet
      assert(pruned == expect, s"minSupport=$s")
    }
  }

  test("rejects a non-positive support") {
    val e = intercept[IllegalArgumentException] {
      Association.frequentPairs(baskets, "bk", "i", minSupport = 0L)
    }
    assert(e.getMessage.contains("minSupport"))
  }
}
