package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guards between the gate surfaces the driver consumes: every
  * `queries` entry needs an `oracleSql` twin (the correctness gate) unless
  * it is on the explicit no-oracle list, and no oracle may point at a
  * query that does not exist. Catches the easy round-N+1 mistake: adding
  * a query and forgetting its oracle (the driver would silently record a
  * weaker rows-only check). Pure map checks — no Spark session. */
class GateConsistencySpec extends AnyFunSuite {

  // q09 is a seeded-RNG Bernoulli sample: unverifiable by nature (its
  // deterministic twin q55 IS hash-gated)
  private val noOracleByNature = Set("q09_bernoulli_sample")

  test("every gate query has an oracle (or is explicitly no-oracle)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- noOracleByNature
    assert(missing.isEmpty, s"gates without an oracle: ${missing.toSeq.sorted}")
  }

  test("every oracle points at an existing gate query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without a gate: ${dangling.toSeq.sorted}")
  }

  test("the no-oracle list is itself real and minimal") {
    assert(noOracleByNature.subsetOf(SparkEntry.queries.keySet))
    assert((noOracleByNature & SparkEntry.oracleSql.keySet).isEmpty,
      "a query on the no-oracle list HAS an oracle — remove it from the list")
  }
}
