package graft

import graft.streaming.EventStreaming

/** Contract guard for the streaming operators' scale properties
  * (VERDICT r10 item 7): the replay harnesses (`sessionizeReplay` /
  * `dedupReplay`) are DOCUMENTED driver-fed verification scaffolding, but
  * the OPERATORS they wrap must stay production-shaped — no collect in
  * their bodies, and the session state must stay the constant-size
  * partial-aggregate form. A future edit that quietly fattens state back
  * to an event list (the O(session length) hazard the r8 rewrite removed)
  * or sneaks a driver materialization into the operator fails here, not
  * in production. */
class StreamingStateGuardSpec extends SparkSpec {

  /** The source span of one top-level `def` in EventStreaming.scala —
    * from its `def name` line to the next `  def ` at the same
    * indentation (or EOF). Source-text pinning is deliberate: a collect
    * is an ACTION, invisible in any plan the operator returns. */
  private lazy val source = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get(
      "src/main/scala/graft/streaming/EventStreaming.scala")), "UTF-8")

  private def span(defName: String, withDoc: Boolean = false): String = {
    val start = source.indexOf(s"def $defName(")
    assert(start >= 0, s"def $defName not found — spec needs updating")
    val from = if (withDoc) {
      val doc = source.lastIndexOf("/**", start)
      if (doc >= 0) doc else start
    } else start
    val rest = source.substring(from)
    val next = rest.indexOf("\n  def ", rest.indexOf(s"def $defName(") + 1)
    if (next >= 0) rest.substring(0, next) else rest
  }

  test("operator bodies contain no driver materialization (collect/toLocal/head)") {
    for (op <- Seq("sessionizeStream", "dedupStream", "sessionWindowAgg",
        "intervalJoinStream", "windowedAgg")) {
      if (source.contains(s"def $op(")) {
        val body = span(op)
        for (bad <- Seq(".collect(", ".toLocalIterator", ".head(", ".take(")) {
          assert(!body.contains(bad),
            s"$op's body contains '$bad' — operators must never touch the driver")
        }
      }
    }
  }

  test("sessionizeStream's state is GroupState[List[OpenSession]], not an event list") {
    val body = span("sessionizeStream")
    assert(body.contains("state: GroupState[List[OpenSession]]"),
      "sessionizeStream's state type changed — it must stay the bounded " +
        "partial-aggregate form (O(open sessions), not O(session length))")
    assert(!body.contains("GroupState[List[Event]]") &&
      !body.contains("GroupState[Seq[Event]]") &&
      !body.contains("GroupState[Vector[Event]]"),
      "sessionizeStream state regressed to an event list — unbounded per-key state")
  }

  test("OpenSession stays a constant-size Long 4-tuple (the mergeable partial aggregate)") {
    // reflection pin: adding any field (worst case a collection) changes
    // the state-store row size class from O(1) to O(events)
    val fields = classOf[EventStreaming.OpenSession].getDeclaredFields
      .filterNot(f => f.isSynthetic || f.getName.contains("$"))
      .map(f => f.getName -> f.getType.getSimpleName).toSeq.sortBy(_._1)
    assert(fields == Seq("endUs" -> "long", "nEvents" -> "long",
      "startUs" -> "long", "sumCents" -> "long"),
      s"OpenSession fields changed: $fields — state size contract broken")
  }

  test("only the replay harnesses collect, and they say so") {
    // the two harnesses are the documented exception; each must keep the
    // harness disclaimer next to the collect so the contract is visible
    // at the call site
    for (h <- Seq("sessionizeReplay", "dedupReplay", "aggStateReplay",
        "topkReplay", "anomalyReplay", "upsertReplay")) {
      val body = span(h, withDoc = true)
      assert(body.contains(".collect()"), s"$h no longer collects — update this spec")
      assert(body.toLowerCase.contains("harness"),
        s"$h lost its harness disclaimer")
    }
  }
}
