package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT frequent terms ("heavy hitters") without a full-vocabulary
  * shuffle — the scale path beside [[graft.text.Ngrams.vocab]]'s exact
  * groupBy: at web scale the distinct-term set (URLs, hashes, typos) is
  * billions of keys, and `vocab`'s exchange moves ALL of them to find the
  * few thousand frequent ones. This operator instead runs per-partition
  * Misra-Gries summaries with k = den+1 counters (bounded memory,
  * independent of vocabulary size), merges them on the driver via
  * `treeAggregate` (mergeable-summaries construction: sum counters, then
  * subtract the (k+1)-th largest and drop non-positives — error bounds
  * ADD, staying ≤ N/k; Agarwal et al., "Mergeable Summaries", PODS 2012),
  * and then EXACTLY recounts only the ≤ k surviving candidates with a
  * map-side semi-join. Any term with global count ≥ N/den survives every
  * decrement by the MG guarantee (undercount < N/k = N/(den+1) <
  * ⌈N/den⌉), so the recount sees every qualifying term and the output is
  * exact — hash-identical to the full groupBy, at a fraction of the
  * exchange: the only wide work is counting candidate occurrences, a
  * shuffle of ≤ den+1 grouping keys.
  *
  * Two corpus scans (the summary pass carries the total-token count; the
  * recount is map-side filtered), zero wide exchange of non-candidate
  * terms, O(den) driver memory — `den` is a mix-design knob ("terms with
  * ≥ 1/64 of corpus mass"), not a tuning parameter.
  */
object HeavyHitters {

  /** Mergeable Misra-Gries summary: ≤ k counters, undercounts by < n/k.
    * `dec` is the REALIZED undercount bound: any term with true count
    * > dec is guaranteed to survive in `counts` (each decrement event
    * and each merge subtraction lowers every term's counter relative to
    * its true count by at most the amount added to `dec`). */
  private[graft] final class Summary(val k: Int) extends Serializable {
    require(k >= 1, s"need k >= 1 counters, got $k")
    val counts = new mutable.HashMap[String, Long]
    var n: Long = 0L // tokens observed (for the global threshold)
    var dec: Long = 0L // realized decrement + merge-subtraction total

    def add(w: String): Unit = {
      n += 1
      counts.get(w) match {
        case Some(c) => counts.update(w, c + 1)
        case None if counts.size < k => counts.update(w, 1L)
        case None =>
          // classic decrement-all (the new token's own 1 cancels against
          // the decrement, so it is NOT inserted); each decrement event
          // retires k+1 units of count, so the per-token cost amortizes
          // to O(1) and the total undercount stays < n/k
          dec += 1
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace { (t, c) => if (c == 1L) dead += t; c - 1L }
          dead.foreach(counts.remove)
      }
    }

    /** Mergeable-summaries combine: pointwise sum, then if over k
      * counters subtract the (k+1)-th largest value from all and drop
      * non-positives — at most k survive, and the subtracted value is a
      * valid additional undercount (bounds add). */
    def merge(o: Summary): Summary = {
      n += o.n
      dec += o.dec // undercounts of merged summaries ADD (PODS 2012)
      o.counts.foreach { case (t, c) => counts.update(t, counts.getOrElse(t, 0L) + c) }
      if (counts.size > k) {
        val vs = counts.values.toArray
        java.util.Arrays.sort(vs)
        val d = vs(vs.length - 1 - k) // (k+1)-th largest
        dec += d
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace { (t, c) => if (c <= d) dead += t; c - d }
        dead.foreach(counts.remove)
      }
      this
    }
  }

  /** Column-metadata keys on the returned `term` column reporting WHICH
    * path produced the result — at 100 TB the sketch-recount and the
    * full-vocabulary group-by differ by orders of magnitude of exchange,
    * and an operator that silently took the expensive path is an
    * unexplained regression. `path` is "sketch-recount" (certificate
    * held; wide work = candidate occurrences only) or "exact-fallback"
    * (realized undercount reached the threshold; full group-by ran);
    * `dec`/`n`/`min_count` are the certificate's inputs. Read via
    * `df.schema("term").metadata` — [[pathTaken]] unpacks it. */
  val MetaPath = "graft.hh.path"
  val MetaDec = "graft.hh.dec"
  val MetaN = "graft.hh.n"
  val MetaMinCount = "graft.hh.min_count"

  /** (path, dec, n, minCount) from a [[frequentTerms]] result. */
  def pathTaken(df: DataFrame): (String, Long, Long, Long) = {
    val m = df.schema("term").metadata
    (m.getString(MetaPath), m.getLong(MetaDec), m.getLong(MetaN),
      m.getLong(MetaMinCount))
  }

  /** Terms whose global occurrence count is ≥ max(1, totalTokens/den)
    * (integer division) — "at least a 1/den share of the corpus". Output:
    * (term, cnt), exact, ordered by term; the `term` column carries
    * which-path-ran telemetry (see [[MetaPath]]). Tokenization matches
    * `vocab`/the oracles: split on single spaces, trailing empties kept,
    * NULL text contributes nothing. `den` is capped so the merged summary
    * and the candidate broadcast stay driver-safe. */
  def frequentTerms(docs: DataFrame, den: Long): DataFrame = {
    require(den >= 1 && den <= 4000000L,
      s"den must be in [1, 4e6] (driver holds den+1 counters), got $den")
    val spark = docs.sparkSession
    val k = den.toInt + 1

    // pass 1: per-partition MG + tree-merge. String.split(" ", -1) keeps
    // trailing empty tokens, matching Spark SQL's split() in the recount.
    val texts = docs.select(col("text"))
      .map(r => if (r.isNullAt(0)) null else r.getString(0))(
        org.apache.spark.sql.Encoders.STRING)
    val summary = texts.rdd.treeAggregate(new Summary(k))(
      seqOp = { (s, text) =>
        if (text != null) {
          val ws = text.split(" ", -1)
          var i = 0
          while (i < ws.length) { s.add(ws(i)); i += 1 }
        }
        s
      },
      combOp = (a, b) => a.merge(b))
    val minCount = math.max(1L, summary.n / den)

    val exploded = docs.select(explode(split(col("text"), " ")).as("term"))

    // exactness guard: a term survives the summary whenever its true
    // count exceeds the REALIZED undercount `dec` (≤ the n/k worst case,
    // usually far less). The candidate set is provably complete only when
    // minCount > dec; the a-priori bound covers minCount = n/den > n/k,
    // but integer-floored thresholds near 1 (n < 2·den ⇒ minCount = 1 ≤
    // possible dec) can lose a qualifying term. When the certificate
    // fails, fall back to the exact full group-by — correctness is never
    // a function of the sketch.
    def meta(path: String) = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(MetaPath, path).putLong(MetaDec, summary.dec)
      .putLong(MetaN, summary.n).putLong(MetaMinCount, minCount).build()

    val (path, counted) =
      if (minCount <= summary.dec)
        "exact-fallback" -> exploded
          .groupBy("term").agg(count(lit(1)).as("cnt"))
      else {
        // pass 2: exact recount of the ≤ k candidates only — the broadcast
        // semi-join filters map-side, so non-candidate terms never leave
        // their scan partition
        import spark.implicits._
        val candidates = summary.counts.keys.toSeq.toDF("term")
        "sketch-recount" -> exploded
          .join(broadcast(candidates), Seq("term"), "left_semi")
          .groupBy("term").agg(count(lit(1)).as("cnt"))
      }
    if (path == "exact-fallback")
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"HeavyHitters.frequentTerms: certificate failed " +
        s"(minCount=$minCount <= dec=${summary.dec}, n=${summary.n}) — " +
        "taking the exact full-vocabulary group-by fallback")
    counted
      .filter(col("cnt") >= minCount)
      .select(col("term").as("term", meta(path)), col("cnt"))
      .orderBy("term")
  }
}
