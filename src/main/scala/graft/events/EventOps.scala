package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time operators over the `events` table — the reference's
  * rank-window math (`/root/reference/src/SlidingAggregation.java:255-430`)
  * generalized from ROWS frames over a global rank to RANGE frames over
  * event time, per key.
  *
  * Time base: all event-time math runs on epoch MICROSECONDS as BIGINT
  * (`tus`), derived type-adaptively by [[tsMicros]] — the parquet `ts`
  * column has shipped both as Long nanoseconds (read via
  * `spark.sql.legacy.parquet.nanosAsLong=true`, floored with `div 1000`:
  * DuckDB's ns→µs conversion TRUNCATES toward zero, verified at -1500 ns
  * → -1 µs, and SQL `div` truncates the same way, so the engines agree
  * even pre-1970) and as parquet `timestamp[us]` (read as TIMESTAMP_NTZ,
  * converted with `unix_micros` under a UTC session — exactly DuckDB's
  * `epoch_us(ts)`). µs is the largest cross-engine-exact resolution.
  *
  * Scale: both operators shuffle ONCE on the partition key (`user_id`);
  * within a key Spark's WindowExec streams with a spillable sort. Skewed
  * users would be handled by AQE or key salting; no global ordering is
  * required anywhere.
  */
object EventOps {

  /** Epoch-microseconds (BIGINT) view of `df`'s `ts` column, adapting to
    * how the parquet actually stored it:
    *  - `LongType` — raw nanoseconds (nanosAsLong read): truncating
    *    `div 1000`, matching DuckDB's ns→µs truncation;
    *  - `TIMESTAMP_NTZ` — parquet `timestamp[us]`, isAdjustedToUTC=false:
    *    `unix_micros` after an NTZ→TS cast, which is exact iff the session
    *    time zone is UTC (enforced here — a non-UTC session would silently
    *    shift every timestamp), matching DuckDB `epoch_us(ts)`;
    *  - `TIMESTAMP` — `unix_micros` directly (tz-independent).
    * Any other type is a schema drift worth a loud, named failure. */
  def tsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("CAST(ts div 1000 AS BIGINT)")
    case TimestampNTZType =>
      require(df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
        "tsMicros on TIMESTAMP_NTZ requires spark.sql.session.timeZone=UTC " +
          "for parity with DuckDB epoch_us")
      unix_micros(col("ts").cast(TimestampType))
    case TimestampType => unix_micros(col("ts"))
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported type $other — expected ns-as-Long, " +
        "TIMESTAMP_NTZ, or TIMESTAMP (testdata schema drift?)")
  }

  private def base(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"),
      tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("v"))

  /** Trailing event-time window per user: sum + count of `value` cents over
    * [t − windowSec, t] inclusive. Output:
    * (event_id, user_id, win_sum_c, win_cnt). */
  def trailingWindow(events: DataFrame, windowSec: Long): DataFrame = {
    val us = windowSec * 1000000L
    val w = Window.partitionBy("user_id").orderBy("tus").rangeBetween(-us, 0)
    base(events)
      .select(col("event_id"), col("user_id"),
        sum("v").over(w).as("win_sum_c"),
        count(lit(1)).over(w).as("win_cnt"))
      .orderBy("event_id")
  }

  /** Sessionization: a new session starts when the gap to the user's
    * previous event exceeds `gapSec`. Output: (event_id, user_id,
    * session_id) with session ids numbered 1.. per user in time order. */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val us = gapSec * 1000000L
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base(events)
      .withColumn("prev", lag("tus", 1).over(order))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > us, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(cum).cast(LongType))
      .select("event_id", "user_id", "session_id")
      .orderBy("event_id")
  }

  /** Session INTERVALS: [[sessionize]]'s boundaries materialized as one
    * row per session — (user_id, session_id, s_start, s_end, n_events),
    * epoch-µs inclusive bounds. The interval-shaped view that overlap
    * joins ([[RangeJoin.intervalOverlap]]) and duration analytics
    * consume. Same single user-keyed partitioning as sessionize; the
    * closing aggregation reuses it (no second exchange). */
  def sessionIntervals(events: DataFrame, gapSec: Long): DataFrame = {
    val us = gapSec * 1000000L
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base(events)
      .withColumn("prev", lag("tus", 1).over(order))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > us, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(cum).cast(LongType))
      .groupBy("user_id", "session_id")
      .agg(min("tus").as("s_start"), max("tus").as("s_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }

  /** Ordered conversion funnel: per user, the earliest time of stage 1,
    * then the earliest stage-2 event STRICTLY AFTER it, then the earliest
    * stage-3 event strictly after that, and so on — the standard
    * product-analytics funnel (view → click → purchase), generalized to
    * any ordered `stages` sequence of event types. Output: one row per
    * user that reached stage 1, with a nullable `t_<stage>` epoch-µs
    * column per stage (null = never reached), ordered by user.
    *
    * Scale shape: one filtered aggregation per stage plus one
    * co-partitioned equi-join per stage transition, all keyed on
    * `user_id` — the same single-key partitioning story as the other
    * event operators; no window over the full stream, nothing global.
    * Events for other types are dropped before every exchange. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate stage in $stages")
    val ev = events.select(col("user_id"), tsMicros(events).as("tus"),
      col("event_type"))
    def tcol(s: String) = s"t_$s"
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("tus").as(tcol(stages.head)))
    val full = stages.tail.foldLeft((first, tcol(stages.head))) {
      case ((acc, prev), st) =>
        val next = ev.filter(col("event_type") === st)
          // inner join against only the users that reached the previous
          // stage — the funnel narrows, so each transition's exchange is
          // no larger than the previous stage's survivors
          .join(acc.filter(col(prev).isNotNull).select("user_id", prev),
            Seq("user_id"))
          .filter(col("tus") > col(prev))
          .groupBy("user_id").agg(min("tus").as(tcol(st)))
        (acc.join(next, Seq("user_id"), "left"), tcol(st))
    }._1
    full.orderBy("user_id")
  }

  /** Markov transition counts over each user's event-type sequence: for
    * every consecutive pair of events (time order, event_id tiebreak)
    * within a user, count (from_type → to_type) occurrences — the
    * behavioral transition matrix. One user-partitioned window (lead) and
    * one tiny aggregation; the matrix is O(#types²). */
  def transitions(events: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    events.select(col("event_id"), col("user_id"), col("event_type"),
        tsMicros(events).as("tus"))
      .withColumn("to_type", lead("event_type", 1).over(order))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Debounce: drop an event when the IMMEDIATELY PRECEDING event of the
    * same (user, event_type) lies within `windowSec` — double-click /
    * retry-storm suppression for telemetry. Lag-based (each event
    * compares against its raw predecessor, not the last RETAINED one —
    * the stateful variant is the streaming dedup's job); one window over
    * the (user, type) partitioning. Output: the surviving events'
    * (event_id, user_id, event_type, tus), ordered by event_id. */
  def debounce(events: DataFrame, windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val us = windowSec * 1000000L
    val order = Window.partitionBy("user_id", "event_type")
      .orderBy("tus", "event_id")
    events.select(col("event_id"), col("user_id"), col("event_type"),
        tsMicros(events).as("tus"))
      .withColumn("prev", lag("tus", 1).over(order))
      .filter(col("prev").isNull || col("tus") - col("prev") > us)
      .select("event_id", "user_id", "event_type", "tus")
      .orderBy("event_id")
  }

  /** Activity streaks — the gaps-and-islands primitive: per user, the
    * maximal runs of CONSECUTIVE active days (engagement streaks,
    * SLA-uptime islands, contiguous-coverage audit). Output: (user_id,
    * streak_start_day, streak_end_day, n_days) with day = UTC epoch-day,
    * ordered by user and streak start.
    *
    * The classic constant-minus-rank trick: distinct (user, day) first —
    * a map-side-combined exchange of O(active user-days), never raw
    * events — then `day − row_number` is constant exactly within a
    * consecutive run, so one per-user window plus one aggregation finds
    * every island. No self-join, no iteration; the window is partitioned
    * by user (bounded partitions — plan-audit-safe). */
  def activityStreaks(events: DataFrame): DataFrame = {
    // integral `div`, not `/` (Column `/` is floating division); ts is
    // non-negative so truncation == floor
    val days = events.select(col("user_id"), tsMicros(events).as("tus"))
      .select(col("user_id"), expr("tus div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days.withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(min("day").as("streak_start_day"), max("day").as("streak_end_day"),
        count(lit(1)).as("n_days"))
      .select("user_id", "streak_start_day", "streak_end_day", "n_days")
      .orderBy("user_id", "streak_start_day")
  }

  /** Exact distinct active users per trailing `windowDays`-day window
    * ending at each OBSERVED day — the "7-day actives" (WAU) curve — with
    * neither per-window replication nor a distinct-over-window:
    *
    * For a user's sorted distinct active days, a day `d0` with previous
    * active day `p` is the user's FIRST active day inside exactly the
    * window-ends `d ∈ [max(d0, p+W), d0+W−1]` (consecutive pairs of the
    * same user tile these ranges disjointly — the next active day's range
    * starts at `d0+W` or later), so every user contributes EXACTLY one
    * +1/−1 delta pair per activity gap and the count at window-end `d` is
    * the running sum of deltas at days ≤ d.
    *
    * Scale: the exchange is O(distinct user-days) (one `distinct`, one
    * per-user lag window); the running sum runs over O(distinct days) rows
    * via [[graft.operators.PrefixSum.exclusive]] — never a partitionless
    * window over raw events, never a ×W replication of the corpus.
    * Output: (day, n_users) at each observed day. */
  def slidingDistinctUsers(events: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = events.select(col("user_id"), tsMicros(events).as("tus"))
      .select(col("user_id"), expr("tus div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val iv = ud.withColumn("prev", lag("day", 1).over(w))
      .select(
        // first-in-window range [lo, hi]; hi1 = hi + 1 is the −1 delta day
        greatest(col("day"), coalesce(col("prev") + windowDays, col("day")))
          .as("lo"),
        (col("day") + windowDays).as("hi1"))
    val deltas = iv.select(col("lo").as("day"), lit(1L).as("delta"))
      .unionByName(iv.select(col("hi1").as("day"), lit(-1L).as("delta")))
    val observed = ud.select("day").distinct()
    // observed days join the delta table with delta 0 so the prefix scan
    // lands on every reporting day even when no delta falls on it
    val perDay = deltas
      .unionByName(observed.select(col("day"), lit(0L).as("delta")))
      .groupBy("day").agg(sum("delta").as("delta"))
    val run = graft.operators.PrefixSum.exclusive(
      perDay, "delta", "excl", numParts = 0, col("day"))
    run.select(col("day"), (col("excl") + col("delta")).as("n_users"))
      .join(observed, Seq("day"), "left_semi")
      .orderBy("day")
  }

  /** Exact time-weighted average (TWAP) per user — the telemetry /
    * financial "average of the held value" where each event's value
    * counts for as long as it was the latest one, so a burst of 1000
    * readings in a second cannot drown one reading that held for an
    * hour (the failure mode of the plain mean).
    *
    * Per user, events ordered by (tus, event_id): each consecutive pair
    * contributes (value · Δt) with Δt in MILLISECONDS (µs div 1000 —
    * truncation agrees across engines, and the coarser unit keeps
    * Σ v·Δt within Int64: cents ≲ 10⁵ × week-long holds ≲ 10⁹ ms ×
    * thousands of intervals ≈ 10¹⁷). The average is the exact fraction
    * twa_num/twa_den; zero-length holds contribute zero weight; a user
    * with a single event has no holding interval and is absent. One
    * user-partitioned lead window + one map-side-combined aggregation.
    * Output: (user_id, n_intervals, twa_num, twa_den). */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    events.select(col("user_id"), col("event_id"), tsMicros(events).as("tus"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("v"))
      .withColumn("nxt", lead("tus", 1).over(order))
      .filter(col("nxt").isNotNull)
      .select(col("user_id"), col("v"),
        expr("(nxt - tus) div 1000").as("dt_ms"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("v") * col("dt_ms")).as("twa_num"),
        sum("dt_ms").as("twa_den"))
      .orderBy("user_id")
  }

  /** Per-user exponentially-weighted moving average of value cents over
    * the trailing `lastN` events — the recency-biased engagement/price
    * signal a plain mean lags behind. All arithmetic is EXACT Int64
    * fixed-point with rational α = `alphaNum`/`alphaDen`:
    *
    *   y₁ = v₁;  yₜ = (alphaNum·vₜ + (alphaDen−alphaNum)·yₜ₋₁) div alphaDen
    *
    * — truncating division each step (identical in Spark `div`, DuckDB
    * `//`, and any engine, on the NON-NEGATIVE values enforced here;
    * floor-vs-truncate semantics diverge below zero, so negative cents
    * raise rather than silently drift by ±1 per step). The fold is NOT
    * associative (each step divides), so it runs as a per-user
    * `aggregate()` lambda over the time-sorted value array — whole-stage
    * codegen, no UDF. The `lastN` cap (rank window, newest first) bounds
    * the per-user array at a constant — state never scales with a hot
    * user's history, and an oracle's replay depth is bounded the same
    * way. Events order by (tus, event_id) — a strict total order.
    *
    * Output: (user_id, n_obs, ewma_c), ordered by user_id. Int64 bounds:
    * the step's products are ≤ alphaDen·max(v, y) — safe while
    * alphaDen·maxCents < 2⁶³. */
  def ewma(events: DataFrame, alphaNum: Long, alphaDen: Long,
           lastN: Int): DataFrame = {
    require(alphaDen >= 1 && alphaNum >= 1 && alphaNum <= alphaDen,
      s"need 0 < alphaNum <= alphaDen, got $alphaNum/$alphaDen")
    require(lastN >= 1, s"lastN must be >= 1, got $lastN")
    val order = Window.partitionBy("user_id")
      .orderBy(col("tus").desc, col("event_id").desc)
    val capped = events.select(col("user_id"), col("event_id"),
        tsMicros(events).as("tus"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("v0"))
      .select(col("user_id"), col("event_id"), col("tus"),
        when(col("v0") >= 0L, col("v0")).otherwise(raise_error(format_string(
          "ewma: negative cents %s (truncating vs flooring division " +
            "diverge below zero)", col("v0")))).as("v"))
      .withColumn("rn", row_number().over(order))
      .filter(col("rn") <= lastN)
    capped.groupBy("user_id")
      .agg(count(lit(1)).as("n_obs"),
        sort_array(collect_list(struct(col("tus"), col("event_id"),
          col("v")))).as("xs"))
      .select(col("user_id"), col("n_obs"),
        expr(s"""aggregate(
          slice(transform(xs, x -> x.v), 2, size(xs) - 1),
          element_at(transform(xs, x -> x.v), 1),
          (acc, v) -> ($alphaNum * v + ${alphaDen - alphaNum} * acc) div $alphaDen
        )""").as("ewma_c"))
      .orderBy("user_id")
  }

  /** Linear multi-touch attribution: each conversion's value splits
    * EQUALLY across the user's touch events inside the trailing
    * `windowUs` lookback — the credit model between last-touch (all to
    * one) and data-driven (needs a model). Credit stays an EXACT
    * fraction (conv_cents / n_touches per touch), never a divided
    * float, so credits re-aggregate losslessly downstream.
    *
    * Scale shape (the [[RangeJoin]] bucket discipline with the user in
    * the key): conversions explode to the ≤ windowUs/bucket + 1 time
    * buckets their lookback spans, touches compute their single bucket,
    * and the join is a plain EQUI-join on (user, bucket) with the exact
    * range predicate as a post-filter — a (touch, conversion) pair can
    * meet only in the touch's bucket, so no dedup pass. Bucket width =
    * windowUs ⇒ explosion factor ≤ 2. Cross-user bucket collisions
    * never join (the user is IN the key — the whole point vs a plain
    * bucket join).
    *
    * Conversions with NO touch in the window are unattributed and
    * absent from the output (count them via anti-join if needed).
    * Output: (user_id, conv_id, touch_id, touch_type, credit_num,
    * credit_den), ordered by (conv_id, touch_id). */
  def linearAttribution(events: DataFrame, convType: String,
                        touchTypes: Seq[String], windowUs: Long): DataFrame = {
    val pairs = touchPairs(events, convType, touchTypes, windowUs)
    val n = pairs.groupBy("conv_id").agg(count(lit(1)).as("credit_den"))
    pairs.join(n, Seq("conv_id"))
      .select(col("user_id"), col("conv_id"), col("touch_id"),
        col("touch_type"), col("cents").as("credit_num"), col("credit_den"))
      .orderBy("conv_id", "touch_id")
  }

  /** Position-based ("U-shaped") multi-touch attribution — the credit
    * model that values INTRODUCTION and CLOSING over the middle: one
    * touch takes everything; two split 500‰/500‰; three or more give
    * the first and last 400‰ each and the middles 200‰/(n−2) apiece.
    * Credits stay EXACT fractions — credit_num = cents·w and
    * credit_den = 1000 (or 1000·(n−2) for middles) — so they
    * re-aggregate losslessly and any engine replays them. First/last
    * break timestamp ties by touch_id (a strict total order). Same
    * (user, time-bucket) pair machinery and window-edge semantics as
    * [[linearAttribution]]; position is ONE partitioned window pass
    * over the per-conversion candidate set. Output: (user_id, conv_id,
    * touch_id, touch_type, position, credit_num, credit_den), position
    * ∈ {'first', 'last', 'middle', 'only', 'half'}, ordered by
    * (conv_id, touch_id). */
  def positionAttribution(events: DataFrame, convType: String,
                          touchTypes: Seq[String], windowUs: Long): DataFrame = {
    val pairs = touchPairs(events, convType, touchTypes, windowUs)
    val w = Window.partitionBy("conv_id")
    val ranked = pairs
      .withColumn("__asc", row_number().over(
        w.orderBy(col("tts"), col("touch_id"))))
      .withColumn("__desc", row_number().over(
        w.orderBy(col("tts").desc, col("touch_id").desc)))
      .withColumn("__n", count(lit(1)).over(w))
    ranked.select(col("user_id"), col("conv_id"), col("touch_id"),
        col("touch_type"),
        when(col("__n") === 1, lit("only"))
          .when(col("__n") === 2, lit("half"))
          .when(col("__asc") === 1, lit("first"))
          .when(col("__desc") === 1, lit("last"))
          .otherwise(lit("middle")).as("position"),
        when(col("__n") === 1, col("cents") * 1000L)
          .when(col("__n") === 2, col("cents") * 500L)
          .when(col("__asc") === 1 || col("__desc") === 1, col("cents") * 400L)
          .otherwise(col("cents") * 200L).as("credit_num"),
        when(col("__n") <= 2 || col("__asc") === 1 || col("__desc") === 1,
          lit(1000L))
          .otherwise(lit(1000L) * (col("__n") - 2L)).as("credit_den"))
      .orderBy("conv_id", "touch_id")
  }

  /** The attribution candidate set: every (touch, conversion) pair of
    * the same user with the touch inside the conversion's trailing
    * `windowUs` lookback — the [[RangeJoin]] bucket discipline with the
    * user IN the equi-key (bucket width = lookback ⇒ each conversion
    * explodes to ≤ 2 buckets; a pair meets only in the touch's bucket,
    * so no dedup pass; cross-user bucket collisions never join). */
  private def touchPairs(events: DataFrame, convType: String,
                         touchTypes: Seq[String], windowUs: Long): DataFrame = {
    require(windowUs >= 1, s"windowUs must be >= 1, got $windowUs")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      s"convType $convType cannot also be a touch type")
    val b = windowUs
    val ev = events.select(col("user_id"), col("event_id"),
      col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    val touches = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("tus").as("tts"),
        expr(s"((tus - pmod(tus, $b)) div $b)").as("__b"))
    val convs = ev.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("tus").as("cts"), col("cents"),
        explode(sequence(
          expr(s"(((tus - $windowUs) - pmod(tus - $windowUs, $b)) div $b)"),
          expr(s"((tus - pmod(tus, $b)) div $b)"))).as("__b"))
    touches.join(convs, Seq("user_id", "__b"))
      .filter(col("cts") - lit(windowUs) <= col("tts") && col("tts") < col("cts"))
  }

  /** Cohort LTV curve — cumulative revenue by cohort age: users grouped
    * by their FIRST-activity day, revenue (conversion cents) laid out
    * by days-since-first, accumulated per cohort. THE
    * product-analytics payback view ("when does a signup cohort earn
    * its acquisition cost back"). Exchanges: one map-side-combined
    * first-day aggregate per user, one keyed join of revenue events to
    * their user's cohort, one (cohort, age) aggregate, one
    * cohort-partitioned cumulative window over the O(cohorts · ages)
    * curve table — raw events never meet a window. Ages with no
    * revenue are absent (the curve is sparse; densify with
    * [[resample]]-style grids downstream if needed). Output:
    * (cohort_day, age_days, n_users, rev_c, cum_rev_c), n_users the
    * cohort's size, ordered by (cohort_day, age_days). */
  def cohortLtv(events: DataFrame, revenueType: String): DataFrame = {
    val dayUs = 86400000000L
    val withTus = events.select(col("user_id"), col("event_type"),
      tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
      .select(col("user_id"), col("event_type"), col("cents"),
        expr(s"((tus - pmod(tus, $dayUs)) div $dayUs)").as("day"))
    // the first-day table feeds BOTH the cohort sizes and the revenue
    // join — no cross-branch CSE in Spark, so materialize it once
    val firsts = graft.operators.Checkpoints.checkpoint(
      withTus.groupBy("user_id").agg(min("day").as("cohort_day")))
    val sizes = firsts.groupBy("cohort_day").agg(count(lit(1)).as("n_users"))
    val rev = withTus.filter(col("event_type") === revenueType)
      .join(firsts, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"))
      .agg(sum("cents").as("rev_c"))
    val w = Window.partitionBy("cohort_day").orderBy("age_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(sizes, Seq("cohort_day"))
      .select(col("cohort_day"), col("age_days"), col("n_users"),
        col("rev_c"), sum("rev_c").over(w).as("cum_rev_c"))
      .orderBy("cohort_day", "age_days")
  }

  /** Inter-arrival gap statistics per user: count, min/max gap, and the
    * exact lower-median gap in MILLISECONDS — the latency/engagement-
    * cadence profile (median is robust where one overnight gap destroys
    * the mean). The median uses the frequency-compression rank scan
    * ([[graft.operators.TableOps.madPerGroup]]'s trick): gaps quantize
    * to ms (bounded distinct cardinality), a map-side-combined count per
    * (user, gap_ms), and the cumulative-count window runs over distinct
    * values — never a per-user sort of raw events beyond the one lag
    * window. Output: (user_id, n_gaps, min_gap_ms, med_gap_ms,
    * max_gap_ms). */
  def gapStats(events: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val gaps = events.select(col("user_id"), col("event_id"),
        tsMicros(events).as("tus"))
      .withColumn("prev", lag("tus", 1).over(order))
      .filter(col("prev").isNotNull)
      .select(col("user_id"),
        expr("(tus - prev) div 1000").as("gap_ms"))
    val cnts = gaps.groupBy("user_id", "gap_ms").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("user_id").orderBy("gap_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cnts
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy("user_id")))
      .withColumn("mn", min("gap_ms").over(Window.partitionBy("user_id")))
      .withColumn("mx", max("gap_ms").over(Window.partitionBy("user_id")))
      .filter(col("cum") - col("cnt") < expr("(n + 1) div 2") &&
        expr("(n + 1) div 2") <= col("cum"))
      .select(col("user_id"), col("n").as("n_gaps"),
        col("mn").as("min_gap_ms"), col("gap_ms").as("med_gap_ms"),
        col("mx").as("max_gap_ms"))
      .orderBy("user_id")
  }

  /** Sequential pattern counts: occurrences of every CONTIGUOUS length-`n`
    * event-type sequence within a user's stream (time order, event_id
    * tiebreak) — [[transitions]] is the n = 2 case; n = 3+ is the
    * sequence-mining view behind "what 3-step journeys precede a
    * purchase". Output: (t0, …, t(n-1), cnt) ordered lexicographically.
    *
    * One user-partitioned window pass computes all n−1 leads over the
    * SAME sort (one exchange, one sort), then a map-side-combined count
    * on the O(#types^n) pattern table. */
  def typeNgrams(events: DataFrame, n: Int): DataFrame = {
    require(n >= 2 && n <= 8, s"n must be in [2, 8], got $n")
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val tcols = (0 until n).map(i => s"t$i")
    val leads = (1 until n).map(i =>
      lead("event_type", i).over(order).as(s"t$i"))
    events.select(col("event_id"), col("user_id"), col("event_type"),
        tsMicros(events).as("tus"))
      .select(Seq(col("user_id"), col("event_type").as("t0")) ++ leads: _*)
      .filter(tcols.tail.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(tcols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(tcols.map(col): _*)
  }

  /** Trending: top-`k` event types per time bucket by count — the
    * "what's hot this hour" leaderboard. Count per (bucket, type) with
    * map-side combine, then a rank window PARTITIONED BY BUCKET over the
    * tiny count table (O(buckets·types) rows — the window never sees raw
    * events), deterministic tiebreak on type. */
  def trending(events: DataFrame, bucketUs: Long = 3600000000L,
               k: Int = 3): DataFrame = {
    require(bucketUs > 0 && k > 0, "bucketUs and k must be positive")
    val counts = events
      .select(col("event_type"), tsMicros(events).as("tus"))
      .withColumn("hour", expr(s"CAST(tus div $bucketUs AS BIGINT)"))
      .groupBy("hour", "event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("hour").orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .orderBy("hour", "rnk")
  }

  /** Cohort retention: bucket event time into fixed windows (weeks by
    * default), assign each user to the COHORT of their first-activity
    * bucket, and count distinct users active at each (cohort, offset)
    * cell — the classic retention triangle. Output: (cohort_week,
    * week_offset, n_users), offset 0 = the cohort's own bucket.
    *
    * Bucketing uses truncating integer division on epoch-µs (`div`),
    * which matches DuckDB's `//` for the non-negative timestamps events
    * carry. Scale shape: one aggregation per user (cohort), one
    * co-partitioned user join, a distinct on (user, cohort, offset) —
    * map-side combined — then the tiny triangle aggregation; everything
    * keys on user until the final O(#buckets²) result. */
  /** SCD Type-2 interval construction from an event log: treating each
    * user's event stream as change records for their "current activity
    * state" (the event type), collapse runs of consecutive equal states
    * and emit one validity interval per run — (user_id, state,
    * valid_from_us, valid_to_us), `valid_to_us` null for the open current
    * state. The warehouse "build a slowly-changing dimension from a CDC
    * feed" primitive.
    *
    * Two user-partitioned windows (lag for change detection, lead over
    * the CHANGE rows for interval close) — the second window sorts only
    * the collapsed change rows, not the raw stream. No global ordering,
    * one partitioning reused across both windows. */
  def scd2(events: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    events.select(col("user_id"), col("event_id"),
        tsMicros(events).as("tus"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(order))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to_us", lead("tus", 1).over(order))
      .select(col("user_id"), col("event_type").as("state"),
        col("tus").as("valid_from_us"), col("valid_to_us"))
      .orderBy("user_id", "valid_from_us")
  }

  /** Per-user ordered behavior path: the event-type sequence of the first
    * `maxEvents` events (time order, event_id tiebreak) joined with '>',
    * plus the user's total event count. The sequence-mining / journey-
    * analysis primitive.
    *
    * Scale shape: rank + total-count in ONE user-partitioned window pass,
    * filter to the first `maxEvents` BEFORE the aggregation — the
    * collect_list buffer is bounded at `maxEvents` entries per user, so an
    * always-active user can't blow an agg buffer; the window sort itself
    * is Spark's spillable sort. */
  def userPaths(events: DataFrame, maxEvents: Int = 20): DataFrame = {
    require(maxEvents > 0, "maxEvents must be positive")
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val whole = Window.partitionBy("user_id")
    events.select(col("user_id"), col("event_id"),
        tsMicros(events).as("tus"), col("event_type"))
      .withColumn("rn", row_number().over(order))
      .withColumn("n_events", count(lit(1)).over(whole))
      .filter(col("rn") <= maxEvents)
      .groupBy("user_id")
      .agg(
        array_join(expr(
          "transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type)"),
          ">").as("path"),
        max("n_events").as("n_events"))
      .orderBy("user_id")
  }

  /** Half-life-decayed engagement score per user: each event contributes
    * `cents · w(age)` where `w` halves per `halfLifeUs` elapsed before the
    * corpus's newest event — the recency-weighted feature behind trending
    * users / freshness-weighted training mixtures. Weights are integer
    * permille (1000 >> age_buckets, floored at bucket 20 where the weight
    * is already 0), so the math is exact 64-bit across engines — no
    * float exp(), no cross-engine summation-order drift.
    *
    * The reference instant is the global max event time: an O(1) scalar
    * aggregate collected to the driver (bounded model state, same class
    * as IVF centroids), then folded into the per-row projection — the
    * scoring pass is one map-side-combined aggregation keyed on user. */
  def decayedScore(events: DataFrame, halfLifeUs: Long = 86400000000L): DataFrame = {
    require(halfLifeUs > 0, "halfLifeUs must be positive")
    val ev = events.select(col("user_id"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    // O(1) scalar collect; null only when events is empty, in which case
    // the grouped result below is empty regardless of the reference instant
    val tmaxRow = ev.agg(max("tus")).head
    val tmax = if (tmaxRow.isNullAt(0)) 0L else tmaxRow.getLong(0)
    ev
      .withColumn("k",
        least(expr(s"CAST((${tmax}L - tus) div ${halfLifeUs}L AS INT)"), lit(20)))
      .withColumn("w_permille",
        expr("CAST(1000 div shiftleft(CAST(1 AS BIGINT), k) AS BIGINT)"))
      .groupBy("user_id")
      .agg(sum(expr("cents * w_permille")).as("score_permille"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Regular-grid resample with gap-fill and forward-fill: bucket each
    * event type's stream into fixed `bucketUs` windows, then densify onto
    * the full [min, max] bucket grid (missing buckets appear with
    * n_events = 0) and carry the last observed bucket-sum forward across
    * the gaps — the time-series normalization step every
    * charting / feature-window / anomaly pipeline needs before it can
    * difference or lag a metric. Output per (event_type, bucket):
    * (event_type, bucket, n_events, sum_c nullable, ff_sum_c = last
    * non-null sum_c at or before this bucket, null before the first
    * observation).
    *
    * Scale shape: the raw stream is reduced FIRST by one map-side-combined
    * aggregation to O(types·buckets) rows; the global bucket bounds are an
    * O(1) scalar aggregate collected to the driver (bounded model state,
    * same class as decayedScore's reference instant — NOT a cross join,
    * which would plan as a nested-loop), then folded into a per-type
    * sequence explode over the distinct type table; the forward-fill
    * window partitions by type over grid rows only — raw events never
    * meet a window or an explode. */
  def resample(events: DataFrame, bucketUs: Long = 3600000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val ev = events.select(col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    // floor-safe bucketing (pmod form) so a pre-1970 stream can't drift
    val bucketed = ev.withColumn("bucket",
      expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
    val agg = bucketed.groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_obs"), sum("cents").as("sum_c"))
    // O(1) scalar collect; null only when events is empty — then the
    // distinct type table below is empty too and the grid is empty anyway
    val boundsRow = bucketed.agg(min("bucket"), max("bucket")).head
    val (bmin, bmax) =
      if (boundsRow.isNullAt(0)) (0L, 0L)
      else (boundsRow.getLong(0), boundsRow.getLong(1))
    val grid = events.select(col("event_type")).distinct()
      .select(col("event_type"),
        explode(sequence(lit(bmin), lit(bmax))).as("bucket"))
    val ff = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        col("sum_c"),
        last("sum_c", ignoreNulls = true).over(ff).as("ff_sum_c"))
      .orderBy("event_type", "bucket")
  }

  /** CUSUM changepoint detection — for each event type's bucketed value
    * series, the bucket where the cumulative sum deviates most from the
    * constant-rate line: dev_t = n·C_t − t·T (C_t = running bucket-sum
    * through the t-th observed bucket, T = series total, n = #buckets),
    * which is n·T times the classic CUSUM statistic C_t/T − t/n — same
    * argmax, EXACT Int64 arithmetic (the float CUSUM's argmax can flip
    * under summation-order drift near ties). A level shift at bucket k
    * maximizes |dev| at k; output per type: (event_type, n_buckets,
    * total_c, cp_bucket, cp_idx, cp_dev), tie-broken to the earliest
    * bucket, types with < 2 buckets omitted (no interior point).
    *
    * Scale shape: raw events collapse FIRST to O(types·buckets) rows by
    * one map-side-combined aggregation; the running sum / index / argmax
    * windows all partition by type over that small table — raw events
    * never meet a window. Int64 guard: n_buckets·|total_c| raises past
    * Long.Max (one check per type, not per row). */
  def cusumChangepoint(events: DataFrame,
                       bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val ev = events.select(col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    val agg = ev
      .withColumn("bucket",
        expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy("event_type", "bucket")
      .agg(sum("cents").as("s"))
    val byType = Window.partitionBy("event_type").orderBy("bucket")
    val run = agg
      .withColumn("c", sum("s").over(
        byType.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", row_number().over(byType).cast(LongType))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("total", sum("s").over(Window.partitionBy("event_type")))
      .filter(col("n") >= 2)
      // one guard per (type, bucket) row of the SMALL aggregated table;
      // n·|total| bounds every |n·c − t·total| term below
      .withColumn("total", when(
        abs(col("total")) > expr(s"${Long.MaxValue}L div n"),
        raise_error(concat(lit("cusumChangepoint: n_buckets * |total_c| " +
          "overflows Int64 for type "), col("event_type"))))
        .otherwise(col("total")))
      .withColumn("dev", col("n") * col("c") - col("t") * col("total"))
    // argmax |dev| with earliest-bucket tiebreak, via the min_by struct
    // trick (no second window pass over a rank)
    run.groupBy("event_type")
      .agg(max("n").as("n_buckets"), max("total").as("total_c"),
        min_by(struct(col("bucket").as("cp_bucket"), col("t").as("cp_idx"),
          col("dev").as("cp_dev")),
          struct((-abs(col("dev"))).as("a"), col("bucket").as("b")))
          .as("cp"))
      .select(col("event_type"), col("n_buckets"), col("total_c"),
        col("cp.cp_bucket"), col("cp.cp_idx"), col("cp.cp_dev"))
      .orderBy("event_type")
  }

  /** Rolling z-score anomaly detection — for each event type's bucketed
    * value series, flag buckets whose value deviates more than z from the
    * mean of the `window` PRECEDING buckets (the current bucket is
    * EXCLUDED: included, a lone spike inflates its own baseline variance
    * and caps the attainable z at (n−1)/√n ≈ 2.3 for a week — it can
    * never cross 3σ; spec-caught during development). Mean and variance
    * are EXACT integer moment forms over the preceding window: dev_num =
    * n_w·x − sum_w and var_num = n_w·sumsq_w − sum_w². The flag compares
    * dev_num²·(n_w−1)·100 > z10²·var_num·n_w — algebraically identical
    * to |x − x̄| > (z10/10)·s with the SAMPLE std s, no float, no sqrt
    * (both sides squared; the multiplication runs in DECIMAL(38,0), so
    * the comparison is exact even where dev_num² passes Int64). This is
    * the trailing-window complement to [[graft.operators.TableOps
    * .robustOutliers]]'s whole-history MAD rule: a metric that drifts
    * legitimately over months still flags a one-day spike.
    *
    * Buckets with fewer than 2 preceding observations carry flag 0 (no
    * baseline variance exists). Output per (event_type, bucket):
    * (event_type, bucket, x_c, n_w, sum_w, sumsq_w, dev_num, var_num,
    * is_anomaly 0/1). Int64 bound on the BIGINT columns: window·x̄²
    * under 9.2e18 (ANSI mode raises loudly past it — the linregStats
    * rescale-units contract).
    *
    * Scale shape: raw events collapse FIRST to the O(types·buckets)
    * daily table by one map-side-combined aggregation; the trailing
    * window partitions by event_type over that small table — raw events
    * never meet a window. */
  def rollingAnomaly(events: DataFrame, bucketUs: Long = 86400000000L,
                     window: Int = 7, zTimes10: Int = 30): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(window >= 2, s"window must be >= 2, got $window")
    require(zTimes10 >= 1, s"zTimes10 must be >= 1, got $zTimes10")
    val ev = events.select(col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    val daily = ev
      .withColumn("bucket",
        expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy("event_type", "bucket")
      .agg(sum("cents").as("x_c"))
    rollingAnomalyFromDaily(daily, "event_type", window, zTimes10)
  }

  /** The [[rollingAnomaly]] window/flag math over an already-bucketed
    * daily table (`<key>`, bucket, x_c) — shared verbatim by the batch
    * operator and the streaming
    * [[graft.streaming.EventStreaming.AnomalyMaintainer]], so the
    * incremental path is flag-for-flag the batch path by construction. */
  private[graft] def rollingAnomalyFromDaily(daily: DataFrame, key: String,
      window: Int, zTimes10: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(zTimes10 >= 1, s"zTimes10 must be >= 1, got $zTimes10")
    val w = Window.partitionBy(key).orderBy("bucket")
      .rowsBetween(-window.toLong, -1L)
    def dec(c: org.apache.spark.sql.Column) =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    daily
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("sum_w", sum("x_c").over(w))
      .withColumn("sumsq_w", sum(col("x_c") * col("x_c")).over(w))
      .withColumn("dev_num", col("n_w") * col("x_c") - col("sum_w"))
      .withColumn("var_num",
        col("n_w") * col("sumsq_w") - col("sum_w") * col("sum_w"))
      .withColumn("is_anomaly",
        when(col("n_w") >= 2 &&
          dec(col("dev_num")) * dec(col("dev_num")) *
            dec(col("n_w") - 1) * lit(100) >
          dec(lit(zTimes10.toLong * zTimes10)) * dec(col("var_num")) *
            dec(col("n_w")),
          lit(1L)).otherwise(lit(0L)))
      .orderBy(key, "bucket")
  }

  /** Funnel time-to-convert — for each consecutive stage pair of a
    * funnel, the latency distribution between a user's FIRST head-stage
    * event and their first tail-stage event at-or-after it: n converted
    * users, exact min / lower-median / max milliseconds ([[funnel]] says
    * how MANY convert; this says how FAST — the metric behind "checkout
    * friction" dashboards). Median is the exact lower median under the
    * [[gapStats]] rank convention — engine-replayable, no
    * approx_percentile. Users who never reach the head stage, or whose
    * tail events all precede it, are absent from that pair.
    *
    * Scale shape: ONE map-side-combined (user, stage) first-event
    * aggregation over the stage-filtered stream; tail events join it
    * keyed on (user, head-stage) — an equi-join against an
    * O(users·stages) table, never event × event — and collapse to one
    * latency per (pair, user). The stats pass is frequency-compressed
    * ([[gapStats]]): windows run over distinct (pair, latency) values
    * only. */
  def funnelLatency(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnelLatency needs at least two stages")
    require(stages.distinct.size == stages.size,
      s"duplicate stages in $stages")
    val headOf = stages.sliding(2).map { case Seq(a, b) => b -> a }.toMap
    val ev = events.select(col("user_id"), col("event_type"),
        tsMicros(events).as("tus"))
      .filter(col("event_type").isin(stages: _*))
    val firsts = ev.groupBy("user_id", "event_type")
      .agg(min("tus").as("ta"))
    val heads = firsts.select(col("user_id"),
      col("event_type").as("stage_from"), col("ta"))
    val tailMap = headOf.foldLeft(lit(null).cast(StringType)) {
      case (acc, (tail, head)) =>
        when(col("event_type") === tail, lit(head)).otherwise(acc)
    }
    val lat = ev
      .withColumn("stage_from", tailMap)
      .filter(col("stage_from").isNotNull)
      .join(heads, Seq("user_id", "stage_from"))
      .filter(col("tus") >= col("ta"))
      .groupBy(col("stage_from"), col("event_type").as("stage_to"),
        col("user_id"))
      .agg(min(expr("(tus - ta) div 1000")).as("lat_ms"))
    // frequency-compressed stats per stage pair (the gapStats scan)
    val cnts = lat.groupBy("stage_from", "stage_to", "lat_ms")
      .agg(count(lit(1)).as("cnt"))
    val pair = Window.partitionBy("stage_from", "stage_to")
    val w = pair.orderBy("lat_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cnts
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(pair))
      .withColumn("mn", min("lat_ms").over(pair))
      .withColumn("mx", max("lat_ms").over(pair))
      .filter(col("cum") - col("cnt") < expr("(n + 1) div 2") &&
        expr("(n + 1) div 2") <= col("cum"))
      .select(col("stage_from"), col("stage_to"), col("n").as("n_users"),
        col("mn").as("min_ms"), col("lat_ms").as("med_ms"),
        col("mx").as("max_ms"))
      .orderBy("stage_from", "stage_to")
  }

  /** Seasonal (phase) profile with exact residuals — for each event
    * type's bucketed series, the periodic baseline (per phase = bucket
    * mod `periodBuckets`, e.g. day-of-week for daily buckets and period
    * 7) and each bucket's deviation from ITS phase's mean as the exact
    * moment form resid_num = n_p·x − sum_p (n_p times the deviation; the
    * mean itself is the fraction sum_p / n_p). The weekly-shape
    * complement to [[rollingAnomaly]]: that flags spikes against the
    * RECENT past, this separates "it's Sunday" from "something broke" —
    * compare |resid| across buckets sharing a phase and the seasonal
    * confound is gone. Output per (event_type, bucket): (event_type,
    * bucket, phase, x_c, n_p, sum_p, resid_num), ordered.
    *
    * Scale shape: raw events collapse FIRST to the O(types·buckets)
    * table by one map-side-combined aggregation; the phase baseline is a
    * second aggregation to O(types·period) rows joined back
    * (broadcast-sized under AQE) — raw events never meet a window or a
    * join. */
  def seasonalProfile(events: DataFrame, bucketUs: Long = 86400000000L,
                      periodBuckets: Int = 7): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(periodBuckets >= 2,
      s"periodBuckets must be >= 2, got $periodBuckets")
    val ev = events.select(col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    val daily = ev
      .withColumn("bucket",
        expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy("event_type", "bucket")
      .agg(sum("cents").as("x_c"))
      .withColumn("phase", pmod(col("bucket"), lit(periodBuckets.toLong)))
    val base = daily.groupBy("event_type", "phase")
      .agg(count(lit(1)).as("n_p"), sum("x_c").as("sum_p"))
    daily.join(base, Seq("event_type", "phase"))
      .select(col("event_type"), col("bucket"), col("phase"), col("x_c"),
        col("n_p"), col("sum_p"),
        (col("n_p") * col("x_c") - col("sum_p")).as("resid_num"))
      .orderBy("event_type", "bucket")
  }

  /** Period-over-period deltas — the growth report: for each event
    * type's bucketed value series, the change versus the PREVIOUS bucket
    * (day-over-day) and versus the SAME PHASE one period earlier
    * (week-over-week for daily buckets and period 7 — the comparison
    * that doesn't lie about Mondays). Deltas are exact integers; a
    * missing comparison point leaves NULL (the honest "no prior week"),
    * and the phase comparison matches on bucket distance EXACTLY
    * `periodBuckets` (a gap in the series yields NULL rather than
    * silently comparing against an older week). Output per (event_type,
    * bucket): (event_type, bucket, x_c, prev_c, dod_delta, prev_period_c,
    * pop_delta), ordered.
    *
    * Scale shape: raw events collapse FIRST to the O(types·buckets)
    * table; the comparisons are two SHIFTED SELF-JOINS keyed on
    * (type, bucket) over that tiny table — gap-proof where a positional
    * `lag(period)` silently compares against an older week whenever the
    * series skips a bucket (join-vs-lag chosen for exactly that case). */
  def periodDeltas(events: DataFrame, bucketUs: Long = 86400000000L,
                   periodBuckets: Int = 7): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(periodBuckets >= 2,
      s"periodBuckets must be >= 2, got $periodBuckets")
    val ev = events.select(col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    // the daily table feeds THREE plan branches (base + two shifts) —
    // checkpoint once so the raw-event aggregation doesn't run 3×
    // (the Triangles cross-branch-CSE lesson; released by the caller's
    // Checkpoints.releaseAll cycle)
    val daily = graft.operators.Checkpoints.checkpoint(ev
      .withColumn("bucket",
        expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy("event_type", "bucket")
      .agg(sum("cents").as("x_c")))
    val prev = daily.select(col("event_type"),
      (col("bucket") + 1L).as("bucket"), col("x_c").as("prev_c"))
    val prevPeriod = daily.select(col("event_type"),
      (col("bucket") + periodBuckets.toLong).as("bucket"),
      col("x_c").as("prev_period_c"))
    daily
      .join(prev, Seq("event_type", "bucket"), "left")
      .join(prevPeriod, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"), col("x_c"), col("prev_c"),
        (col("x_c") - col("prev_c")).as("dod_delta"),
        col("prev_period_c"),
        (col("x_c") - col("prev_period_c")).as("pop_delta"))
      .orderBy("event_type", "bucket")
  }

  /** Autocorrelation lag statistics — for each event type's bucketed
    * value series, the exact sufficient statistics of Pearson r at every
    * lag 1..maxLag: over all pairs (x_t, x_{t−lag}) present in the
    * series, (n_pairs, sum_x, sum_y, sum_xy, sum_x2, sum_y2) — x the
    * later bucket, y the lagged one. Downstream divides once; the engine
    * ships only exact integers (the q117 linreg-stats contract). Pairs
    * form on bucket distance EXACTLY lag, so a gap in the series shrinks
    * n_pairs instead of silently pairing across it (the periodDeltas
    * join-vs-lag rule). Output: (event_type, lag, n_pairs, sum_x, sum_y,
    * sum_xy, sum_x2, sum_y2), ordered.
    *
    * Scale shape: raw events collapse FIRST to the O(types·buckets)
    * daily table (checkpointed once — it feeds both join sides); the
    * lag dimension is an explode ×maxLag of THAT table, never of raw
    * events, and the pairing is an equi-join on (type, bucket). Int64
    * exactness: |daily sum| is bounded at 3.03e9 cents (so each x²/xy
    * term stays exact) and the five sums accumulate as DECIMAL(38,0)
    * with a raise_error cast-back — the joinProfile discipline: the
    * operator raises only when the OUTPUT genuinely leaves Int64, not
    * at a conservative per-value cap; a hotter series should be
    * re-centered/scaled first, the linregStats contract. */
  def lagStats(events: DataFrame, bucketUs: Long = 86400000000L,
               maxLag: Int = 7): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(maxLag >= 1 && maxLag <= 64, s"maxLag must be in [1,64], got $maxLag")
    val ev = events.select(col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    val daily = graft.operators.Checkpoints.checkpoint(ev
      .withColumn("bucket",
        expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy("event_type", "bucket")
      .agg(sum("cents").as("x_c"))
      // past |x| = 3.03e9 a single x² term leaves Int64 — fail loudly
      .withColumn("x_c", when(abs(col("x_c")) <= 3037000499L, col("x_c"))
        .otherwise(raise_error(format_string(
          "lagStats: |daily sum| %s overflows the Int64 x-squared bound",
          col("x_c"))))))
    val lagged = daily.select(col("event_type"),
        explode(expr(s"sequence(1L, ${maxLag.toLong}L)")).as("lag"),
        col("bucket"), col("x_c").as("y_c"))
      .select(col("event_type"), col("lag"),
        (col("bucket") + col("lag")).as("bucket"), col("y_c"))
    // sums run in DECIMAL(38,0) and raise on the cast back iff the
    // result itself leaves Int64 (exact, never a conservative cap)
    def dsum(e: String, name: String) = {
      val s = sum(expr(s"CAST($e AS DECIMAL(38,0))"))
      when(abs(s) <= lit(Long.MaxValue), s.cast(LongType))
        .otherwise(raise_error(lit(
          s"lagStats: $name overflows Int64 — re-center/scale the series")))
        .as(name)
    }
    daily.join(lagged, Seq("event_type", "bucket"))
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        dsum("x_c", "sum_x"), dsum("y_c", "sum_y"),
        dsum("CAST(x_c AS DECIMAL(38,0)) * y_c", "sum_xy"),
        dsum("CAST(x_c AS DECIMAL(38,0)) * x_c", "sum_x2"),
        dsum("CAST(y_c AS DECIMAL(38,0)) * y_c", "sum_y2"))
      .orderBy("event_type", "lag")
  }

  /** Trailing rolling MEDIAN of each type's bucketed value series — the
    * robust center a rolling mean gets wrong under spikes (and what the
    * rollingAnomaly z-score can't give). Exact: for each OBSERVED bucket,
    * the lower median (0-indexed rank ⌊(n−1)/2⌋, the library's
    * deterministic rank convention) over the ≤ `window` observed buckets
    * in [bucket − window + 1, bucket]; a gap contributes nothing (n_days
    * shrinks — the honest form, never zero-filled silently). Output:
    * (event_type, bucket, n_days, med_c), ordered.
    *
    * Scale shape: raw events collapse FIRST to the O(types·buckets)
    * daily table (checkpointed once — it feeds the contribution AND the
    * observed-end branch); each daily row explodes to the ≤ `window`
    * window-ends it serves, the pairing is an equi-join on (type, end),
    * and the per-end sorted list is bounded at `window` elements — never
    * a partitionless window, never raw events in the exchange. */
  def rollingMedian(events: DataFrame, bucketUs: Long = 86400000000L,
                    window: Int = 7): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(window >= 1 && window <= 64,
      s"window must be in [1,64], got $window")
    val ev = events.select(col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    val daily = graft.operators.Checkpoints.checkpoint(ev
      .withColumn("bucket",
        expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy("event_type", "bucket")
      .agg(sum("cents").as("x_c")))
    val contrib = daily.select(col("event_type"),
      explode(expr(s"sequence(bucket, bucket + ${(window - 1).toLong}L)"))
        .as("end"), col("x_c"))
    contrib
      .join(daily.select(col("event_type"), col("bucket").as("end")),
        Seq("event_type", "end"))
      .groupBy(col("event_type"), col("end").as("bucket"))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(col("x_c"))).as("xs"))
      .select(col("event_type"), col("bucket"), col("n_days"),
        expr("element_at(xs, CAST((n_days - 1) div 2 AS INT) + 1)")
          .as("med_c"))
      .orderBy("event_type", "bucket")
  }

  /** Holt double-exponential smoothing (level + trend) of each type's
    * bucketed value series — the one-step forecaster EWMA can't be when
    * the series trends (a pure EWMA lags a ramp forever). Exact Int64
    * fixed-point over cents with rational α = alphaNum/alphaDen and
    * β = betaNum/betaDen:
    *   l_t = ⌊(αN·x_t + (αD−αN)·(l_{t−1}+b_{t−1})) / αD⌋
    *   b_t = ⌊(βN·(l_t−l_{t−1}) + (βD−βN)·b_{t−1}) / βD⌋
    * with l_1 = x_1, b_1 = 0. Division is FLOOR division spelled out as
    * (e − pmod(e, d)) div d — the trend goes negative on declines, where
    * truncating `div` and flooring `//` diverge; making the numerator an
    * exact multiple first means every engine computes the same quotient.
    * The fold is non-associative, so it runs as a codegen aggregate()
    * lambda over the per-type sorted series capped at the LAST `lastN`
    * buckets (the ewma contract: per-type state is a bounded array, and
    * a capped restart re-converges geometrically anyway). Output:
    * (event_type, n_obs, level_c, trend_c, forecast_c) with forecast =
    * level + trend (the one-step-ahead), ordered by type. */
  def holtSmooth(events: DataFrame, alphaNum: Long, alphaDen: Long,
                 betaNum: Long, betaDen: Long,
                 bucketUs: Long = 86400000000L, lastN: Int = 64): DataFrame = {
    require(alphaDen >= 1 && alphaNum >= 1 && alphaNum <= alphaDen,
      s"need 0 < alphaNum <= alphaDen, got $alphaNum/$alphaDen")
    require(betaDen >= 1 && betaNum >= 1 && betaNum <= betaDen,
      s"need 0 < betaNum <= betaDen, got $betaNum/$betaDen")
    require(bucketUs > 0, "bucketUs must be positive")
    require(lastN >= 1 && lastN <= 4096, s"lastN must be in [1,4096], got $lastN")
    def fdiv(e: String, d: Long) = s"(($e) - pmod(($e), ${d}L)) div ${d}L"
    val ev = events.select(col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    val daily = ev
      .withColumn("bucket",
        expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy("event_type", "bucket")
      .agg(sum("cents").as("x_c"))
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("bucket").desc)))
      .filter(col("rn") <= lastN)
    val aN = alphaNum; val a1 = alphaDen - alphaNum
    val bN = betaNum; val b1 = betaDen - betaNum
    val newL = fdiv(s"$aN * s.x_c + $a1 * (acc.l + acc.b)", alphaDen)
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_obs"),
        sort_array(collect_list(struct(col("bucket"), col("x_c")))).as("xs"))
      .select(col("event_type"), col("n_obs"),
        expr(s"""aggregate(
          slice(xs, 2, size(xs) - 1),
          struct(CAST(xs[0].x_c AS BIGINT) AS l, CAST(0 AS BIGINT) AS b),
          (acc, s) -> struct(
            CAST($newL AS BIGINT) AS l,
            CAST(${fdiv(s"$bN * (($newL) - acc.l) + $b1 * acc.b", betaDen)}
              AS BIGINT) AS b)
        )""").as("st"))
      .select(col("event_type"), col("n_obs"),
        col("st.l").as("level_c"), col("st.b").as("trend_c"),
        (col("st.l") + col("st.b")).as("forecast_c"))
      .orderBy("event_type")
  }

  /** SCD2 point-in-time lookup — enrich timestamped facts with the
    * dimension version valid AT each fact's time: the query every SCD2
    * table exists to answer ("what plan was this user on when they
    * clicked"). Because versions TILE per key (valid_from of version
    * k+1 = valid_to of version k, last one open), containment lookup is
    * exactly a BACKWARD AS-OF on valid_from — one union-merge shuffle
    * ([[AsOf.backward]]), never an interval cross join. Facts before the
    * key's first version get NULL state (the honest "no version yet").
    * `dim` must be [[scd2]]-shaped: (key, state, valid_from_us,
    * valid_to_us); facts need (key, timeCol) with timeCol unique per key
    * (dedupe first — it doubles as the as-of tiebreak). Output: facts'
    * (key, timeCol) plus (state, valid_to_us), ordered. */
  def scd2Lookup(dim: DataFrame, facts: DataFrame, keyCol: String,
                 timeCol: String): DataFrame = {
    val d = dim.select(col(keyCol), col("valid_from_us").as(timeCol),
      col("state"), col("valid_to_us"))
    AsOf.backward(facts.select(col(keyCol), col(timeCol)), d, Seq(keyCol),
        timeCol, leftTie = timeCol, rightTie = timeCol,
        payloadCols = Seq("state", "valid_to_us"))
      .select(col(keyCol), col(timeCol), col("asof.state").as("state"),
        col("asof.valid_to_us").as("valid_to_us"))
      .orderBy(keyCol, timeCol)
  }

  /** Dense bucket spine with zero-fill — each type's value series with
    * EVERY bucket between its first and last present, absent ones as 0:
    * the report shape where a missing week must show as zero, not
    * disappear (the complement of [[resample]]'s forward-fill). The
    * spine explodes from the per-type (min, max) AGGREGATE — O(types)
    * rows fan out to O(types·span), never raw events; a span wider than
    * `maxBuckets` raises (the guarded-explode rule). Output:
    * (event_type, bucket, x_c), dense, ordered. */
  def denseSeries(events: DataFrame, bucketUs: Long = 86400000000L,
                  maxBuckets: Long = 1L << 20): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(maxBuckets >= 1, "maxBuckets must be >= 1")
    val ev = events.select(col("event_type"), tsMicros(events).as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    val daily = graft.operators.Checkpoints.checkpoint(ev
      .withColumn("bucket",
        expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy("event_type", "bucket")
      .agg(sum("cents").as("x_c")))
    val spine = daily.groupBy("event_type")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .withColumn("b1", when(col("b1") - col("b0") < maxBuckets, col("b1"))
        .otherwise(raise_error(format_string(
          s"denseSeries: span [%s, %s] exceeds maxBuckets=$maxBuckets",
          col("b0"), col("b1")))))
      .select(col("event_type"),
        explode(expr("sequence(b0, b1)")).as("bucket"))
    spine.join(daily, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("x_c"), lit(0L)).as("x_c"))
      .orderBy("event_type", "bucket")
  }

  /** Sliding velocity check — burst detection: for each user, the peak
    * number of events inside ANY trailing `windowUs` window and how many
    * events sat in a window of ≥ `minBurst`; only users reaching
    * `minBurst` are reported (the fraud/abuse "too fast to be human"
    * primitive). ONE user-partitioned window with a RANGE frame on the
    * timestamp — the time-window count without self-joins or explodes;
    * equal timestamps all see each other (RANGE semantics, order-proof).
    * Output: (user_id, peak_burst, n_burst_events), ordered. */
  def velocity(events: DataFrame, windowUs: Long, minBurst: Long): DataFrame = {
    require(windowUs >= 1, "windowUs must be positive")
    require(minBurst >= 1, "minBurst must be >= 1")
    val w = Window.partitionBy("user_id").orderBy("tus")
      .rangeBetween(-(windowUs - 1), 0)
    events.select(col("user_id"), tsMicros(events).as("tus"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(max("burst").as("peak_burst"),
        sum(when(col("burst") >= minBurst, 1L).otherwise(0L))
          .as("n_burst_events"))
      .filter(col("peak_burst") >= minBurst)
      .orderBy("user_id")
  }

  /** Cumulative-unique-users curve — per bucket with ≥ 1 first-time
    * user: how many users are NEW that bucket and how many DISTINCT
    * users have been seen up to and including it (the audience-growth
    * chart). The distinct-count never runs over raw events: a user's
    * contribution collapses to their FIRST bucket (O(users) exchange),
    * new-user counts collapse to O(buckets), and the running total is a
    * [[graft.operators.PrefixSum]] two-pass scan — never a partitionless
    * window. Output: (bucket, new_users, cum_users), ordered. */
  def cumulativeUsers(events: DataFrame,
                      bucketUs: Long = 86400000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val first = events.select(col("user_id"), tsMicros(events).as("tus"))
      .withColumn("bucket",
        expr(s"(tus - pmod(tus, ${bucketUs}L)) div ${bucketUs}L"))
      .groupBy("user_id").agg(min("bucket").as("bucket"))
    val daily = first.groupBy("bucket").agg(count(lit(1)).as("new_users"))
    graft.operators.PrefixSum
      .exclusive(daily, "new_users", "__below", -1, col("bucket"))
      .select(col("bucket"), col("new_users"),
        (col("__below") + col("new_users")).as("cum_users"))
      .orderBy("bucket")
  }

  def retention(events: DataFrame, bucketUs: Long = 604800000000L): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val ev = events.select(col("user_id"), tsMicros(events).as("tus"))
      .withColumn("wk", expr(s"CAST(tus div $bucketUs AS BIGINT)"))
      .select("user_id", "wk")
    val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
    ev.join(cohort, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }
}
