package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed event-time analytics over the native `events` fixture
  * table (TESTDATA.md) — the same operator shapes as the taxi
  * pipeline (SURVEY.md §2.1 rows K1/W1/A1/F4: key × tumbling
  * event-time window → COUNT/SUM/AVG → HAVING), exercised on a real
  * parquet event stream rather than the synthetic trip derivation.
  */
object EventsQueries {

  /** events.parquet with `ts` exposed as both ms-epoch long and
    * ms-precision timestamp, whatever the on-disk representation:
    * TIMESTAMP(MICROS/MILLIS) reads as a timestamp type, and a
    * TIMESTAMP(NANOS) file read under
    * `spark.sql.legacy.parquet.nanosAsLong=true` arrives as a LONG of
    * nanoseconds (the driver has shipped both across rounds — the
    * loader adapts instead of pinning one generation's layout). Scan
    * prunes to the referenced columns only.
    *
    * The DuckDB oracle side is representation-stable by the same
    * token: `epoch_ns(ts)` yields identical nanos for every variant.
    * Sessions pin timeZone=UTC, so the NTZ→epoch cast below matches
    * the oracle's naive-as-UTC reading. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    withTsMs(spark.read.parquet(s"$sfDir/events.parquet"))

  /** Adds ts_ms (epoch millis, LONG) + event_time (ms-precision
    * timestamp) to a frame whose `ts` is either a nanos LONG or a
    * timestamp type — shared by [[events]] and the scale probes. */
  def withTsMs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val tsMs = raw.schema("ts").dataType match {
      // integer DIV, not `/`: nano values (~1.7e18) lose precision in
      // a double division
      case LongType => expr("ts DIV 1000000")
      case _ => unix_millis(col("ts").cast(TimestampType))
    }
    raw
      .withColumn("ts_ms", tsMs)
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
  }

  /** Per event-type × 1-hour SLIDING window with a 15-minute hop
    * (SURVEY.md §2.4 lists sliding windows absent in the reference):
    * each event contributes to size/slide = 4 overlapping windows.
    * Same output contract as the tumbling queries (timestamp =
    * window end − 1 ms). */
  def slidingTypeStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        window(col("event_time"), "1 hour", "15 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(
        col("event_type"),
        col("n_events"),
        col("sum_value"),
        (unix_millis(col("window.end")) - 1).as("timestamp"))

  /** Sequence-pattern constants of the graded funnel (q64). */
  val SequenceWindowMs = 3600000L

  /** Cohort bucket width (q65) — interpolated into the oracle SQL so
    * the two engines cannot diverge. */
  val CohortWeekMs: Long = 7L * 86400000L

  /** CEP-style sequence detection (q64): per user, which `click`
    * events are followed by a `purchase` within the window — the
    * "A then B within T" pattern a Flink-CEP user would write, as a
    * single partitioned window pass.
    *
    * Shape: traverse each user's events in DESCENDING time order
    * keeping a running MIN of purchase timestamps — at any row that
    * min IS the next purchase at-or-after the row. Equal-timestamp
    * ties order purchases before clicks in the traversal so a
    * same-millisecond purchase deterministically counts as a hit in
    * both engines.
    *
    * Scale design: one window partitioned by user_id (no global
    * ordering), one aggregation on the same key — two co-partitioned
    * exchanges, versus the quadratic-per-user time-range self-join
    * the pattern naively suggests (the oracle runs exactly that
    * EXISTS formulation). */
  def clickToPurchase(events: DataFrame,
      windowMs: Long = SequenceWindowMs): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").desc,
        when(col("event_type") === "purchase", 0).otherwise(1).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      // only the two pattern types can affect the result; dropping
      // the rest before the window cuts its shuffle + sort volume
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts_ms"))
      .withColumn("next_purchase_ts",
        min(when(col("event_type") === "purchase", col("ts_ms"))).over(w))
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(when(col("next_purchase_ts") >= col("ts_ms") &&
          col("next_purchase_ts") - col("ts_ms") <= windowMs, 1L)
          .otherwise(0L)).as("n_converted"))
  }

  /** Cohort retention (q65): users grouped by signup week, counted
    * as active in each subsequent week they produced any event — the
    * retention-matrix query behind every product dashboard. Weeks are
    * integer epoch-week buckets (ts_ms DIV week-ms) end to end.
    *
    * Scale design: the signup-week reduction, the distinct
    * (user, week) activity set, and the cohort join all key on
    * user_id (co-partitioned, no re-shuffle between them); the final
    * matrix aggregation keys on the tiny (cohort_week, offset) pair
    * with a distinct-user count whose Expand shuffles at most the
    * activity set — never the raw events. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weeks = events.select(col("user_id"), col("event_type"),
      expr(s"ts_ms DIV $CohortWeekMs").as("week"))
    val cohorts = weeks.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val active = weeks.select(col("user_id"), col("week")).distinct()
    cohorts.join(active, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since_signup"))
      .filter(col("weeks_since_signup") >= 0)
      .groupBy(col("cohort_week"), col("weeks_since_signup"))
      .agg(countDistinct(col("user_id")).as("n_active_users"))
  }

  /** Inter-arrival gaps (q66): per user, the time deltas between
    * consecutive events (lag over the user's event-time order,
    * event_id as the deterministic tiebreaker) reduced to exact
    * count/min/max/sum — the activity-cadence profile behind
    * session-gap tuning and bot detection. One partitioned window +
    * one same-key aggregation; integers end to end. */
  def interArrivalStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"), col("ts_ms"))
      .withColumn("gap", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap_ms"),
        max(col("gap")).as("max_gap_ms"),
        sum(col("gap")).as("sum_gap_ms"))
  }

  /** Step window for the multi-step funnel (q74): each stage must
    * follow the previous within a week. */
  val FunnelStepMs: Long = 7L * 24 * 3600000

  /** Multi-step funnel (q74): the earliest-completion
    * signup → click → purchase chain per user — first signup, then
    * the first click at-or-after it within [[FunnelStepMs]], then the
    * first purchase at-or-after THAT click within the window (the
    * product-analytics funnel with greedy, deterministic step
    * anchoring). Emits each user's step timestamps (null where the
    * funnel stalled) and a completed flag.
    *
    * Scale design: every stage keys on user_id — the three
    * conditional-min aggregations and both stitching left joins all
    * hash on the same key, so after the first exchange the stages
    * reuse the partitioning; no window over unbounded partitions, no
    * cross-step explosion (each stage carries ONE row per user). */
  def funnelSteps(events: DataFrame,
      stepMs: Long = FunnelStepMs): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("ts_ms"))
    val s = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("signup_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(s, "user_id")
      .filter(col("ts_ms") >= col("signup_ts") &&
        col("ts_ms") - col("signup_ts") <= stepMs)
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts_ms") >= col("click_ts") &&
        col("ts_ms") - col("click_ts") <= stepMs)
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("purchase_ts"))
    s.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_ts"), col("click_ts"),
        col("purchase_ts"),
        col("purchase_ts").isNotNull.as("completed"))
  }

  /** Trailing-hour RANGE frame (q71): for EVERY event, how many
    * events and how much value the same user produced in the hour
    * ending at it — the time-based window frame (RANGE BETWEEN n
    * PRECEDING), complementing q39's row-count frames: a RANGE frame
    * spans a fixed time span regardless of event density, and ties on
    * ts_ms are all included in each other's frames (order within the
    * tie cannot matter — deterministic by construction, no tiebreak
    * column needed). One partitioned window pass, no global order. */
  def trailingHourStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(-3600000L, 0L)
    events
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(col("value")).over(w))
      .drop("value")
  }

  /** Per event-type × 1-hour tumbling window: count, sum and average
    * of `value`, windows with fewer than 2 events suppressed;
    * timestamp = window end − 1 ms (the reference's
    * `TimeWindow.maxTimestamp` idiom, ProcessTaxiStream.java:104). */
  def hourlyTypeStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("event_time"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))
      .filter(col("n_events") >= 2)
      .select(
        col("event_type"),
        col("n_events"),
        col("sum_value"),
        col("avg_value"),
        (unix_millis(col("window.end")) - 1).as("timestamp"))

  /** SCD Type-2 dimension build (q134) — the warehouse
    * table-maintenance operator: from the raw event stream, the
    * slowly-changing attribute history of each user as validity
    * intervals. The tracked attribute is the `props.k`-derived tier
    * (k mod 4 — the fixture stand-in for plan/segment); consecutive
    * equal observations collapse into one dimension row
    * `[valid_from, valid_to)`, each change closes the prior row
    * (valid_to = successor's valid_from), the open row carries
    * `is_current`. This is the type-2 MERGE every dimensional
    * pipeline runs on CDC/event feeds, stated as one declarative
    * plan (q120's snapshot diff is the table-level sibling).
    *
    * Scale design (100 TB): gaps-and-islands entirely under
    * user-keyed windows — change flag (null-safe lag compare over the
    * (ts_ms, event_id) total order), running-sum run ids, one
    * map-side-combinable (user, run) aggregation, then the lead()
    * close-out runs on the RUNS frame (dimension-sized, not
    * event-sized). No global window, no self-join; every exchange is
    * hash(user_id) or hash(user_id, run_id). AQE splits a hot user's
    * sort spill; the attribute projection is row-local JSON-path
    * extraction (q35 discipline). */
  /** χ²(1) critical value at α = 0.05 — ONE literal shared with the
    * oracle so both engines compare against the identical double. */
  val ChiSqCrit = 3.841458820694124

  /** Two-proportion χ² conversion test (q145) — the proportions
    * sibling of [[cupedLift]]'s means readout: users split by the
    * same Knuth-hash parity arms, converted = produced any purchase
    * event; the 2×2 observed-vs-expected χ² statistic with the
    * α = 0.05 verdict. All observed counts are exact BIGINTs; the
    * expected cells and the four (O−E)²/E terms are ONE fixed-order
    * double expression over those integers — bit-identical in the
    * mirror, no rounding step.
    *
    * Scale design (100 TB): one map-side-combined per-user
    * reduction, then a single constant-size aggregation to the four
    * cells — the statistic itself is a row-local projection of one
    * row. */
  /** Benford first-digit audit screen (q159) — the classic
    * fabricated-numbers detector (accounting forensics, sensor
    * sanity): first significant digit of the cent amounts vs the
    * Benford expectation P(d) = log₁₀(1 + 1/d), with the χ²
    * goodness-of-fit accumulating across digits (the fixture's
    * synthetic uniform-ish values FAIL Benford — which is the
    * point: the screen flags non-scale-invariant generators, and
    * the spec pins a genuinely Benford-distributed hand sample
    * PASSING). First digit via string arithmetic on the exact cents
    * integer (no log10 FP edge cases); expected fractions are
    * Scala-computed literals CAST to DOUBLE in the mirror; terms
    * and the cumulative follow the q150 sequential-window
    * discipline.
    *
    * Scale design: one map-side-combined digit aggregation (9 rows
    * out); everything after is on the digit frame. */
  def benfordScreen(events: DataFrame): DataFrame = {
    val expected = (1 to 9)
      .map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
    val digits = events
      .select(round(col("value") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val run = Window.orderBy(col("digit"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expCol = (2 to 9).foldLeft(
      when(col("digit") === 1, lit(expected(1)))) {
      (acc, d) => acc.when(col("digit") === d, lit(expected(d)))
    }
    digits
      .withColumn("total", sum(col("n")).over(all))
      .withColumn("expected_frac", expCol)
      .withColumn("observed_frac",
        col("n").cast("double") / col("total"))
      .withColumn("term",
        (col("n") - col("expected_frac") * col("total")) *
          (col("n") - col("expected_frac") * col("total")) /
          (col("expected_frac") * col("total")))
      .select(col("digit"), col("n"), col("observed_frac"),
        col("expected_frac"), col("term"),
        sum(col("term")).over(run).as("cum_chi2"))
  }

  /** Declared event-type list of [[dailyMixEntropy]] (q168) — an
    * explicit closed set (the q37 pivot discipline: no discovery
    * pass, deterministic schema AND a deterministic term order for
    * the entropy sum). */
  val MixTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** Daily event-mix Shannon entropy (q168) — the mix-shift monitor
    * (a day whose traffic collapses into one type is an incident
    * even when total volume looks normal; the complement of q150's
    * volume watch): per day H = −Σ pᵢ·ln pᵢ over the declared
    * [[MixTypes]] and evenness = H / ln(5). A data-dependent Σ over
    * type rows would sum doubles in partition order — instead the
    * per-type counts are conditional aggregates and H is ONE
    * explicit left-to-right sum over the declared list (fixed term
    * order, zero-count terms exactly 0) — bit-identical, no
    * rounding.
    *
    * Scale design: one map-side-combined daily aggregation;
    * everything after is row-local on the day frame. */
  def dailyMixEntropy(events: DataFrame): DataFrame = {
    val counts = MixTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L))
        .as(s"c_$t"))
    val daily = events
      .groupBy(expr("ts_ms DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n"), counts: _*)
    def term(t: String): Column = {
      val p = col(s"c_$t").cast("double") / col("n")
      when(col(s"c_$t") > 0, -(p * log(p))).otherwise(lit(0.0))
    }
    val h = MixTypes.map(term).reduce(_ + _)
    daily.select(
        (col("day") +: col("n") +:
          MixTypes.map(t => col(s"c_$t"))): _*)
      .withColumn("h_nats", h)
      .withColumn("evenness",
        col("h_nats") / math.log(MixTypes.size))
  }

  /** Cohort LTV table (q167) — the companion to q65's retention
    * matrix and the number the retention curve is FOR: per signup
    * cohort (epoch week) and week offset, the cumulative purchase
    * revenue per cohort member — the lifetime-value trajectory that
    * prices acquisition. Revenue exact in cents; the LTV is
    * cum_cents / cohort_size / 100.0 in a fixed operand order, with
    * the cumulative a row-sequential window over each cohort's
    * offsets (q150 discipline) — bit-identical, no rounding.
    *
    * Scale design (100 TB): cohort assignment and revenue bucketing
    * are user-keyed (co-partitioned join, the q65 shape); the
    * (cohort, offset) aggregation is map-side-combined onto a
    * weeks²-bounded key space; windows run over that bounded
    * frame. */
  def cohortLtv(events: DataFrame): DataFrame = {
    val weeks = events.select(col("user_id"), col("event_type"),
      expr(s"ts_ms DIV $CohortWeekMs").as("week"),
      round(col("value") * 100).cast("long").as("cents"))
    val cohorts = weeks.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val rev = weeks.filter(col("event_type") === "purchase")
      .join(cohorts, "user_id")
      .select(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"),
        col("cents"))
      .filter(col("week_offset") >= 0)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("week_cents"))
    val run = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(broadcast(sizes), "cohort_week")
      .withColumn("cum_cents", sum(col("week_cents")).over(run))
      .select(col("cohort_week"), col("week_offset"),
        col("cohort_size"), col("n_purchases"), col("week_cents"),
        (col("cum_cents").cast("double") / col("cohort_size") / 100.0)
          .as("ltv_per_user"))
  }

  /** Gini coefficient + Lorenz deciles of purchaser revenue (q166)
    * — the concentration profile behind "whales vs long tail"
    * decisions (and the inequality statistic every marketplace
    * report carries): purchasers ranked by exact-cents revenue,
    * decile rows carry each decile's share and the cumulative
    * Lorenz point, and G = 2·Σi·xᵢ/(n·S) − (n+1)/n rides along from
    * exact integer sums (Σi·x, S, n are order-independent BIGINTs;
    * G and the shares are fixed-order doubles — bit-identical, no
    * rounding).
    *
    * Scale design: one map-side-combined per-user revenue
    * reduction; the rank window runs over the PURCHASER frame
    * (dimension-sized, q14 discipline — the q57 prefix-sum index is
    * the swap-in if purchasers rival facts); deciles aggregate to
    * 10 rows. */
  def giniLorenz(events: DataFrame): DataFrame = {
    val rev = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val rank = Window.orderBy(col("cents"), col("user_id"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ranked = rev
      .withColumn("i", row_number().over(rank).cast("long"))
      .withColumn("n", max(col("i")).over(all))
      .withColumn("s", sum(col("cents")).over(all))
      .withColumn("ix", col("i") * col("cents"))
      .withColumn("decile", expr("((i - 1) * 10) DIV n") + 1)
    val dec = ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("dc"),
        max(col("n")).as("n"), max(col("s")).as("s"),
        sum(col("ix")).as("six"))
    val run = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("six_all", sum(col("six")).over(all))
      .withColumn("cum", sum(col("dc")).over(run))
      .select(col("decile"), col("n_users"),
        (col("dc").cast("double") / col("s")).as("decile_share"),
        (col("cum").cast("double") / col("s")).as("cum_share"),
        ((lit(2.0) * col("six_all").cast("double")) /
          (col("n") * col("s")).cast("double") -
          (col("n") + 1).cast("double") / col("n")).as("gini"))
  }

  /** Kolmogorov–Smirnov two-sample test (q165) — the SHAPE
    * comparison completing the nonparametric pair with q164
    * (Mann–Whitney detects location shift; KS detects ANY
    * distributional difference — variance, tails, bimodality):
    * D = max |F̂ₐ − F̂ᵦ| over the pooled support, significance at the
    * asymptotic 95% line c·√((nₐ+nᵦ)/(nₐ·nᵦ)), c = 1.358.
    *
    * Determinism: the ECDFs are exact-integer prefix counts over
    * the DISTINCT-VALUE frame (cents-bounded, the q164 discipline);
    * |F̂ₐ−F̂ᵦ| per value is computed from cross-multiplied INTEGERS
    * (|cumA·nᵦ − cumB·nₐ|, compared as integers — the max needs NO
    * floating point at all), and D is one exact-int ratio at the
    * end.
    *
    * Scale design: one map-side-combined value reduction, prefix
    * windows + max over the bounded frame, single-row output. */
  /** KS 95% asymptotic coefficient — one shared literal. */
  val KsC95 = 1.3581015157406195

  def ksTest(events: DataFrame): DataFrame = {
    val obs = events.select(
      (Sampling.mixed("user_id") % 2).as("arm"),
      round(col("value") * 100).cast("long").as("cents"))
    val byV = obs.groupBy(col("cents"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
    val run = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val top = byV
      .withColumn("cumA", sum(col("ca")).over(run))
      .withColumn("cumB", sum(col("cb")).over(run))
      .withColumn("na", sum(col("ca")).over(all))
      .withColumn("nb", sum(col("cb")).over(all))
      // cross-multiplied integer ECDF gap: the max needs no FP
      .withColumn("gap",
        abs(col("cumA") * col("nb") - col("cumB") * col("na")))
      .agg(max(col("gap")).as("max_gap"), max(col("na")).as("na"),
        max(col("nb")).as("nb"))
    top.select(col("na"), col("nb"),
        (col("max_gap").cast("double") /
          (col("na") * col("nb"))).as("d"),
        (lit(KsC95) * sqrt((col("na") + col("nb")).cast("double") /
          (col("na") * col("nb")))).as("crit"))
      .withColumn("significant", col("d") > col("crit"))
  }

  /** Mann–Whitney rank-sum A/B test (q164) — the NONPARAMETRIC
    * distribution comparison (q138 compares means, q145 proportions;
    * this compares whole value distributions with no normality
    * assumption — the robust default when revenue-like values are
    * heavy-tailed): arms by the q138 hash parity, U from
    * tie-averaged ranks, normal approximation with the tie-corrected
    * variance, verdict at the shared [[WilsonZ]] line.
    *
    * Determinism — the DOUBLED-RANK trick: ties make average ranks
    * half-integers, so all rank arithmetic runs in 2× units where
    * EVERYTHING is an exact BIGINT (2·avgrank = 2·below + t + 1;
    * R2 = Σ tₐ·(2·below + t + 1)) — order-independent sums, then
    * U/μ/σ/z are fixed-order doubles over exact integers.
    *
    * Scale design (100 TB): observations reduce to the DISTINCT-
    * VALUE frame (cents-bounded — ≤ 18,523 rows whatever the event
    * count) in one map-side-combined pass; the prefix-count window
    * and everything after run on that bounded frame. */
  def mannWhitney(events: DataFrame): DataFrame = {
    val obs = events.select(
      (Sampling.mixed("user_id") % 2).as("arm"),
      round(col("value") * 100).cast("long").as("cents"))
    val byV = obs.groupBy(col("cents"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ta"))
    val below = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = byV
      .withColumn("below", coalesce(sum(col("t")).over(below),
        lit(0L)))
      .agg(sum(col("ta")).as("na"), sum(col("t")).as("n"),
        sum(col("ta") * (lit(2L) * col("below") + col("t") + 1))
          .as("r2a"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    def d(c: Column) = c.cast("double")
    agg.select(col("na"), (col("n") - col("na")).as("nb"), col("n"),
        col("r2a"), col("ties"))
      .select(col("na"), col("nb"),
        ((d(col("r2a")) - d(col("na") * (col("na") + 1))) / 2.0)
          .as("u_a"),
        (d(col("na")) * col("nb") / 2.0).as("mu_u"),
        sqrt(d(col("na")) * col("nb") / 12.0 *
          (d(col("n") + 1) -
            d(col("ties")) / (d(col("n")) * (col("n") - 1))))
          .as("sigma_u"))
      .select(col("na"), col("nb"), col("u_a"), col("mu_u"),
        col("sigma_u"),
        // all-tied data gives sigma 0 (the tie correction removes
        // the whole variance): define z = 0 there — no evidence
        // either way, and the guard IS the ANSI divide-by-zero fix
        when(col("sigma_u") > 0.0,
          (col("u_a") - col("mu_u")) / col("sigma_u"))
          .otherwise(lit(0.0)).as("z"))
      .withColumn("significant", abs(col("z")) > WilsonZ)
  }

  /** Wilson z of [[conversionWilson]] (q163) — 95%, one shared
    * literal. */
  val WilsonZ = 1.959963984540054

  /** Wilson score intervals for daily conversion shares (q163) —
    * the proportion CI that behaves at small n and extreme p where
    * the naive Wald interval collapses (p̂ ± z√(p̂q̂/n) is the
    * textbook error this operator exists to replace; Wald is also
    * emitted for the comparison): per day, the share of events that
    * are purchases with
    * center = (p̂ + z²/2n) / (1 + z²/n) and half-width
    * z·√(p̂q̂/n + z²/4n²) / (1 + z²/n). Counts exact; the interval
    * is one fixed-order double expression per row — bit-identical,
    * no rounding.
    *
    * Scale design: one map-side-combined aggregation to the DAY
    * frame; everything after is row-local. */
  def conversionWilson(events: DataFrame): DataFrame = {
    // the share under test: purchases among each DAY's events (the
    // daily-conversion dashboard row)
    val daily = events
      .groupBy(expr("ts_ms DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("k"))
    val z = lit(WilsonZ)
    val zz = z * z
    daily
      .withColumn("p_hat", col("k").cast("double") / col("n"))
      .withColumn("center",
        (col("p_hat") + zz / (lit(2.0) * col("n"))) /
          (lit(1.0) + zz / col("n")))
      .withColumn("half",
        z * sqrt(col("p_hat") * (lit(1.0) - col("p_hat")) / col("n") +
          zz / (lit(4.0) * col("n") * col("n"))) /
          (lit(1.0) + zz / col("n")))
      .select(col("day"), col("n"), col("k"), col("p_hat"),
        (col("center") - col("half")).as("wilson_lo"),
        (col("center") + col("half")).as("wilson_hi"),
        (col("p_hat") - z * sqrt(col("p_hat") *
          (lit(1.0) - col("p_hat")) / col("n"))).as("wald_lo"),
        (col("p_hat") + z * sqrt(col("p_hat") *
          (lit(1.0) - col("p_hat")) / col("n"))).as("wald_hi"))
  }

  /** Point-in-time dimension join (q161) — the feature-store
    * staple: enrich every event with the SCD2 dimension row VALID AT
    * its timestamp (training-serving skew is exactly what happens
    * when this is done with a plain latest-value join). No interval
    * join, no per-event range probe: the scalable PIT form is the
    * union-sort trick — dimension validity STARTS and probe events
    * interleave in one user-keyed ordered stream, and a
    * last-non-null window carries the active attribute onto each
    * probe (builds sort before probes at equal timestamps:
    * valid_from is inclusive).
    *
    * Graded through a CLOSURE property (a genuinely adversarial
    * oracle): PIT-joining the events against their OWN q134
    * dimension must reproduce each event's directly-computed
    * attribute — the oracle recomputes tier row-locally with no
    * dimension machinery at all, so structural drift anywhere in
    * the SCD2 + PIT pipeline surfaces as a mismatch.
    *
    * Scale design (100 TB): one union + one user-partitioned window
    * + a filter — two user-keyed exchanges, dimension-sized plus
    * event-sized rows, no range self-join anywhere. */
  def pointInTimeJoin(events: DataFrame, dim: DataFrame): DataFrame = {
    val probes = events.select(col("user_id"), col("ts_ms"),
      lit(1).as("kind"), col("event_id"),
      lit(null).cast("long").as("d_tier"))
    val builds = dim.select(col("user_id"),
      col("valid_from_ms").as("ts_ms"), lit(0).as("kind"),
      lit(null).cast("long").as("event_id"), col("tier").as("d_tier"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probes.unionByName(builds)
      .withColumn("tier",
        last(col("d_tier"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        col("tier"))
  }

  /** Maximum lag of [[hourlyAcf]] (q160). */
  val AcfMaxLag = 24

  /** Exact-moment autocorrelation function of the hourly volume
    * series (q160) — the periodicity diagnostic read before tuning
    * any monitor on the series (a strong lag-24 spike says the q150
    * CUSUM needs the q147 seasonal profile subtracted first; ACF
    * near zero says the residual is monitor-ready):
    * r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)² per event type for lags
    * 1..[[AcfMaxLag]], computed from EXPANDED moments so every
    * corpus-sized sum is an exact INTEGER (Σx_t·x_{t+k}, overlap
    * sums, Σx² — order-independent); r_k is then one fixed-order
    * double expression over those integers — bit-identical in the
    * mirror, no rounding. (The textbook centered form would sum
    * FP deviations in partition order — the hazard the expansion
    * removes.)
    *
    * Scale design (100 TB): the hourly frame is types × hours; the
    * lag join explodes it ×[[AcfMaxLag]] and joins on
    * (type, hour+lag) — hour-frame-sized work, never event-sized;
    * per-type totals broadcast back. */
  def hourlyAcf(events: DataFrame, maxLag: Int = AcfMaxLag)
      : DataFrame = {
    val h = cusumHourly(events)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = h.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_h"), sum(col("n_events")).as("sx"),
        sum(col("n_events") * col("n_events")).as("sq"))
    val a = h.select(col("event_type"), col("hour_id"),
        col("n_events").as("xa"))
      .withColumn("lag", explode(array((1 to maxLag).map(lit): _*)))
      .withColumn("b_hour", col("hour_id") + col("lag"))
    val bSide = h.select(col("event_type"),
      col("hour_id").as("b_hour"), col("n_events").as("xb"))
    val pairs = a.join(bSide, Seq("event_type", "b_hour"))
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("xa") * col("xb")).as("sxy"),
        sum(col("xa")).as("sa"), sum(col("xb")).as("sb"))
    pairs.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("lag").cast("long").as("lag"),
        col("n_pairs"),
        ((col("sxy").cast("double") -
          (col("sx").cast("double") / col("n_h")) *
            (col("sa") + col("sb")) +
          col("n_pairs") *
            ((col("sx").cast("double") / col("n_h")) *
              (col("sx").cast("double") / col("n_h")))) /
          (col("sq").cast("double") -
            col("n_h") *
              ((col("sx").cast("double") / col("n_h")) *
                (col("sx").cast("double") / col("n_h")))))
          .as("acf"))
  }

  /** Replica count of [[bootstrapCiMean]] (q158). */
  val BootstrapB = 32

  /** Deterministic subsampling-bootstrap CI for the mean (q158) —
    * the uncertainty quantification step dashboards skip and
    * shouldn't: [[BootstrapB]] half-sample replicas, each defined by
    * DETERMINISTIC membership (shifted Knuth hash of event_id — no
    * RNG, so the CI is reproducible and oracle-mirrorable), replica
    * means from exact cents sums, CI = the percentile band of the
    * ordered replica means (the m-out-of-n bootstrap percentile
    * form).
    *
    * Scale design (100 TB): ONE aggregation pass computes all
    * 2·[[BootstrapB]] conditional sums (codegen'd whens — no 32×
    * replica fan-out, no shuffle beyond the single global
    * reduction); the order statistics come from a sort over a
    * [[BootstrapB]]-element ARRAY in the one result row. Every sum
    * is an exact integer; means and the band are fixed-order double
    * expressions. */
  def bootstrapCiMean(events: DataFrame): DataFrame = {
    val b = BootstrapB
    // membership hash: high bits of event_id·K, shifted per replica
    // — all arithmetic stays far inside int64 (no overflow: DuckDB
    // errors where Spark would wrap)
    def keep(r: Int) = expr(
      s"((event_id * ${Sampling.HashMult}L) DIV 1048576 + $r * 7919) % 1000") < 500
    val cents = round(col("value") * 100).cast("long")
    val aggs =
      Seq(count(lit(1)).as("n_events"),
        sum(cents).as("s_all")) ++
      (0 until b).flatMap { r =>
        Seq(sum(when(keep(r), cents).otherwise(0L)).as(s"s_$r"),
          sum(when(keep(r), 1L).otherwise(0L)).as(s"n_$r"))
      }
    val wide = events.select(col("event_id"), col("value"))
      .agg(aggs.head, aggs.tail: _*)
    val means = array((0 until b).map(r =>
      col(s"s_$r").cast("double") / col(s"n_$r") / 100.0): _*)
    wide.select(col("n_events"),
        (col("s_all").cast("double") / col("n_events") / 100.0)
          .as("mean_value"),
        sort_array(means).as("ms"))
      .select(col("n_events"), col("mean_value"),
        element_at(col("ms"), 1).as("ci_lo"),
        element_at(col("ms"), b - 1).as("ci_hi"),
        lit(b.toLong).as("n_replicas"))
  }

  /** SPRT hypotheses and error rates (q157) — one set of literals
    * shared with the oracle: H0 p=0.18 vs H1 p=0.22 for the
    * purchase share, α = β = 0.05 → symmetric log boundaries
    * ±ln(19). */
  val SprtP0 = 0.18
  val SprtP1 = 0.22
  val SprtBound = 2.9444389791664403 // ln(0.95/0.05)

  /** Wald SPRT over the daily purchase share (q157) — SEQUENTIAL
    * hypothesis testing, the always-valid complement of the
    * fixed-horizon q145 χ²: each day contributes
    * k·ln(p₁/p₀) + (n−k)·ln((1−p₁)/(1−p₀)) to the running
    * log-likelihood ratio; the test DECIDES the first day the walk
    * exits ±[[SprtBound]] (peeking at a fixed-horizon test inflates
    * false positives; the SPRT's boundaries price the peeking in).
    * Output: one row per day with the day's counts, the cumulative
    * LLR, and the decision state as of that day.
    *
    * Determinism: daily k/n are exact integers; the two per-unit
    * log-increments are computed ONCE from shared literals and the
    * running sum is the row-sequential ordered window (q150
    * discipline) — bit-identical across engines.
    *
    * Scale design (100 TB): one map-side-combined daily aggregation;
    * the walk runs over the DAY frame (observation-span-bounded). */
  def sprtDaily(events: DataFrame): DataFrame = {
    val incPos = math.log(SprtP1 / SprtP0)
    val incNeg = math.log((1 - SprtP1) / (1 - SprtP0))
    val daily = events
      .groupBy(expr("ts_ms DIV 86400000").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
    val run = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("llr", sum(
        col("n_purchases") * lit(incPos) +
          (col("n_events") - col("n_purchases")) * lit(incNeg))
        .over(run))
      // the walk's FIRST boundary exit decides; afterwards the state
      // sticks (max/min over the prefix tell whether an exit ever
      // happened)
      .withColumn("hi", max(col("llr")).over(run))
      .withColumn("lo", min(col("llr")).over(run))
      .select(col("day"), col("n_events"), col("n_purchases"),
        col("llr"),
        when(col("hi") > SprtBound && col("lo") < -SprtBound,
          // both boundaries touched: the EARLIER exit decided — break
          // the tie by which extreme came first is impossible from
          // extremes alone, so emit the conservative 'accept_h1' iff
          // the high boundary was hit first; on this walk shape both
          // cannot be crossed before a decision sticks, but guard
          // deterministically by comparing magnitudes
          when(col("hi") + col("lo") >= 0, lit("accept_h1"))
            .otherwise(lit("accept_h0")))
          .when(col("hi") > SprtBound, lit("accept_h1"))
          .when(col("lo") < -SprtBound, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
  }

  /** Censoring horizon of [[kaplanMeier]] (q152): a user whose last
    * event falls within this many days of the corpus end is
    * CENSORED, not churned. */
  val KmCensorDays = 7L

  /** Kaplan–Meier retention curve (q152) — survival analysis over
    * user lifetimes, the statistically honest churn readout (naive
    * "fraction retained at t" silently treats users we stopped
    * observing as churned; KM removes them from the risk set
    * instead): lifetime t = last_day − first_day; churn OBSERVED
    * only when the last event predates the corpus end by
    * [[KmCensorDays]]; Ŝ(t) = Π_{u≤t} (1 − d_u/n_u) over distinct
    * lifetimes, with n_u the reverse-cumulative risk set.
    *
    * Determinism: all counts exact integers; each factor is one
    * fixed-order division; the product is the ln-prefix-sum (both
    * engines evaluate running aggregates row-sequentially — the
    * q150 discipline) with an explicit zero-factor guard (ln(0)
    * diverges BETWEEN engines: Spark log → NULL, DuckDB → −inf, so
    * the guard IS the portability fix: any zero factor pins the
    * curve to 0.0 from there on).
    *
    * Scale design (100 TB): one map-side-combined per-user
    * reduction; every window runs over the DISTINCT-LIFETIME frame
    * (bounded by the observation span in days, never user- or
    * event-sized). */
  def kaplanMeier(events: DataFrame): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(min(expr("ts_ms DIV 86400000")).as("first_day"),
        max(expr("ts_ms DIV 86400000")).as("last_day"))
    val maxRow = broadcast(events
      .agg(max(expr("ts_ms DIV 86400000")).as("max_day")))
    val lifetimes = users.crossJoin(maxRow)
      .select((col("last_day") - col("first_day")).as("t"),
        (col("last_day") <= col("max_day") - KmCensorDays)
          .as("churned"))
    val byT = lifetimes.groupBy(col("t"))
      .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("churned"), 1L).otherwise(0L)).as("c"))
    val rev = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val fwd = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum(col("d") + col("c")).over(rev))
      .withColumn("factor",
        lit(1.0) - col("d").cast("double") / col("n_risk"))
      .withColumn("lnf",
        when(col("factor") > 0.0, log(col("factor")))
          .otherwise(lit(0.0)))
      .withColumn("zeros",
        sum(when(col("factor") === 0.0, 1L).otherwise(0L)).over(fwd))
      .select(col("t").as("t_days"), col("n_risk"),
        col("d").as("n_churned"), col("c").as("n_censored"),
        when(col("zeros") > 0, lit(0.0))
          .otherwise(exp(sum(col("lnf")).over(fwd))).as("survival"))
  }

  /** CUSUM drift (κ = 0.5σ) and alarm (h = 4σ) multipliers — shared
    * literals with the oracle. */
  val CusumK = 0.5
  val CusumH = 4.0

  /** CUSUM changepoint screen over hourly event volumes (q150) —
    * the sequential anomaly detector behind pipeline-health
    * monitoring (Page 1954): per event type, S_t = max(0, S_{t−1} +
    * (x_t − μ − κσ)) over the hourly count series, alarm when
    * S_t > hσ. A plain z-score (q80) flags single outlier hours;
    * CUSUM accumulates SMALL sustained shifts — the
    * slow-degradation case thresholds miss.
    *
    * The recursion is computed CLOSED-FORM as windows — no fold, no
    * UDF: S_t = P_t − min(0, min_{j≤t} P_j) where P is the running
    * sum of deviations (the standard prefix-min identity for the
    * clamped random walk). Running sum and running min evaluate
    * row-sequentially inside each ordered frame in both engines, so
    * every value is bit-identical: μ and σ come from exact integer
    * moments (q136 discipline), deviations and prefixes are then
    * fixed-order doubles. Operates on OBSERVED hours (compose with
    * q62's gap-fill for a dense grid).
    *
    * Scale design (100 TB): one map-side-combined (type, hour)
    * aggregation (the only event-stream pass), a type-count-bounded
    * stats reduction broadcast back, and two type-partitioned
    * windows over the HOURLY frame (types × hours, never events). */
  /** The (type, hour) count frame shared by [[cusumAnomalies]] and
    * the streaming monitor's trainer. */
  def cusumHourly(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        expr("ts_ms DIV 3600000").as("hour_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Per-type (μ, σ) from exact integer moments of the hourly frame
    * — the statistics both CUSUM halves share. */
  def cusumStatsFrame(hourly: DataFrame): DataFrame =
    hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_h"), sum(col("n_events")).as("sx"),
        sum(col("n_events") * col("n_events")).as("sq"))
      .select(col("event_type"),
        (col("sx").cast("double") / col("n_h")).as("mu"),
        (sqrt((col("n_h") * col("sq") - col("sx") * col("sx"))
          .cast("double")) / col("n_h")).as("sigma"))

  /** The trained monitor model for SERVING — bounded by the event-
    * type cardinality (the codebook bring-to-driver contract). */
  def cusumStats(events: DataFrame): Map[String, (Double, Double)] =
    cusumStatsFrame(cusumHourly(events)).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap

  def cusumAnomalies(events: DataFrame): DataFrame = {
    val hourly = cusumHourly(events)
    val stats = cusumStatsFrame(hourly)
    val run = Window.partitionBy(col("event_type"))
      .orderBy(col("hour_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(broadcast(stats), "event_type")
      .withColumn("dev",
        col("n_events") - (col("mu") + lit(CusumK) * col("sigma")))
      .withColumn("p", sum(col("dev")).over(run))
      .withColumn("cusum",
        col("p") - least(min(col("p")).over(run), lit(0.0)))
      .select(col("event_type"), col("hour_id"), col("n_events"),
        col("cusum"),
        (col("cusum") > lit(CusumH) * col("sigma")).as("alarm"))
  }

  /** Page–Hinkley tolerance (δ = 0.1σ) and alarm (λ = 5σ)
    * multipliers — shared literals with the oracle. */
  val PhDelta = 0.1
  val PhLambda = 5.0

  /** Page–Hinkley drift screen over hourly event volumes (q259) —
    * the SELF-REFERENCED complement of q150's CUSUM: CUSUM tests
    * against a trained (μ, σ) baseline, while Page–Hinkley tracks
    * the deviation from the series' OWN running mean (m_t =
    * Σ_{i≤t}(x_i − x̄_i − δ), alarm when m_t − min_{j≤t} m_j > λσ),
    * so it adapts to slow level changes and fires only on abrupt
    * sustained shifts — the standard pairing in drift-detection
    * practice (Page 1954; the PH variant as used by the MOA/river
    * stream-mining literature).
    *
    * Determinism discipline: the running mean is explicit — the
    * exact-LONG running count sum divided by the ordered row index
    * (never an incremental window AVG), deviations and prefix
    * sums/mins are then fixed-order doubles in the ordered frame —
    * bit-identical in the mirror (the q150 discipline). σ comes
    * from the q150 exact integer moments.
    *
    * Scale design (100 TB): identical shape to q150 — one
    * map-side-combined (type, hour) rollup, a type-bounded stats
    * broadcast, and type-partitioned ordered windows over the
    * HOURLY frame (types × hours, never events). */
  def pageHinkley(events: DataFrame): DataFrame = {
    val hourly = cusumHourly(events)
    val stats = cusumStatsFrame(hourly)
    val ord = Window.partitionBy(col("event_type"))
      .orderBy(col("hour_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    hourly.join(broadcast(stats), "event_type")
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("rsum", sum(col("n_events")).over(run))
      .withColumn("dev",
        col("n_events").cast("double") -
          col("rsum").cast("double") / col("i") -
          lit(PhDelta) * col("sigma"))
      .withColumn("m", sum(col("dev")).over(run))
      .withColumn("ph", col("m") - min(col("m")).over(run))
      .select(col("event_type"), col("hour_id"), col("n_events"),
        col("ph"),
        (col("ph") > lit(PhLambda) * col("sigma")).as("alarm"))
  }

  /** Hour-of-day seasonality profile (q147) — the time-series
    * decomposition table behind load forecasting and anomaly
    * baselines: per (event_type, hour-of-day), event count and mean
    * value, plus the seasonal index = hourly mean ÷ the type's
    * overall mean (index > 1 = that hour runs hot for that type).
    * Hours are integer epoch arithmetic ((ts_ms DIV 3600000) mod
    * 24 — no calendar/timezone dependence), values exact in cents
    * (q138 discipline), so both means and their ratio are
    * fixed-order double expressions over exact integer sums —
    * bit-identical in the mirror.
    *
    * Scale design (100 TB): one map-side-combined (type, hour)
    * aggregation (≤ types×24 rows out) + a broadcast join of the
    * TYPE totals — the statistic never shuffles the event stream
    * twice. */
  def hourlySeasonality(events: DataFrame): DataFrame = {
    val base = events.select(col("event_type"),
      (expr("ts_ms DIV 3600000") % 24).as("hour"),
      round(col("value") * 100).cast("long").as("cents"))
    val byHour = base.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("sc"))
    val byType = byHour.groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("tn"), sum(col("sc")).as("tc"))
    byHour.join(broadcast(byType), "event_type")
      .select(col("event_type"), col("hour"), col("n_events"),
        (col("sc").cast("double") / col("n_events") / 100.0)
          .as("mean_value"),
        ((col("sc").cast("double") / col("n_events")) /
          (col("tc").cast("double") / col("tn"))).as("seasonal_idx"))
  }

  /** One guarded (O−E)²/E term of the χ² sum. */
  private def chiTerm(o: Column, e: Column): Column =
    when(e > 0.0, (o - e) * (o - e) / e).otherwise(lit(0.0))

  def conversionChiSq(events: DataFrame): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("conv"))
      .select((Sampling.mixed("user_id") % 2).as("arm"), col("conv"))
    val cells = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c1"))
    def d(c: Column) = c.cast("double")
    cells.select(col("n0"), col("c0"), col("n1"), col("c1"),
        (d(col("c0")) / col("n0")).as("cvr0"),
        (d(col("c1")) / col("n1")).as("cvr1"),
        (d(col("n0")) * (col("c0") + col("c1")) /
          (col("n0") + col("n1"))).as("e0c"),
        (d(col("n0")) * (col("n0") + col("n1") - col("c0") - col("c1")) /
          (col("n0") + col("n1"))).as("e0n"),
        (d(col("n1")) * (col("c0") + col("c1")) /
          (col("n0") + col("n1"))).as("e1c"),
        (d(col("n1")) * (col("n0") + col("n1") - col("c0") - col("c1")) /
          (col("n0") + col("n1"))).as("e1n"))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        col("cvr0"), col("cvr1"),
        // a zero expected cell (degenerate margin: nobody or
        // everybody converts) contributes 0 — the χ² convention, and
        // the guard ANSI division-by-zero demands
        (chiTerm(col("c0"), col("e0c")) +
          chiTerm(col("n0") - col("c0"), col("e0n")) +
          chiTerm(col("c1"), col("e1c")) +
          chiTerm(col("n1") - col("c1"), col("e1n"))).as("chi2"))
      .withColumn("significant", col("chi2") > ChiSqCrit)
  }

  /** Session gap (2 h, q15's rule) and result size of
    * [[sessionPaths]] (q142). */
  val SessionGapMs = 7200000L
  val SessionPathsK = 20

  /** Top-k session paths (q142) — behavioral path mining: each
    * session's ordered event-type sequence rendered as one `a>b>c`
    * path string, counted corpus-wide, top [[SessionPathsK]] by
    * frequency — the "how do users actually move" table behind
    * funnel design (q74 checks ONE hypothesized order; this
    * DISCOVERS the orders that exist). Sessionization is q15's
    * 2-hour-gap rule restated as gaps-and-islands (the q134 window
    * shape) so the path operator composes with the lag-based stack.
    *
    * Scale design (100 TB): sessionize + per-session path build in
    * user-keyed windows and ONE (user, sid) aggregation (the path
    * column is a sort_array over the session's own events — deterministic
    * order, session-bounded memory); path counting is a
    * map-side-combined groupBy on the path string; only the final
    * top-k ranks through a single-partition window over the
    * path-count frame (distinct-path-bounded, never event-bounded —
    * the q14 discipline). */
  def sessionPaths(events: DataFrame,
      k: Int = SessionPathsK): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val s = events
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        col("event_type"))
      .withColumn("new_s",
        when(lag(col("ts_ms"), 1).over(w).isNull ||
          col("ts_ms") - lag(col("ts_ms"), 1).over(w) >= SessionGapMs,
          1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = s.groupBy(col("user_id"), col("sid"))
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("ts_ms"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
    // the distinct-path frame grows with session count (corpus-
    // sized) — the top-k pick rides globalTopK's bounded heaps,
    // never a single-partition rank (the q176/q220 discipline)
    TextAnalysis.globalTopK(
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions")),
      Seq("n_sessions" -> false, "path" -> true), k)
  }

  /** Attribution lookback window of [[attributionCredits]] (7 days
    * in ms). */
  val AttributionWindowMs: Long = 7L * 24 * 3600 * 1000

  /** Position-weighted multi-touch attribution (q140) — the
    * marketing-analytics operator: every click/view credits the NEXT
    * purchase of the same user within [[AttributionWindowMs]]
    * (touch→next-conversion assignment, so no touch is ever
    * double-credited across purchases), U-shaped position weights
    * (first 0.4, last 0.4, middles split 0.2; a single touch takes
    * 1.0, a pair splits 0.5/0.5 so credit always sums to 1). Output
    * is the per-touch credit table — row-local weights,
    * deliberately NOT pre-aggregated: the credits are small rational
    * doubles whose cross-row sum would be partition-order-dependent,
    * while the per-touch rows are exactly reproducible (any consumer
    * aggregates at its own precision).
    *
    * Scale design (100 TB): next-purchase assignment is ONE
    * user-partitioned forward-frame window (first_value IGNORE NULLS
    * over [current, following] — the same exchange as q134/q139, no
    * join against a purchases table and no range self-join);
    * position/size are windows over the (user, purchase) key. Ties
    * resolve by the (ts_ms, event_id) total order in both engines —
    * a same-millisecond purchase with a smaller event_id sorts
    * before the touch and is correctly NOT its target. */
  def attributionCredits(events: DataFrame): DataFrame = {
    val fwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val marked = events
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        col("event_type"))
      .withColumn("purch",
        when(col("event_type") === "purchase",
          struct(col("ts_ms").as("pts"), col("event_id").as("pid"))))
      .withColumn("nxt", first(col("purch"), ignoreNulls = true)
        .over(fwd))
    val touches = marked
      .filter(col("event_type").isin("click", "view"))
      .filter(col("nxt").isNotNull &&
        col("nxt.pts") - col("ts_ms") <= AttributionWindowMs)
    val grp = Window.partitionBy(col("user_id"), col("nxt.pid"))
    touches
      .withColumn("pos", row_number()
        .over(grp.orderBy(col("ts_ms"), col("event_id"))).cast("long"))
      .withColumn("k_touches", count(lit(1)).over(grp))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"),
        col("nxt.pid").as("purchase_id"), col("pos"), col("k_touches"),
        when(col("k_touches") === 1, lit(1.0))
          .when(col("k_touches") === 2, lit(0.5))
          .when(col("pos") === 1, lit(0.4))
          .when(col("pos") === col("k_touches"), lit(0.4))
          .otherwise(lit(0.2) / (col("k_touches") - 2)).as("credit"))
  }

  /** First-order Markov transition matrix of the event stream
    * (q139) — the sequence-analytics substrate (next-action
    * prediction, anomalous-flow detection, the transition weights a
    * session-graph walk uses): P(next type | current type) from each
    * user's event sequence under the (ts_ms, event_id) total order.
    * Self-transitions are real rows (repeated type = a loop edge);
    * each user's last event emits no pair.
    *
    * Scale design (100 TB): ONE user-partitioned lead() window (no
    * global sort — the same exchange shape as q15/q134) and one
    * map-side-combined pair aggregation over a TYPE²-bounded key
    * space; probabilities are exact-long divisions (identical
    * doubles in both engines, no rounding) against a broadcast
    * per-source-type total. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    markovMatrixFromPairs(events
      .select(col("user_id"), col("ts_ms"), col("event_id"),
        col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull))
  }

  /** The count + row-normalize half of [[markovTransitions]], shared
    * with the streaming pair producer
    * ([[graft.streaming.StreamingMarkov]], q153) so the two paths
    * cannot drift: input is any frame of (event_type, next_type)
    * transition OCCURRENCES. */
  def markovMatrixFromPairs(pairs0: DataFrame): DataFrame =
    pairs0
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      // row totals via a type-partitioned window over the TYPE²-
      // bounded count frame — no self-join (a join of the aggregate
      // with itself trips attribute dedup over memory-sink views,
      // and the window is the smaller plan anyway)
      .withColumn("row_total", sum(col("n_transitions")).over(
        Window.partitionBy(col("event_type"))))
      .select(col("event_type"), col("next_type"),
        col("n_transitions"),
        (col("n_transitions").cast("double") / col("row_total"))
          .as("p"))

  /** CUPED variance-reduced A/B readout (q138) — the
    * experimentation-analytics operator (Deng et al. 2013): per-arm
    * post-period means adjusted by the pre-period covariate,
    * ŷ_cuped = ȳ_arm − θ·(x̄_arm − x̄), θ = cov(x,y)/var(x) pooled —
    * the industry-standard ~40-60% variance cut that needs no extra
    * data, only the unit's own pre-period history. Fixture
    * derivation: the pre/post boundary is the exact integer midpoint
    * of the observed ts_ms range, the arm is the Knuth-hash parity of
    * user_id (the q32 assignment discipline — deterministic,
    * corpus-growth-stable), and the metric is the event `value`.
    *
    * Determinism across engines: `value` is exact in cents
    * (round(value·100) as BIGINT), so per-user x/y and every pooled
    * moment (Σx, Σy, Σxy, Σx²) are EXACT integer sums —
    * order-independent; θ and the arm means are then fixed-order
    * double expressions over those integers, bit-identical in the
    * mirror with no rounding step. (Magnitude note: Σxy stays inside
    * int64 up to ~100× the graded SF; beyond that the moments frame
    * switches to the q103 ordered-fold discipline.)
    *
    * Scale design (100 TB): one map-side-combined (user, arm)
    * aggregation over the event stream, then two CONSTANT-size
    * reductions over the user frame (global moments row, per-arm
    * row) — broadcast-scalar joins, no window, no collect. */
  def cupedLift(events: DataFrame): DataFrame = {
    val splitRow = broadcast(events
      .agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
      .select(expr("(mn + mx) DIV 2").as("split_ms")))
    val cents = events.crossJoin(splitRow)
      .select(col("user_id"),
        (Sampling.mixed("user_id") % 2).as("arm"),
        (col("ts_ms") < col("split_ms")).as("pre"),
        round(col("value") * 100).cast("long").as("cents"))
    val users = cents.groupBy(col("user_id"), col("arm"))
      .agg(
        sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val theta = users
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n"), col("sx"),
        ((col("sxy").cast("double") * col("n") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("sxx").cast("double") * col("n") -
            col("sx").cast("double") * col("sx").cast("double")))
          .as("theta"))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("ax"),
        sum(col("y")).as("ay"))
    arms.crossJoin(broadcast(theta))
      .select(col("arm"), col("n_users"),
        (col("ay").cast("double") / col("n_users") / 100.0)
          .as("mean_y"),
        (col("ay").cast("double") / col("n_users") / 100.0 -
          col("theta") *
            (col("ax").cast("double") / col("n_users") / 100.0 -
              col("sx").cast("double") / col("n") / 100.0))
          .as("mean_y_cuped"),
        col("theta"))
  }

  def scd2Dimension(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val running = w.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val tiered = events.select(col("user_id"), col("ts_ms"),
      col("event_id"),
      (get_json_object(col("props"), "$.k").cast("long") % 4)
        .as("tier"))
    val runs = tiered
      .withColumn("chg",
        when(not(lag(col("tier"), 1).over(w) <=> col("tier")), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(running))
    val dim = runs.groupBy(col("user_id"), col("run_id"))
      .agg(min(col("tier")).as("tier"),
        min(col("ts_ms")).as("valid_from_ms"),
        count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    dim
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(byRun))
      .select(col("user_id"), col("tier"), col("valid_from_ms"),
        col("valid_to_ms"), col("n_events"),
        col("valid_to_ms").isNull.as("is_current"))
  }

  /** Two-sided 5% normal critical value of the Mann–Kendall Z. */
  val MkZCrit = 1.96

  /** Mann–Kendall trend test + Theil–Sen slope per event type (q199)
    * — the standard NON-parametric "is this metric drifting?" battery
    * over the daily revenue series: S = Σ_{i<j} sign(x_j − x_i)
    * (exact LONG — sign computed by CASE, never the double-returning
    * signum), tie-corrected variance Var(S) = [n(n−1)(2n+5) −
    * Σ_t t(t−1)(2t+5)]/18 with the numerator kept in exact LONG
    * arithmetic, the continuity-corrected Z, and the Theil–Sen
    * slope = MEDIAN of all pairwise slopes (cents/day) — robust to
    * outlier days where OLS is not. The median is an explicit
    * sorted-array middle pick ((lo+hi)/2.0 for even counts) rather
    * than an engine percentile primitive, so Spark and DuckDB
    * compute bit-identical doubles; slopes themselves are single
    * divisions of exact LONG differences.
    *
    * Scale design (100 TB): the event stream collapses to
    * |types|×|days| daily rows in ONE map-side-combined aggregation
    * before anything pairwise happens; the pair build is a self-join
    * CO-PARTITIONED on event_type with days²-bounded fan-out (an
    * analysis window is days-bounded — 30 here, ≤ 365 in practice —
    * so per-type pairs stay ≤ ~66k however many raw events flow in),
    * and the per-type sorted slope list is days²-bounded state, far
    * under any executor budget. */
  def mannKendallTrend(events: DataFrame): DataFrame =
    mannKendallFromDaily(dailyCents(events))

  /** The ONE corpus-sized pass of [[mannKendallTrend]]: the
    * (event_type, day) exact-cents collapse — map-side combined, and
    * an update-mode streaming aggregation verbatim, which is how the
    * incremental q214 twin maintains it. */
  def dailyCents(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        expr("ts_ms DIV 86400000").as("d"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("cents")).as("cents"))

  /** The |types|×|days|-row trend arithmetic of [[mannKendallTrend]]
    * over an already-maintained daily frame — the piece the
    * incremental twin (q214) re-runs per ingest wave. */
  def mannKendallFromDaily(daily: DataFrame): DataFrame = {
    val a = daily.select(col("event_type"), col("d").as("di"),
      col("cents").as("ci"))
    val b = daily.select(col("event_type"), col("d").as("dj"),
      col("cents").as("cj"))
    val pairs = a.join(b, Seq("event_type")).filter(col("di") < col("dj"))
      .select(col("event_type"),
        when(col("cj") > col("ci"), 1L)
          .when(col("cj") < col("ci"), -1L).otherwise(0L).as("sgn"),
        ((col("cj") - col("ci")).cast("double") /
          (col("dj") - col("di")).cast("double")).as("slope"))
    val perType = pairs.groupBy(col("event_type"))
      .agg(sum(col("sgn")).as("s_stat"),
        sort_array(collect_list(col("slope"))).as("slopes"))
    val nDays = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"))
    val ties = daily.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
        .as("tie_term"))
    val joined = perType
      .join(broadcast(nDays), "event_type")
      .join(broadcast(ties), "event_type")
      .withColumn("var18",
        col("n_days") * (col("n_days") - 1L) *
          (lit(2L) * col("n_days") + 5L) - col("tie_term"))
      .withColumn("var_s", col("var18").cast("double") / 18.0)
      .withColumn("n_pairs", size(col("slopes")).cast("long"))
      .withColumn("z",
        when(col("var_s") <= 0.0, lit(0.0))
          .when(col("s_stat") > 0L,
            (col("s_stat") - 1L).cast("double") / sqrt(col("var_s")))
          .when(col("s_stat") < 0L,
            (col("s_stat") + 1L).cast("double") / sqrt(col("var_s")))
          .otherwise(lit(0.0)))
      .withColumn("theil_sen",
        when(col("n_pairs") % 2L === 1L,
          element_at(col("slopes"),
            ((col("n_pairs") + 1L) / lit(2L)).cast("int")))
          .otherwise((
            element_at(col("slopes"),
              (col("n_pairs") / lit(2L)).cast("int")) +
            element_at(col("slopes"),
              (col("n_pairs") / lit(2L)).cast("int") + 1)) / 2.0))
    joined.select(col("event_type"), col("n_days"), col("n_pairs"),
      col("s_stat"), col("var_s"), col("z"), col("theil_sen"),
      when(col("z") >= MkZCrit, "increasing")
        .when(col("z") <= -MkZCrit, "decreasing")
        .otherwise("none").as("trend"))
  }

  /** Minimum SSE-reduction fraction for [[changepoint]] to call a
    * split significant (strict >, so a zero-variance series never
    * flags). */
  val ChangepointGainFrac = 0.3

  /** Conformal knobs (q212): calibration window length in days and
    * the target miscoverage α = 0.1 expressed as the exact rational
    * 9/10 used in the integer rank formula. */
  val ConformalCalDays = 20L
  val ConformalCovNum = 9
  val ConformalCovDen = 10

  /** Split-conformal prediction intervals per event type (q212) —
    * the DISTRIBUTION-FREE uncertainty band around a point forecast
    * (here the calibration-window mean), with the finite-sample
    * coverage guarantee conformal prediction is used for: on the
    * first [[ConformalCalDays]] days (calibration), residuals
    * r_d = |cents_d − μ̂| are ranked and q̂ = the
    * ⌈(n+1)·0.9⌉-th smallest (the EXACT integer rank
    * ((n+1)·9 + 9) DIV 10, clamped to n — never a percentile
    * primitive); the interval μ̂ ± q̂ is then scored on the holdout
    * days, reporting empirical coverage. Pairs with q151's
    * calibration table (probability calibration) and q158's
    * bootstrap CI (parametric-ish resampling): conformal is the
    * assumption-free member.
    *
    * Scale design (100 TB): the event stream collapses to
    * |types|×|days| in one map-side-combined pass; everything after
    * — split, mean, the sorted residual list (≤ calibration-window
    * days per type), rank pick, holdout count — is bounded per-type
    * arithmetic with broadcast joins. */
  def conformalIntervals(events: DataFrame,
      calDays: Long = ConformalCalDays): DataFrame = {
    val daily = events.select(col("event_type"),
        expr("ts_ms DIV 86400000").as("d"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("cents")).as("cents"))
    val d0 = daily.groupBy(col("event_type")).agg(min(col("d")).as("d0"))
    val j = daily.join(broadcast(d0), "event_type")
    val cal = j.filter(col("d") < col("d0") + calDays)
    val test = j.filter(col("d") >= col("d0") + calDays)
    val mu = cal.groupBy(col("event_type"))
      .agg(sum(col("cents")).as("sc"), count(lit(1)).as("n_cal"))
      .withColumn("mu",
        col("sc").cast("double") / col("n_cal").cast("double"))
    val qhat = cal.join(broadcast(mu), "event_type")
      .select(col("event_type"),
        abs(col("cents").cast("double") - col("mu")).as("r"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .join(broadcast(mu), "event_type")
      .withColumn("k",
        least(col("n_cal"),
          expr(s"((n_cal + 1) * $ConformalCovNum + " +
            s"${ConformalCovDen - 1}) DIV $ConformalCovDen")))
      .withColumn("q_hat", element_at(col("rs"), col("k").cast("int")))
      .select(col("event_type"), col("n_cal"), col("mu"), col("k"),
        col("q_hat"))
    test.join(broadcast(qhat), "event_type")
      .withColumn("hit",
        when(abs(col("cents").cast("double") - col("mu")) <=
          col("q_hat"), 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(max(col("n_cal")).as("n_cal"), max(col("mu")).as("mu"),
        max(col("q_hat")).as("q_hat"),
        count(lit(1)).as("n_test"), sum(col("hit")).as("n_covered"))
      .withColumn("coverage",
        col("n_covered").cast("double") / col("n_test").cast("double"))
  }

  /** Single-changepoint detection per event type (q204) — the first
    * level of binary segmentation (the classic CUSUM/PELT entry
    * point): over the daily-cents series, the split t minimizing
    * SSE_left + SSE_right, where each side's SSE comes from the
    * variance identity SS − S²/n on exact-LONG prefix sums (the only
    * doubles are the two fixed-order division formulas, identical in
    * both engines). Reports the best split day, the no-split SSE,
    * the split SSE, and whether the reduction clears
    * [[ChangepointGainFrac]] — the did-the-metric-regime-shift table
    * an on-call review reads next to q150's CUSUM alarms (CUSUM
    * detects ONLINE with a reference value; this locates the single
    * best breakpoint OFFLINE with no tuning).
    *
    * Scale design (100 TB): the event stream collapses to
    * |types|×|days| rows in one map-side-combined aggregation;
    * prefix sums are type-partitioned windows over that bounded
    * frame (≤ 365 rows per partition key — never a global window);
    * type totals broadcast back; the argmin is a struct-ordered MIN,
    * not a sort. Daily cents² sums stay far inside LONG at any
    * per-day volume a cents-valued metric reaches (10¹⁸ budget vs
    * ~10¹³ at 10⁸ cents/day over a year). */
  def changepoint(events: DataFrame,
      gainFrac: Double = ChangepointGainFrac): DataFrame = {
    val daily = events.select(col("event_type"),
        expr("ts_ms DIV 86400000").as("d"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val cum = daily
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("s", sum(col("cents")).over(w))
      .withColumn("ss", sum(col("cents") * col("cents")).over(w))
    val totals = cum.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sn"),
        sum(col("cents") * col("cents")).as("ssn"))
    def d(c: Column) = c.cast("double")
    val cand = cum.join(broadcast(totals), "event_type")
      .filter(col("t") < col("n"))
      .withColumn("cost",
        (d(col("ss")) - d(col("s")) * d(col("s")) / d(col("t"))) +
          (d(col("ssn") - col("ss")) -
            d(col("sn") - col("s")) * d(col("sn") - col("s")) /
              d(col("n") - col("t"))))
    cand.groupBy(col("event_type"))
      .agg(min(struct(col("cost"), col("t"), col("d"))).as("best"),
        max(col("n")).as("n_days"),
        max(d(col("ssn")) - d(col("sn")) * d(col("sn")) / d(col("n")))
          .as("cost_nosplit"))
      .select(col("event_type"), col("n_days"),
        col("best.t").as("split_t"), col("best.d").as("split_day"),
        col("cost_nosplit"), col("best.cost").as("cost_split"),
        (col("cost_nosplit") - col("best.cost")).as("gain"),
        ((col("cost_nosplit") - col("best.cost")) >
          lit(gainFrac) * col("cost_nosplit")).as("significant"))
  }
}
