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
    // Verbose line (full names + per-query host context) for humans and
    // BASELINE.md bookkeeping. NOT the driver-parsed line: at 170+
    // queries it exceeds the driver's 2000-char tail window, which is
    // exactly why BENCH_r01..r09 all landed `parsed: null`.
    println(s"""{"metric":"total_verbose","value":$total,"unit":"sec","queries":$qs,"query_ctx":$ctx,"failed":$failed,"sf":"$sfDir",${graft.util.HostLoad.jsonFragment()}}""")
    if (failed > 0) System.err.println(s"[bench] $failed queries failed")
    spark.stop()
    // FINAL line = the driver-parsed artifact. The driver keeps only the
    // last 2000 chars of output and json-parses the final line; sbt then
    // appends its ~75-char "[success] Total time" trailer. So this line
    // must stay under ~1880 chars at 180+ queries. Strategy: per-query
    // seconds with progressively compacted keys/precision until it fits —
    // full names first, then "qN" ids, then digit-count-capped values.
    def fmt(v: Double, subSecDp: Int, bigDp: Int): String =
      if (v < 0) "-1"
      else {
        val dp = if (v >= 10) bigDp else if (v >= 1) math.min(subSecDp + 0, 2) else subSecDp
        BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
          .bigDecimal.stripTrailingZeros.toPlainString
      }
    // Compacted keys MUST stay unique: r10's idKey mapped BOTH q1_agg and
    // q1_pickup_hotspots to "1" ({"1":0.4,...,"1":1.7}) and JSON last-wins
    // silently dropped one figure. Colliding keys get one initial per
    // remaining '_' segment appended (q1_agg -> "1a",
    // q1_pickup_hotspots -> "1ph"); if even that collides, the full name.
    def uniquify(keyOf: String => String): Map[String, String] = {
      val base = results.map { case (k, _, _, _, _) => k -> keyOf(k) }
      base.groupBy(_._2).valuesIterator.flatMap { grp =>
        if (grp.size == 1) grp
        else {
          val ext = grp.map { case (full, key) =>
            val initials = full.split('_').drop(1).map(_.head).mkString
            full -> (key + initials)
          }
          if (ext.map(_._2).distinct.size == ext.size) ext
          else grp.map { case (full, _) => full -> full }
        }
      }.toMap
    }
    def line(keyOf: String => String, subSecDp: Int, bigDp: Int): String = {
      val keys = uniquify(keyOf)
      val q = results.map { case (k, v, _, _, _) =>
        "\"" + keys(k) + "\":" + fmt(v, subSecDp, bigDp)
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 2, 1)},"unit":"sec","failed":$failed,"n":${results.size},"sf":"$sfDir","queries":$q}"""
    }
    val shortKey = (k: String) => k.takeWhile(_ != '_') // q104_host_quality -> q104
    val idKey = (k: String) => k.drop(1).takeWhile(_ != '_') // -> 104
    val candidates = Iterator(
      line(identity, 2, 1),
      line(shortKey, 2, 1),
      line(shortKey, 1, 0),
      line(idKey, 2, 1),
      line(idKey, 1, 0))
    val compact = candidates.find(_.length <= 1880).getOrElse(line(idKey, 1, 0))
    println(compact)
    // The driver json-parses the FINAL stdout line, but sbt prints its
    // "[success] Total time: ..." trailer AFTER this JVM exits — so no
    // line printed from here can be last. Spawn a detached child that
    // inherits this stdout (run/outputStrategy=StdoutOutput makes that
    // sbt's real stdout, not a logger pipe), waits for the sbt JVM (our
    // parent process) to exit, and re-emits the compact line: it lands
    // after the trailer as the true final line, and the driver's
    // read-to-EOF capture still sees it because the child keeps the
    // stdout pipe open. If the driver's capture instead stops at sbt
    // exit the line is simply lost — no worse off than rounds 1-10.
    // Mechanics: sbt PUMPS the forked stdout even under StdoutOutput (the
    // run task waits for pipe EOF), so the child must not inherit or write
    // to OUR stdout — it would both print pre-trailer and stall the run
    // task until its own exit. Instead it dups sbt's stdout (/proc/<sbt
    // pid>/fd/1 = the driver's capture pipe) onto fd 3 while sbt is still
    // alive, polls for sbt's exit, and cats the line to fd 3.
    try {
      val tmp = java.nio.file.Files.createTempFile("graft-bench-", ".json")
      java.nio.file.Files.write(tmp, (compact + "\n").getBytes("UTF-8"))
      val sbtPidOpt = ProcessHandle.current().parent()
        .map[String](p => String.valueOf(p.pid())).orElse("")
      if (sbtPidOpt.nonEmpty) {
        val p = sbtPidOpt
        val sh =
          s"""exec </dev/null >/dev/null 2>/dev/null
             |exec 3>>/proc/$p/fd/1 || exit 0
             |n=0
             |while kill -0 $p 2>/dev/null && [ $$n -lt 120 ]; do sleep 0.5; n=$$((n+1)); done
             |sleep 1
             |cat '$tmp' >&3
             |rm -f '$tmp'""".stripMargin
        new ProcessBuilder("/bin/sh", "-c", sh)
          .redirectInput(new java.io.File("/dev/null"))
          .redirectOutput(new java.io.File("/dev/null"))
          .redirectError(new java.io.File("/dev/null"))
          .start()
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] trailer echo failed: ${e.getMessage}")
    }
  }
}
