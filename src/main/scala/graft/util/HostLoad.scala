package graft.util

/** Host-context snapshot embedded in every bench JSON line.
  *
  * Round 6's B3 streaming number dropped 10,483 → 6,612 ev/s with no
  * code change on the path; the cause was hypervisor-side contention
  * (loadavg 6-7 measured from outside the guest). Benches now
  * self-record 1/5/15-min loadavg and a UTC timestamp so a future
  * reader can tell a contended measurement from a regression without
  * re-litigating: numbers taken at load1 >= 2 are suspect by policy
  * (BASELINE.md "Bench box contention").
  */
object HostLoad {
  /** (load1, load5, load15) from /proc/loadavg; NaN if unreadable. */
  def loadAvg(): (Double, Double, Double) =
    try {
      val parts = scala.io.Source.fromFile("/proc/loadavg").mkString
        .trim.split("\\s+")
      (parts(0).toDouble, parts(1).toDouble, parts(2).toDouble)
    } catch { case scala.util.control.NonFatal(_) =>
      (Double.NaN, Double.NaN, Double.NaN)
    }

  /** (stealJiffies, totalJiffies) from /proc/stat's aggregate cpu line.
    * Steal is the one in-guest signal that sees HYPERVISOR-side
    * contention — guest loadavg stays near zero while a co-tenant
    * starves the vCPUs (exactly the r6 B3 situation).
    */
  def cpuJiffies(): (Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      (if (f.length > 7) f(7) else 0L, f.sum)
    } catch { case scala.util.control.NonFatal(_) => (0L, 0L) }

  /** Fixed single-thread CPU canary: wall ms to SHA-256 a 1 MiB buffer
    * 64 times. A fixed amount of work measures EFFECTIVE cpu speed —
    * slower host slot, thermal cap, or steal all inflate it, so rounds
    * become comparable without trusting loadavg. 62–74 ms quiet on
    * the reference box (BASELINE.md r7 records); treat >1.5× drift
    * as a changed host.
    */
  def cpuCanaryMs(): Double = cpuCanaryMs(64)

  /** [[cpuCanaryMs]] with a caller-chosen hash count: the per-QUERY
    * canary uses a small count (~1 ms quiet) so sampling effective
    * CPU speed around all ~100 battery queries stays free. Round 9
    * measured an 8× battery-wide slowdown window with loadavg,
    * steal AND the per-run canary all quiet — only a per-query
    * canary ties the inflation to the host, not the operator. */
  def cpuCanaryMs(iters: Int): Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = new Array[Byte](1 << 20)
    java.util.Arrays.fill(buf, 0x5a.toByte)
    val t0 = System.nanoTime()
    var i = 0
    while (i < iters) { md.update(buf); i += 1 }
    md.digest()
    (System.nanoTime() - t0) / 1e6
  }

  /** Pre-run snapshot: taken at [[record()]], so call it as the FIRST
    * statement of a bench main — load measured after the 32-thread
    * Spark job has run is the bench's own footprint, not the ambient
    * contention the policy gates on.
    */
  private var preRun: Option[(Double, Double, Double)] = None
  private var preJiffies: Option[(Long, Long)] = None
  private var canaryMs: Double = Double.NaN
  def record(): Unit = {
    preRun = Some(loadAvg())
    preJiffies = Some(cpuJiffies())
    canaryMs = cpuCanaryMs()
  }

  /** JSON fragment (no braces): pre-run load, end load, steal fraction
    * over the run, CPU canary, UTC timestamp.
    */
  def jsonFragment(): String = {
    val (p1, p5, p15) = preRun.getOrElse((Double.NaN, Double.NaN, Double.NaN))
    val (e1, _, _) = loadAvg()
    val stealPct = (preJiffies, cpuJiffies()) match {
      case (Some((s0, t0)), (s1, t1)) if t1 > t0 =>
        100.0 * (s1 - s0) / (t1 - t0)
      case _ => Double.NaN
    }
    val ts = java.time.Instant.now().toString
    def num(d: Double) = if (d.isNaN) "null"
      else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    s""""load1_pre":${num(p1)},"load5_pre":${num(p5)},"load15_pre":${num(p15)},""" +
      s""""load1_end":${num(e1)},"steal_pct":${num(stealPct)},""" +
      s""""cpu_canary_ms":${num(canaryMs)},"utc":"$ts""""
  }
}
