package graft.plans

import graft.SparkSessionSpec
import graft.functions.GeoFunctions
import graft.geo.{Geofences, Geohash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeofencePruneRuleSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  /** Points straddling each NYC fence cell: center (in), just inside
    * every edge, just outside every edge. */
  private def probePoints: Seq[(Double, Double)] =
    Geofences.nycCells.flatMap { c =>
      val b = Geohash.bbox(c)
      val eps = 1e-9
      Seq(
        (b.latCenter, b.lonCenter),
        (b.latMin, b.lonMin),                      // lower edges inclusive
        (b.latMax - eps, b.lonMax - eps),
        (b.latMax, b.lonCenter),                   // upper edge -> next cell
        (b.latMin - eps, b.lonCenter),
        (b.latCenter, b.lonMax))
    } ++ Seq((0.0, 0.0), (40.8, -74.0), (90.0, 180.0), (-90.0, -180.0))

  private def fenced(df: DataFrame): DataFrame =
    df.filter(GeoFunctions.near_nyc(col("lat"), col("lon")))

  private def optimizedWithRule(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      GeofencePruneRule(df.queryExecution.analyzed))

  test("rewritten fence predicate selects exactly the same rows") {
    val df = probePoints.toDF("lat", "lon")
    val original = fenced(df)
    val rewritten = optimizedWithRule(original)
    assert(rewritten.collect().toSet == original.collect().toSet)
    assert(original.count() > 0)
  }

  private def hasGeohashExpr(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    p.expressions.exists(_.exists(e =>
      e.isInstanceOf[org.apache.spark.sql.graft.GeohashEncode] ||
        e.isInstanceOf[org.apache.spark.sql.graft.GeohashCode]))

  test("rule eliminates geohash evaluation from the fence predicate") {
    val df = probePoints.toDF("lat", "lon")
    val before = fenced(df).queryExecution.analyzed
    val after = GeofencePruneRule(before)
    assert(hasGeohashExpr(before))
    assert(!after.exists(hasGeohashExpr))
  }

  test("rule leaves derived (expensive) coordinate expressions alone") {
    val df = Seq((1L, 40.8, -74.0)).toDF("id", "lat", "lon")
      .select(col("id"),
        (col("lat") * 2.0 - col("lat")).as("dlat"), col("lon"))
    val filtered = df.filter(
      GeoFunctions.near_nyc(col("dlat") + col("dlat") * 0.0, col("lon")))
    val after = GeofencePruneRule(filtered.queryExecution.analyzed)
    assert(after.exists(hasGeohashExpr))
  }

  test("string-form fences (geohash_encode IN cells) still rewrite") {
    val df = probePoints.toDF("lat", "lon")
    val strFence = df.filter(
      GeoFunctions.geohash_encode(col("lat"), col("lon"), 4)
        .isin(graft.geo.Geofences.nycCells: _*))
    val after = GeofencePruneRule(strFence.queryExecution.analyzed)
    assert(!after.exists(hasGeohashExpr))
    val rewritten = org.apache.spark.sql.graft.Bridge.ofRows(spark, after)
    assert(rewritten.collect().toSet == strFence.collect().toSet)
  }

  test("union with one derived-coordinate leg is NOT rewritten") {
    // Union.output reuses the first leg's exprIds; pushdown clones the
    // predicate into EVERY leg, so a cheap first leg must not certify
    // a rewrite that inlines the second leg's derivation trees
    val stored = probePoints.toDF("lat", "lon")
    val derived = Seq((1L, 20.4, -37.0)).toDF("id", "l0", "lon")
      .select((col("l0") * 2.0).as("lat"), col("lon"))
    val fencedUnion = fenced(stored.union(derived))
    val after = GeofencePruneRule(fencedUnion.queryExecution.analyzed)
    assert(after.exists(hasGeohashExpr),
      "union fence rewritten despite an expensive leg")
    // both legs stored -> the rewrite fires
    val bothStored = fenced(stored.union(probePoints.toDF("lat", "lon")))
    val after2 = GeofencePruneRule(bothStored.queryExecution.analyzed)
    assert(!after2.exists(hasGeohashExpr),
      "all-stored union fence was not rewritten")
  }

  test("box membership equals encode membership for every fence cell") {
    val cells = Geofences.nycCells ++ Geofences.jfkCells ++ Geofences.lgaCells
    cells.foreach { c =>
      val b = Geohash.bbox(c)
      val eps = 1e-9
      val pts = Seq(
        (b.latCenter, b.lonCenter), (b.latMin, b.lonMin),
        (b.latMax - eps, b.lonMin), (b.latMax, b.lonMax),
        (b.latMin - eps, b.lonCenter), (b.latCenter, b.lonMax - eps))
      pts.foreach { case (lat, lon) =>
        val byBox = lat >= b.latMin && lat < b.latMax &&
          lon >= b.lonMin && lon < b.lonMax
        assert(Geohash.contains(c, lat, lon) == byBox,
          s"cell $c point ($lat, $lon)")
      }
    }
  }

  test("production Q1 plan keeps the code fences (derived coordinates)") {
    // q1's lat/lon are ALIASES of the synthetic-trip derivation trees
    // (SyntheticTrips.derive) — rewriting would duplicate those trees
    // 4× per fence cell under predicate pushdown (measured +1.4 s at
    // sf0.1 with codegen falling back to interpreted filters). The
    // transitive guard must therefore leave q1's fences as single
    // GeohashCode evaluations.
    val q1 = graft.SparkEntry.queries("q1_pickup_hotspots")(
      spark, "/root/testdata/sf0.001")
    val optimized = q1.queryExecution.optimizedPlan
    assert(optimized.exists(hasCodeExpr),
      "derived-coordinate fence was rewritten — expression blow-up")
  }

  test("rule IS active on stored lat/lon columns: ranges reach PushedFilters") {
    // the 100 TB win case: when lat/lon are real Parquet columns the
    // fence becomes range predicates the scan can min/max-skip on.
    val dir = java.nio.file.Files.createTempDirectory("geofence").toFile
    try {
      val path = new java.io.File(dir, "pts.parquet").getAbsolutePath
      probePoints.toDF("lat", "lon").write.mode("overwrite").parquet(path)
      val stored = spark.read.parquet(path)
        .filter(GeoFunctions.near_nyc(col("lat"), col("lon")))
      assert(!stored.queryExecution.optimizedPlan.exists(hasGeohashExpr),
        "stored-column fence was NOT rewritten by the session rule")
      val formatted = stored.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(formatted.contains("PushedFilters: [Or(") &&
        formatted.contains("GreaterThanOrEqual(lat,"),
        s"fence ranges did not reach the Parquet scan:\n$formatted")
      // and the rewrite still selects exactly the fence rows
      assert(stored.collect().toSet ==
        fenced(probePoints.toDF("lat", "lon")).collect().toSet)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  private def hasCodeExpr(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    p.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.graft.GeohashCode]))

  test("out-of-range cell codes are NOT rewritten (always-false stays false)") {
    val df = probePoints.toDF("lat", "lon")
    // -1 and 2^20 (= 2^(5·4)) can never equal a precision-4 cell code:
    // the original predicate is always false; a naive rewrite would
    // de-interleave their low bits into a REAL box and match rows
    val bad = df.filter(
      GeoFunctions.geohash_code(col("lat"), col("lon"), 4)
        .isin(-1L, 1L << 20))
    val after = GeofencePruneRule(bad.queryExecution.analyzed)
    assert(after.exists(hasCodeExpr), "rule rewrote an out-of-range code")
    assert(bad.count() == 0)
  }

  test("extensions entry point registers the rule on a new session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // getOrCreate may return the shared session; only assert when we
      // really got one with our extension injected
      import s2.implicits._
      val df = probePoints.toDF("lat", "lon")
      val out = df.filter(GeoFunctions.near_nyc(col("lat"), col("lon")))
      val viaRule = optimizedWithRule(out)
      assert(out.collect().toSet == viaRule.collect().toSet)
    } finally { /* shared-session safe: do not stop */ }
  }
}
