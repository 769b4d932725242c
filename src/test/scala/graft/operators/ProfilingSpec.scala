package graft.operators

import graft.SparkSessionSpec
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  test("numeric profile: exact counts, nulls, distincts, min/max") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 5.0), (2.0, null), (2.0, 7.5), (null, 7.5))
      .toDF("a", "b")
    val rows = Profiling.numericProfile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getAs[Long]("n_rows") == 4 && a.getAs[Long]("n_nulls") == 1)
    assert(a.getAs[Long]("n_distinct") == 2)
    assert(a.getAs[Double]("min_value") == 1.0 &&
      a.getAs[Double]("max_value") == 2.0)
    val b = rows("b")
    assert(b.getAs[Long]("n_nulls") == 1 &&
      b.getAs[Long]("n_distinct") == 2)
    assert(b.getAs[Double]("max_value") == 7.5)
  }

  test("checked HLL profile: bounds hold, exact columns match q61's") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val checked = Profiling.numericProfileChecked(li).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Profiling.numericProfile(li).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(checked.keySet == exact.keySet)
    checked.foreach { case (c, r) =>
      assert(r.getAs[Boolean]("hll_ok"), s"HLL out of bound for $c")
      assert(r.getAs[Long]("n_distinct") ==
        exact(c).getAs[Long]("n_distinct"))
      assert(r.getAs[Double]("min_value") ==
        exact(c).getAs[Double]("min_value"))
    }
  }

  test("winsorize and z-score screens agree with hand-computed stats") {
    // 20 values of 1.0 + one extreme outlier in one type; second type
    // has no outliers
    val events = (Seq.fill(20)(("click", 1.0)) :+ ("click", 1000.0)) ++
      Seq.fill(5)(("view", 2.0))
    val df = events.toDF("event_type", "value")
    val z = Profiling.zscoreOutliers(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // click: the 1000.0 sits far past mean + 3 sigma of the sample
    assert(z("click").getAs[Long]("n_outliers") == 1)
    assert(z("click").getAs[Long]("n") == 21)
    // view: zero variance, zero outliers (0 > 3*0 is false)
    assert(z("view").getAs[Long]("n_outliers") == 0)
    val w = Profiling.winsorizedStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // p95 of 21 values (20 ones + 1000) interpolates just above 1.0,
    // so exactly the single extreme value clips high
    assert(w("click").getAs[Long]("n_clipped_high") == 1)
    assert(w("view").getAs[Long]("n_clipped_high") == 0 &&
      w("view").getAs[Long]("n_clipped_low") == 0)
  }

  test("q127 median/MAD screen: exact stats, and robust where the " +
      "z-score screen masks") {
    // hand-computable: 5 values per type
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0)) ++
      Seq(("b", 10.0), ("b", 10.0), ("b", 10.0), ("b", 10.0),
        ("b", 10.0))).toDF("event_type", "value")
    val m = Profiling.madOutliers(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // a: median 3, |dev| = {2,1,0,1,97}, MAD = 1; only 100 exceeds
    // 3 + 4.4478*1
    assert(m("a").getAs[Double]("med_value") == 3.0)
    assert(m("a").getAs[Double]("mad_value") == 1.0)
    assert(m("a").getAs[Long]("n_outliers") == 1)
    // b: constant series — MAD 0, nothing trips (0 > 0 is false)
    assert(m("b").getAs[Double]("mad_value") == 0.0)
    assert(m("b").getAs[Long]("n_outliers") == 0)
    // MASKING: two extremes among ten inflate sigma until the
    // z-screen sees NOTHING, while the MAD screen still fires —
    // the breakdown-point argument for q127 over q80
    val masked = (Seq.fill(8)(("c", 1.0)) ++
      Seq(("c", 500.0), ("c", -500.0))).toDF("event_type", "value")
    val z = Profiling.zscoreOutliers(masked).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(z("c").getAs[Long]("n_outliers") == 0) // masked
    val robust = Profiling.madOutliers(masked).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(robust("c").getAs[Long]("n_outliers") == 2) // caught
  }

  test("gap fill: empty hours carry the last observed hourly average") {
    val H = 3600000L
    // user 1: hours 10 (avg 2.0 of 1.0+3.0) and 13 (6.0); user 2: hour 5
    val events = Seq(
      (1L, 10 * H + 100, 1.0), (1L, 10 * H + 200, 3.0),
      (1L, 13 * H + 1, 6.0),
      (2L, 5 * H, 9.0))
      .toDF("user_id", "ts_ms", "value")
    val out = Profiling.gapFillHourly(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out((1L, 10L)) == (2.0, true))
    assert(out((1L, 11L)) == (2.0, false)) // carried forward
    assert(out((1L, 12L)) == (2.0, false))
    assert(out((1L, 13L)) == (6.0, true))
    assert(out((2L, 5L)) == (9.0, true))
    assert(out.size == 5) // user 2's grid is a single hour
  }

  test("psiDrift: identical halves score exactly 0; a shifted " +
      "current half crosses the 0.25 drift line") {
    import spark.implicits._
    // ids 1..10 (ref) and 11..20 (cur) carry the SAME length
    // distribution -> every p = q -> PSI exactly 0
    val same = ((1 to 10).map(i => (i.toLong, i * 100L)) ++
      (1 to 10).map(i => (10L + i, i * 100L)))
      .toDF("doc_id", "n_chars")
    val out0 = Profiling.psiDrift(same).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(out0.last.getAs[Double]("cum_psi") == 0.0)
    out0.foreach(r => assert(r.getAs[Double]("term") == 0.0))
    // current half collapsed into the top bins -> heavy drift
    val drifted = ((1 to 10).map(i => (i.toLong, i * 100L)) ++
      (1 to 10).map(i => (10L + i, 950L)))
      .toDF("doc_id", "n_chars")
    val out1 = Profiling.psiDrift(drifted).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(out1.last.getAs[Double]("cum_psi") > 0.25,
      s"PSI ${out1.last.getAs[Double]("cum_psi")}")
  }

  test("psiDrift fixture: PSI non-negative termwise, at most " +
      "PsiBins rows, halves partition the corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Profiling.psiDrift(docs).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(out.length <= Profiling.PsiBins)
    out.foreach { r =>
      assert(r.getAs[Double]("term") >= 0.0,
        s"bin ${r.getAs[Long]("bin")}")
    }
    assert(out.map(r => r.getAs[Long]("n_ref") +
      r.getAs[Long]("n_cur")).sum == docs.count())
  }
}
