package graft.operators

import graft.SparkSessionSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSessionSpec {
  import spark.implicits._

  // 90% of fact rows hit one hot key
  private lazy val fact = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)
  }.toDF("key", "v")
  private lazy val dim = Seq(
    ("hot", "H"), ("k0", "A"), ("k1", "B"), ("k2", "C"), ("k3", "D"),
    ("k4", "E"), ("k5", "F"), ("k6", "G")).toDF("key", "name")

  test("salted join is row-identical to the plain join") {
    val plain = fact.join(dim, "key").collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8)
      .select(fact.columns.map(col) ++ Seq(col("name")): _*)
      .collect().toSet
    assert(salted == plain)
    assert(plain.size == 2000)
  }

  test("salted join spreads the hot key over multiple salt values") {
    val factS = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col): _*), lit(8)))
    val hotSalts = factS.filter(col("key") === "hot")
      .select("_salt").distinct().count()
    assert(hotSalts > 4) // hot rows spread over most of the 8 buckets
  }

  test("two-phase salted aggregation matches direct groupBy") {
    val direct = fact.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedCountSum(fact, "key", "v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
