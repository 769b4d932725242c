package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print the formatted physical plan of each (or one
  * named) SparkEntry query — used to audit pushdown, pruning,
  * whole-stage codegen spans and join strategies per round.
  * `runMain graft.Explain [queryName] [sfDir]`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => name.forall(_ == n) }
      .toSeq.sortBy(_._1)
      .foreach { case (n, fn) =>
        println(s"\n========== $n ==========")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
