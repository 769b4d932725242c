package graft.io

import graft.SparkSessionSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth: the reference reads S3 text lines and
  * writes Elasticsearch JSON; a Spark engine gets the columnar +
  * text format families built in. Round-trips the documents fixture
  * through each and pins the scale-relevant write layouts
  * (partitioned writes with partition pruning at read time). Avro is
  * covered separately in [[AvroSpec]] through [[AvroFiles]]: the
  * spark-avro connector is not on this classpath and the engine must
  * not depend on it, so the round-trip runs on the core avro
  * library. */
class FormatsSpec extends AnyFunSuite with SparkSessionSpec {

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def withDir(f: java.io.File => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("formats").toFile
    try f(dir)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete()
      }
      rm(dir)
    }
  }

  private def sortedRows(df: DataFrame) =
    df.select(col("doc_id"), col("text"), col("lang"), col("source"),
      col("n_chars")).orderBy("doc_id").collect().toSeq

  test("ORC round-trip preserves rows and schema") {
    withDir { dir =>
      val p = s"$dir/docs.orc"
      docs.write.orc(p)
      val back = spark.read.orc(p)
      assert(back.schema == docs.schema)
      assert(sortedRows(back) == sortedRows(docs))
    }
  }

  test("CSV round-trip with explicit schema (quoted free text survives)") {
    withDir { dir =>
      val p = s"$dir/docs.csv"
      docs.write.option("header", "true").option("escape", "\"").csv(p)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      val back = spark.read.option("header", "true")
        .option("escape", "\"").schema(schema).csv(p)
      assert(sortedRows(back) == sortedRows(docs))
    }
  }

  test("JSON-lines round-trip preserves rows") {
    withDir { dir =>
      val p = s"$dir/docs.json"
      docs.write.json(p)
      val back = spark.read.schema(docs.schema).json(p)
      assert(sortedRows(back) == sortedRows(docs))
    }
  }

  test("partitioned parquet write prunes partitions at read time") {
    withDir { dir =>
      val p = s"$dir/docs_by_lang"
      docs.write.partitionBy("lang").parquet(p)
      val langs = docs.select("lang").distinct().count()
      assert(langs > 1, "fixture has a single language — test is vacuous")
      val one = spark.read.parquet(p).filter(col("lang") === "en")
      // the filter must become a PartitionFilter (directory pruning),
      // never a post-scan row filter over every partition's files
      val planTxt = one.queryExecution.executedPlan.toString
      assert(planTxt.contains("PartitionFilters: [isnotnull(lang"), planTxt)
      // execute THIS df (count() would build a separate execution and
      // leave these metrics at zero), then read what the scan touched
      // (DataFrame.inputFiles ignores pruning)
      assert(one.collect().length ==
        docs.filter(col("lang") === "en").count())
      val scans = one.queryExecution.executedPlan.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      val allFiles = spark.read.parquet(p).inputFiles.length
      val readFiles = scans.map(_.metrics("numFiles").value).sum
      assert(readFiles > 0 && readFiles < allFiles,
        s"read $readFiles of $allFiles files — no pruning")
    }
  }
}
