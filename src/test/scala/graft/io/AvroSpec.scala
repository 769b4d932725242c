package graft.io

import graft.SparkSessionSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Completes the format matrix (Parquet/ORC/CSV/JSON in FormatsSpec):
  * Avro object-container round-trip on the core avro library — the
  * spark-avro connector is not on this classpath by design — plus the
  * partitioned-write layout with DIRECTORY-level pruning asserted on
  * the file list itself, never post-hoc row filtering. */
class AvroSpec extends AnyFunSuite with SparkSessionSpec {

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def withDir(f: java.io.File => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("avro").toFile
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

  test("Avro round-trip preserves rows and schema") {
    withDir { dir =>
      val p = s"$dir/docs_avro"
      AvroFiles.write(docs, p)
      val back = AvroFiles.read(spark, p, docs.schema)
      assert(back.schema == docs.schema)
      assert(sortedRows(back) == sortedRows(docs))
      // real Avro object-container files: magic "Obj"
      val f = AvroFiles.listFiles(p).head._2
      val magic = java.nio.file.Files.newInputStream(
        java.nio.file.Paths.get(f)).readNBytes(4)
      assert(magic.toSeq == Seq[Byte]('O', 'b', 'j', 1))
    }
  }

  test("nulls and binary columns survive the union encoding") {
    withDir { dir =>
      import spark.implicits._
      val df = Seq(
        (1L, Option("a"), Option(Array[Byte](1, 2, 3))),
        (2L, None: Option[String], None: Option[Array[Byte]]),
        (3L, Option("c"), Option(Array.empty[Byte])))
        .toDF("id", "s", "b")
      val p = s"$dir/nulls_avro"
      AvroFiles.write(df, p)
      val back = AvroFiles.read(spark, p, df.schema)
        .orderBy("id").collect()
      assert(back(1).isNullAt(1) && back(1).isNullAt(2))
      assert(back(0).getAs[Array[Byte]]("b").toSeq == Seq[Byte](1, 2, 3))
      assert(back(2).getAs[Array[Byte]]("b").isEmpty)
    }
  }

  test("partitioned Avro write prunes directories before any file is read") {
    withDir { dir =>
      val p = s"$dir/docs_by_lang"
      AvroFiles.write(docs, p, partitionBy = Some("lang"))
      val langs = docs.select("lang").distinct().count()
      assert(langs > 1, "fixture has a single language — test is vacuous")

      // pruning happens on the LISTING: only lang=en files surface
      val all = AvroFiles.listFiles(p)
      val pruned = AvroFiles.listFiles(p, _ == "lang=en")
      assert(pruned.nonEmpty && pruned.size < all.size,
        s"listed ${pruned.size} of ${all.size} files — no pruning")
      assert(pruned.forall(_._1 == "lang=en"))

      val en = AvroFiles.read(spark, p, docs.schema,
        partitionBy = Some("lang"), partitionPrune = _ == "lang=en")
      val expected = docs.filter(col("lang") === "en")
      assert(sortedRows(en) == sortedRows(expected))
      // unpruned read restores the full table, partition column intact
      val full = AvroFiles.read(spark, p, docs.schema,
        partitionBy = Some("lang"))
      assert(sortedRows(full) == sortedRows(docs))
    }
  }

  test("nested types are refused, not mangled") {
    intercept[IllegalArgumentException] {
      AvroFiles.avroSchemaFor(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))
    }
  }
}
