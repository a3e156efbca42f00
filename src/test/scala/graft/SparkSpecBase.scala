package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession across all suites in the JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  val sfDir = "/root/testdata/sf0.001"

  def table(name: String): DataFrame =
    graft.sources.Tables.read(spark, sfDir, name)

  /** Order-insensitive DataFrame equality on collected rows. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq ==
      b.schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq,
      s"schema mismatch:\n  ${a.schema.treeString}\n  ${b.schema.treeString}")
    val cols = a.columns.sorted.toIndexedSeq
    val ra = a.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
    val rb = b.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
    assert(ra.length == rb.length, s"row count ${ra.length} != ${rb.length}")
    ra.zip(rb).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i differs: $x vs $y")
    }
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
