package graft.ibtp

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Schema evolution scenarios (SURVEY §5.4 "schema-widening run"):
  * on_schema_change ∈ {ignore, fail, append_new_columns,
  * sync_all_columns} + the safe-cast widening matrix.
  */
class SchemaEvolutionSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshTarget(prefix: String): TargetTable = {
    val t = new TargetTable(spark, tmpDir(prefix), "day")
    t.init(Seq((java.sql.Date.valueOf("2024-01-01"), "a", 1))
      .toDF("day", "k", "v"))
    t
  }

  test("ignore: extra incoming columns dropped, missing null-filled") {
    val t = freshTarget("se_ignore")
    val incoming = Seq((java.sql.Date.valueOf("2024-01-02"), "b", 2, "extra"))
      .toDF("day", "k", "v", "new_col")
    t.evolveSchema(incoming.schema, OnSchemaChange.Ignore)
    t.append(incoming)
    assert(t.read().columns.toSeq == Seq("day", "k", "v"))
    // and a frame missing v:
    val missing = Seq((java.sql.Date.valueOf("2024-01-03"), "c")).toDF("day", "k")
    t.append(missing)
    val r = t.read().filter(col("k") === "c").head()
    assert(r.isNullAt(r.fieldIndex("v")))
  }

  test("fail: column-set drift raises") {
    val t = freshTarget("se_fail")
    val incoming = Seq((java.sql.Date.valueOf("2024-01-02"), "b", 2, "x"))
      .toDF("day", "k", "v", "new_col")
    assertThrows[IllegalStateException] {
      t.evolveSchema(incoming.schema, OnSchemaChange.Fail)
    }
  }

  test("append_new_columns: new column added; historic rows read NULL") {
    val t = freshTarget("se_append")
    val incoming = Seq((java.sql.Date.valueOf("2024-01-02"), "b", 2, "x"))
      .toDF("day", "k", "v", "new_col")
    t.evolveSchema(incoming.schema, OnSchemaChange.AppendNewColumns)
    t.append(incoming)
    val out = t.read()
    assert(out.columns.toSeq == Seq("day", "k", "v", "new_col"))
    val hist = out.filter(col("k") === "a").head()
    assert(hist.isNullAt(hist.fieldIndex("new_col")))
    assert(out.filter(col("k") === "b").head().getString(3) == "x")
  }

  test("sync_all_columns: adds new, drops removed, widens int->long") {
    val t = freshTarget("se_sync")
    // v goes int -> long, k is dropped, w arrives
    val incoming = Seq((java.sql.Date.valueOf("2024-01-02"), 2L, 0.5))
      .toDF("day", "v", "w")
    t.evolveSchema(incoming.schema, OnSchemaChange.SyncAllColumns)
    t.append(incoming)
    val out = t.read()
    assert(out.columns.toSeq == Seq("day", "v", "w"))
    assert(out.schema("v").dataType == LongType)
    // historic int32 row must read under the widened long schema
    assert(out.orderBy(col("day")).collect().map(_.getLong(1)).toSeq == Seq(1L, 2L))
  }

  test("runner applies on_schema_change per run") {
    val t = new TargetTable(spark, tmpDir("se_runner"), "day")
    val jan1 = LocalDate.of(2024, 1, 1)
    def model(withExtra: Boolean): IbtpModel = IbtpModel.DfModel { (s, from, to) =>
      import s.implicits._
      val base = table("events")
        .filter(col("ts") >= from && col("ts") < to)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      if (withExtra) base.withColumn("bonus", lit(1L)) else base
    }
    val cfg = IbtpConfig("day", Some(jan1), Some(jan1.plusDays(5)),
      onSchemaChange = OnSchemaChange.AppendNewColumns)
    IbtpRunner.run(spark, model(false), t,
      IbtpRunner.RunParams(cfg, today = jan1.plusDays(5)))
    // catch-up run brings a new column
    val cfg2 = cfg.copy(stopDate = Some(jan1.plusDays(10)))
    IbtpRunner.run(spark, model(true), t,
      IbtpRunner.RunParams(cfg2, today = jan1.plusDays(10)))
    val out = t.read()
    assert(out.columns.contains("bonus"))
    assert(out.filter(col("bonus").isNull).count() == 5)  // first 5 days
    assert(out.filter(col("bonus") === 1L).count() == 5)  // next 5 days
  }

  test("widening matrix basics") {
    import SchemaEvolution._
    assert(canSafelyCast(IntegerType, LongType))
    assert(canSafelyCast(FloatType, DoubleType))
    assert(!canSafelyCast(LongType, IntegerType))
    assert(!canSafelyCast(DoubleType, FloatType))
    assert(canSafelyCast(DateType, TimestampType))
    assert(canSafelyCast(LongType, StringType))
    // the int/float boundaries a naive numeric order gets wrong:
    // int→float rounds above 2^24, long→float/double above 2^53
    assert(!canSafelyCast(IntegerType, FloatType))
    assert(!canSafelyCast(LongType, FloatType))
    assert(!canSafelyCast(LongType, DoubleType))
    assert(canSafelyCast(IntegerType, DoubleType))
    assert(canSafelyCast(ShortType, FloatType))
    assert(widen(IntegerType, LongType).contains(LongType))
    assert(widen(LongType, IntegerType).contains(LongType))
    assert(widen(StringType, LongType).contains(StringType))
    assert(widen(IntegerType, DoubleType).contains(DoubleType))
    // genuinely incompatible: double can't hold long losslessly AND
    // the parquet reader can't promote long files to double
    assert(widen(LongType, DoubleType).isEmpty)
  }

  test("read-promotion matrix matches what the parquet reader accepts") {
    import SchemaEvolution._
    // the sidecar is the READ schema for historic files, so widenings
    // that affect it must come from the reader's probed promotion set
    assert(canPromoteOnRead(IntegerType, LongType))
    assert(canPromoteOnRead(IntegerType, DoubleType))
    assert(canPromoteOnRead(FloatType, DoubleType))
    assert(canPromoteOnRead(DecimalType(10, 2), DecimalType(20, 2)))
    assert(canPromoteOnRead(IntegerType, DecimalType(22, 2)))
    // cast-safe but reader-rejected — each of these as a sidecar type
    // throws SchemaColumnConvertNotSupportedException over old files
    assert(!canPromoteOnRead(LongType, DoubleType))
    assert(!canPromoteOnRead(IntegerType, FloatType))
    assert(!canPromoteOnRead(LongType, StringType))
    assert(!canPromoteOnRead(DateType, TimestampType))
    assert(!canPromoteOnRead(DecimalType(10, 2), DoubleType))
    assert(!canPromoteOnRead(DecimalType(10, 2), DecimalType(12, 1)))
  }

  test("expandTargetColumnTypes refuses sidecar changes historic files can't be read with") {
    // pre-fix, an incoming DOUBLE column "widened" a LONG target via
    // the cast predicate, and every subsequent read of the table threw
    // on the historic INT64 files
    val t = new TargetTable(spark, tmpDir("se_brick"), "day")
    t.init(Seq((java.sql.Date.valueOf("2024-01-01"), "a", 1L))
      .toDF("day", "k", "v"))
    val incoming = Seq((java.sql.Date.valueOf("2024-01-02"), "b", 0.5))
      .toDF("day", "k", "v")
    t.expandTargetColumnTypes(incoming.schema)
    assert(t.read().schema("v").dataType == LongType,
      "long→double is not a parquet read promotion; the sidecar must not change")
    // historic data still reads
    assert(t.read().count() == 1)
    // and the genuinely incompatible append fails loudly instead of
    // silently rounding large longs through a double
    assertThrows[IllegalArgumentException] { t.append(incoming) }
    // an int→long incoming still widens (the probe-verified promotion)
    val t2 = new TargetTable(spark, tmpDir("se_widen_ok"), "day")
    t2.init(Seq((java.sql.Date.valueOf("2024-01-01"), "a", 1))
      .toDF("day", "k", "v"))
    val longer = Seq((java.sql.Date.valueOf("2024-01-02"), "b", 2L))
      .toDF("day", "k", "v")
    t2.expandTargetColumnTypes(longer.schema)
    t2.append(longer)
    assert(t2.read().schema("v").dataType == LongType)
    assert(t2.read().orderBy(col("day")).collect().map(_.getLong(2)).toSeq == Seq(1L, 2L))
  }
}
