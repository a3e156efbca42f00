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
    assert(widen(IntegerType, LongType).contains(LongType))
    assert(widen(LongType, IntegerType).contains(LongType))
    assert(widen(StringType, LongType).contains(StringType))
  }
}
