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

  test("nested widening matrix: struct add/widen, array elements, maps") {
    import SchemaEvolution._
    val s1 = StructType(Seq(StructField("x", IntegerType)))
    val s2 = StructType(Seq(StructField("x", LongType), StructField("y", StringType)))
    // struct-widen + struct-add: historic files promote x and read y NULL
    assert(canPromoteOnRead(s1, s2))
    assert(canSafelyCast(s1, s2))
    assert(widen(s1, s2).contains(s2))
    // merge when each side has a field the other lacks
    val a = StructType(Seq(StructField("x", IntegerType), StructField("old", StringType)))
    val b = StructType(Seq(StructField("x", LongType), StructField("neu", DoubleType)))
    val m = widen(a, b).get.asInstanceOf[StructType]
    assert(m.fieldNames.toSeq == Seq("x", "old", "neu"))
    assert(m("x").dataType == LongType)
    // dropping a field is NOT a read promotion (it would hide history)
    assert(!canPromoteOnRead(s2, s1))
    // a reader-rejected leaf poisons the whole nested type
    val bad = StructType(Seq(StructField("x", DoubleType)))
    val sL  = StructType(Seq(StructField("x", LongType)))
    assert(!canPromoteOnRead(sL, bad) && widen(sL, bad).isEmpty)
    // arrays and maps recurse on element/key/value
    assert(canPromoteOnRead(ArrayType(IntegerType), ArrayType(LongType)))
    assert(!canPromoteOnRead(ArrayType(LongType), ArrayType(DoubleType)))
    assert(widen(ArrayType(IntegerType), ArrayType(LongType))
      .contains(ArrayType(LongType)))
    assert(canPromoteOnRead(MapType(StringType, IntegerType),
      MapType(StringType, LongType)))
    // non-nullable containers can widen to nullable, not the reverse
    assert(canPromoteOnRead(ArrayType(IntegerType, containsNull = false),
      ArrayType(LongType, containsNull = true)))
    assert(!canPromoteOnRead(ArrayType(IntegerType, containsNull = true),
      ArrayType(LongType, containsNull = false)))
  }

  test("sync_all_columns evolves nested structs end-to-end") {
    // struct column gains a field AND widens a leaf; historic rows must
    // still read (nested parquet promotion) and NULL-fill the new field
    val t = new TargetTable(spark, tmpDir("se_nested"), "day")
    t.init(
      Seq((java.sql.Date.valueOf("2024-01-01"), "a", (1, "p")))
        .toDF("day", "k", "meta")
        .withColumn("meta", struct(
          col("meta._1").cast("int").as("x"), col("meta._2").as("tag"))))
    val incoming = Seq((java.sql.Date.valueOf("2024-01-02"), "b", (2L, "q", 0.5)))
      .toDF("day", "k", "meta")
      .withColumn("meta", struct(
        col("meta._1").as("x"), col("meta._2").as("tag"),
        col("meta._3").as("score")))
    t.evolveSchema(incoming.schema, OnSchemaChange.SyncAllColumns)
    t.append(incoming)
    val out = t.read().orderBy(col("day"))
    val mt = out.schema("meta").dataType.asInstanceOf[StructType]
    assert(mt("x").dataType == LongType, "nested leaf widened int->long")
    assert(mt.fieldNames.contains("score"), "nested field added")
    val rows = out.select(col("meta.x"), col("meta.tag"), col("meta.score")).collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "p" && rows(0).isNullAt(2),
      "historic row reads through the evolved nested schema")
    assert(rows(1).getLong(0) == 2L && rows(1).getString(1) == "q" && rows(1).getDouble(2) == 0.5)
    // and an array column whose ELEMENT type widens
    val t2 = new TargetTable(spark, tmpDir("se_nested_arr"), "day")
    t2.init(Seq((java.sql.Date.valueOf("2024-01-01"), Seq(1, 2)))
      .toDF("day", "xs"))
    val inc2 = Seq((java.sql.Date.valueOf("2024-01-02"), Seq(3L))).toDF("day", "xs")
    t2.evolveSchema(inc2.schema, OnSchemaChange.SyncAllColumns)
    t2.append(inc2)
    assert(t2.read().schema("xs").dataType == ArrayType(LongType))
    assert(t2.read().orderBy(col("day")).select(explode(col("xs")))
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // incompatible nested change fails with the full-refresh remedy
    val incBad = Seq((java.sql.Date.valueOf("2024-01-03"), Seq(0.5))).toDF("day", "xs")
    val e = intercept[IllegalStateException] {
      t2.evolveSchema(incBad.schema, OnSchemaChange.SyncAllColumns)
    }
    assert(e.getMessage.contains("full-refresh"))
  }

  test("widenByRewrite matrix: reader-rejected but value-preserving set") {
    import SchemaEvolution._
    // accepted by rewrite (every on-disk value is cast) though the
    // sidecar-only path rejects them
    assert(widen(DateType, TimestampType).isEmpty)
    assert(widenByRewrite(DateType, TimestampType).contains(TimestampType))
    assert(widen(LongType, StringType).isEmpty)
    assert(widenByRewrite(LongType, StringType).contains(StringType))
    assert(widenByRewrite(DecimalType(10, 2), DoubleType).contains(DoubleType))
    // still impossible even with a rewrite: no common lossless type
    assert(widenByRewrite(LongType, DoubleType).isEmpty)
    assert(widenByRewrite(LongType, IntegerType).contains(LongType)) // narrower incoming casts up
    // nested leaf through the rewrite matrix
    val sD = StructType(Seq(StructField("at", DateType)))
    val sT = StructType(Seq(StructField("at", TimestampType)))
    assert(widen(sD, sT).isEmpty)
    assert(widenByRewrite(sD, sT).contains(sT))
  }

  test("sync_all_columns rewriteWidening: storage rewrite applies reader-rejected widenings") {
    val t = new TargetTable(spark, tmpDir("se_rewrite"), "day")
    t.init(Seq((java.sql.Date.valueOf("2024-01-01"), "a", 1L))
      .toDF("day", "k", "v"))
    val datesBefore = t.partitionDates
    // v goes long -> string: value-preserving, but historic INT64 files
    // cannot be READ as string, so the metadata-only path must refuse
    // and point at the opt-in
    val incoming = Seq((java.sql.Date.valueOf("2024-01-02"), "b", "two"))
      .toDF("day", "k", "v")
    val e = intercept[IllegalStateException] {
      t.evolveSchema(incoming.schema, OnSchemaChange.SyncAllColumns)
    }
    assert(e.getMessage.contains("rewriteWidening"))
    assert(t.read().schema("v").dataType == LongType, "refusal left the table intact")
    // with the opt-in, history is rewritten through the cast
    t.evolveSchema(incoming.schema, OnSchemaChange.SyncAllColumns,
      rewriteWidening = true)
    assert(t.read().schema("v").dataType == StringType)
    assert(t.partitionDates == datesBefore, "rewrite preserves day-partitions")
    t.append(incoming)
    val out = t.read().orderBy(col("day")).collect()
    assert(out.map(_.getString(2)).toSeq == Seq("1", "two"),
      "historic value cast in storage; new row appended under the new type")
    // genuinely incompatible still refuses WITH the opt-in, naming full-refresh
    val bad = Seq((java.sql.Date.valueOf("2024-01-03"), "c", 0.5))
      .toDF("day", "k", "v2").withColumnRenamed("v2", "v")
    val t2 = new TargetTable(spark, tmpDir("se_rewrite_bad"), "day")
    t2.init(Seq((java.sql.Date.valueOf("2024-01-01"), "a", 1L)).toDF("day", "k", "v"))
    val e2 = intercept[IllegalStateException] {
      t2.evolveSchema(bad.schema, OnSchemaChange.SyncAllColumns,
        rewriteWidening = true)
    }
    assert(e2.getMessage.contains("full-refresh"))
  }

  test("rewriteWidening does not destroy columns sync_all_columns drops") {
    // sync_all_columns' drop is sidecar-only HIDING (bytes stay on disk,
    // recoverable by re-adding the column). A model that transiently
    // omits a column while also triggering a storage rewrite must not
    // have that column's history physically destroyed as a side effect:
    // the rewrite carries it through, the sidecar hides it.
    val t = new TargetTable(spark, tmpDir("se_rewrite_drop"), "day")
    t.init(Seq((java.sql.Date.valueOf("2024-01-01"), "a", 1L, 42L))
      .toDF("day", "k", "v", "extra"))
    // incoming widens v long->string (storage rewrite) AND omits extra
    val incoming = Seq((java.sql.Date.valueOf("2024-01-02"), "b", "two"))
      .toDF("day", "k", "v")
    t.evolveSchema(incoming.schema, OnSchemaChange.SyncAllColumns,
      rewriteWidening = true)
    assert(t.read().columns.toSeq == Seq("day", "k", "v"),
      "dropped column hidden from the projected schema")
    assert(t.read().schema("v").dataType == StringType)
    // recovery: the model re-adds the column -> historic values resurface
    val back = Seq((java.sql.Date.valueOf("2024-01-03"), "c", "three", 7L))
      .toDF("day", "k", "v", "extra")
    t.evolveSchema(back.schema, OnSchemaChange.SyncAllColumns)
    t.append(back)
    val out = t.read().orderBy(col("day")).collect()
    assert(out.map(r => Option(r.get(3)).map(_.toString).orNull).toSeq ==
      Seq("42", "7"),
      "pre-rewrite history of the transiently dropped column survived the rewrite")
  }

  test("runner-level rewriteWidening: date column becomes timestamp mid-history") {
    val t = new TargetTable(spark, tmpDir("se_rewrite_run"), "day")
    val jan1 = LocalDate.of(2024, 1, 1)
    def model(tsTyped: Boolean): IbtpModel = IbtpModel.DfModel { (s, from, to) =>
      val base = table("events")
        .filter(col("ts") >= from && col("ts") < to)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(max(col("ts")).as("seen"))
      if (tsTyped) base else base.withColumn("seen", col("seen").cast("date"))
    }
    val cfg = IbtpConfig("day", Some(jan1), Some(jan1.plusDays(4)),
      onSchemaChange = OnSchemaChange.SyncAllColumns)
    IbtpRunner.run(spark, model(false), t,
      IbtpRunner.RunParams(cfg, today = jan1.plusDays(4)))
    assert(t.read().schema("seen").dataType == DateType)
    // catch-up run upgrades seen from DATE to TIMESTAMP via the opt-in
    val cfg2 = cfg.copy(stopDate = Some(jan1.plusDays(8)))
    IbtpRunner.run(spark, model(true), t,
      IbtpRunner.RunParams(cfg2, today = jan1.plusDays(8),
        rewriteWidening = true))
    val out = t.read()
    assert(out.schema("seen").dataType == TimestampType)
    assert(out.count() == 8)
    // historic days carry the midnight-preserving cast of their old DATE
    assert(out.filter(col("seen").cast("date") === col("day")).count() == 8)
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
