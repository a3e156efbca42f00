package graft.ibtp

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Half-open period bounds handed to the model for one loop iteration.
  * `from` inclusive, `to` exclusive, DATE-typed (`README.md:91-94`).
  */
final case class PeriodBounds(from: LocalDate, to: LocalDate) {
  /** DATE-typed literal Columns — usable in further calculations, like
    * the reference's substituted expressions (`README.md:94`). Constant
    * literals fold and push down into parquet scans.
    */
  def fromCol: Column = lit(java.sql.Date.valueOf(from))
  def toCol: Column   = lit(java.sql.Date.valueOf(to))
}

/** A user model: any query producing rows for one period at a time.
  *
  * The reference's model is arbitrary warehouse SQL containing the
  * placeholders `__PERIOD_FILTER_FROM__` / `__PERIOD_FILTER_TO__`
  * (`README.md:53-72,85-98`). We support both an idiomatic Column-
  * parametric form and a fidelity string-substitution form.
  */
trait IbtpModel {

  /** Produce this period's rows. Implementations MUST apply the bounds to
    * their sources so each period scans ~one period of input — that is
    * the whole scaling mechanism (the injected predicate reaches the
    * parquet scan via Catalyst pushdown + partition pruning).
    */
  def query(spark: SparkSession, bounds: PeriodBounds): DataFrame
}

object IbtpModel {
  val FromPlaceholder = "__PERIOD_FILTER_FROM__"
  val ToPlaceholder   = "__PERIOD_FILTER_TO__"

  /** Placeholder validation — reference A3 (`helpers.sql:63-72`).
    *
    * Fidelity note: the reference's condition is
    * `FROM not in sql AND TO not in sql` → raise; i.e. a query with only
    * ONE placeholder passes validation. We replicate the OR-pass
    * semantics deliberately (documented reference quirk, SURVEY §2 A3).
    */
  def checkPlaceholders(sql: String): Unit =
    if (!sql.contains(FromPlaceholder) && !sql.contains(ToPlaceholder))
      throw new IllegalArgumentException(
        s"model SQL must contain $FromPlaceholder and/or $ToPlaceholder " +
          "(reference: helpers.sql:63-72)")

  private val fmt = DateTimeFormatter.ISO_LOCAL_DATE

  /** Substitute the placeholders with DATE-typed SQL expressions — the
    * reference's core "predicate injection" A6 (`helpers.sql:94-104`).
    * Values may appear any number of times (`README.md:98`).
    */
  def bindSql(sql: String, bounds: PeriodBounds): String =
    sql
      .replace(FromPlaceholder, s"CAST('${fmt.format(bounds.from)}' AS DATE)")
      .replace(ToPlaceholder, s"CAST('${fmt.format(bounds.to)}' AS DATE)")

  /** Fidelity mode: a model given as literal SQL text with placeholders;
    * tables referenced must be resolvable in the session catalog (temp
    * views or saved tables). The bound SQL goes through the normal
    * Catalyst pipeline, so the injected constants still fold and push
    * down into scans.
    */
  final case class SqlModel(sqlText: String) extends IbtpModel {
    checkPlaceholders(sqlText)
    def query(spark: SparkSession, bounds: PeriodBounds): DataFrame =
      spark.sql(bindSql(sqlText, bounds))
  }

  /** Idiomatic mode: the model is a Scala function over Column bounds. */
  final case class DfModel(f: (SparkSession, Column, Column) => DataFrame) extends IbtpModel {
    def query(spark: SparkSession, bounds: PeriodBounds): DataFrame =
      f(spark, bounds.fromCol, bounds.toCol)
  }
}
