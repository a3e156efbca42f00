package graft.ibtp

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-period unit for the insert-by-timeperiod materialization.
  *
  * Mirrors the reference's period enum {day, week, month, year}, default
  * day (reference: `insert_by_timeperiod_materialization.sql:54`,
  * `README.md:82`). All arithmetic exists in two forms: driver-side
  * (`java.time.LocalDate`, used by the control plane — no Spark job
  * needed, unlike the reference which round-trips `DATEADD` to the
  * warehouse at `insert_by_timeperiod_helpers.sql:146-157`) and
  * column-side (`org.apache.spark.sql.Column`, codegen'd by Catalyst).
  */
sealed trait PeriodUnit {
  def name: String

  /** start + n periods (driver side). */
  def add(d: LocalDate, n: Int): LocalDate

  /** Whole periods between a and b, as the reference's `DATEDIFF(unit, a, b)`
    * computes it: T-SQL DATEDIFF counts *boundary crossings*, not elapsed
    * periods (reference: `insert_by_timeperiod_helpers.sql:128-132` via
    * dbt_utils.datediff). E.g. DATEDIFF(year, '2023-12-31', '2024-01-01') = 1.
    */
  def boundaryDiff(a: LocalDate, b: LocalDate): Long

  /** Column-side start + n periods; both `n` driver-int and Column forms. */
  def addCol(d: Column, n: Int): Column
}

object PeriodUnit {
  case object Day extends PeriodUnit {
    val name = "day"
    def add(d: LocalDate, n: Int): LocalDate = d.plusDays(n.toLong)
    def boundaryDiff(a: LocalDate, b: LocalDate): Long = ChronoUnit.DAYS.between(a, b)
    def addCol(d: Column, n: Int): Column = date_add(d, n)
  }
  case object Week extends PeriodUnit {
    val name = "week"
    def add(d: LocalDate, n: Int): LocalDate = d.plusWeeks(n.toLong)
    // T-SQL DATEDIFF(week,…) counts Sunday crossings; dbt-utils datediff on
    // Synapse delegates to it. We reproduce the boundary-crossing count
    // (weeks start Sunday, as SQL Server's default DATEFIRST=7 implies).
    def boundaryDiff(a: LocalDate, b: LocalDate): Long = {
      def weekIndex(d: LocalDate): Long = {
        // days since an epoch Sunday (1970-01-04 was a Sunday)
        val days = ChronoUnit.DAYS.between(LocalDate.of(1970, 1, 4), d)
        Math.floorDiv(days, 7L)
      }
      weekIndex(b) - weekIndex(a)
    }
    def addCol(d: Column, n: Int): Column = date_add(d, 7 * n)
  }
  case object Month extends PeriodUnit {
    val name = "month"
    def add(d: LocalDate, n: Int): LocalDate = d.plusMonths(n.toLong)
    def boundaryDiff(a: LocalDate, b: LocalDate): Long =
      (b.getYear.toLong * 12 + b.getMonthValue) - (a.getYear.toLong * 12 + a.getMonthValue)
    def addCol(d: Column, n: Int): Column = add_months(d, n)
  }
  case object Year extends PeriodUnit {
    val name = "year"
    def add(d: LocalDate, n: Int): LocalDate = d.plusYears(n.toLong)
    def boundaryDiff(a: LocalDate, b: LocalDate): Long = b.getYear.toLong - a.getYear
    def addCol(d: Column, n: Int): Column = add_months(d, 12 * n)
  }

  val all: Seq[PeriodUnit] = Seq(Day, Week, Month, Year)

  def fromString(s: String): PeriodUnit = s.trim.toLowerCase match {
    case "day"   => Day
    case "week"  => Week
    case "month" => Month
    case "year"  => Year
    case other =>
      throw new IllegalArgumentException(
        s"unknown period '$other' (expected one of day|week|month|year)")
  }
}
