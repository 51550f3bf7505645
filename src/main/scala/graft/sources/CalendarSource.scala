package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S13 — the holiday-calendar dimension as ONE committed fixture instead of
  * per-query literals (reference: `USFederalHolidayCalendar` in
  * `/root/reference/data_apis/my_stock_functions.py:509-523`).
  *
  * The fixture carries multiple named calendars (federal holidays plus the
  * synthetic mid-range exchange closures the ml.prep median-fill tests
  * need), the way a real calendar dim does — consumers select by name. Three
  * call sites read it: `f16_days_since_holiday`,
  * [[graft.operators.GoldFeatures.Holidays]], and
  * `MlPrepQueries.holidayDim`; before this loader each carried its own
  * drift-prone literal copy.
  *
  * The calendar is parsed once at JVM level (it is a dimension of tens of
  * rows per DECADE — the one table that never needs a distributed scan) and
  * exposed three ways so every consumer shape stays optimal:
  *   - [[holidays]]: sorted date strings, for literal `when`-chain folds
  *     (GoldFeatures' fused single-pass plan — zero joins added);
  *   - [[dim]]: a DataFrame for broadcast as-of joins (f16, mlprep);
  *   - [[valuesSql]]: a `(VALUES ...)` fragment so every DuckDB oracle
  *     derives from the SAME rows and cannot drift from the Spark side.
  */
object CalendarSource {

  /** Committed fixture (see `fixtures/`); header `calendar,holiday,name`.
    * Resolved repo-relative first (tests and mains fork from the repo
    * root), falling back to the canonical checkout path so driver-side
    * invocations with a different cwd still work. */
  val FixturePath: String = {
    val rel = new java.io.File("fixtures/us_calendar_2024.csv")
    if (rel.exists()) rel.getPath
    else "/root/repo/fixtures/us_calendar_2024.csv"
  }

  /** calendar name → sorted ISO holiday dates, parsed once per JVM. */
  lazy val byCalendar: Map[String, Seq[String]] = {
    val src = scala.io.Source.fromFile(FixturePath)
    try {
      src.getLines().drop(1).filter(_.nonEmpty).toSeq
        .map { line =>
          val parts = line.split(",", 3)
          require(parts.length == 3 &&
            parts(1).matches("""\d{4}-\d{2}-\d{2}"""),
            s"malformed calendar row: $line")
          (parts(0), parts(1))
        }
        .groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted.distinct).toMap
    } finally src.close()
  }

  /** Sorted holiday dates of one named calendar (fails fast on a typo'd
    * name rather than silently yielding an empty calendar). */
  def holidays(calendar: String): Seq[String] =
    byCalendar.getOrElse(calendar,
      throw new IllegalArgumentException(
        s"unknown calendar '$calendar'; fixture has: " +
          byCalendar.keys.toSeq.sorted.mkString(", ")))

  /** The calendar as a 1-column broadcast-sized dim `holiday: date`. */
  def dim(s: SparkSession, calendar: String): DataFrame =
    s.createDataFrame(holidays(calendar).map(Tuple1(_)))
      .toDF("h").select(col("h").cast("date").as("holiday"))

  /** DuckDB `(VALUES (DATE '...'), ...) t(h)` over the same rows, for
    * oracle CTEs — single source of truth on both sides of the compare. */
  def valuesSql(calendar: String): String =
    holidays(calendar).map(h => s"(DATE '$h')").mkString("(VALUES ", ", ", ") t(h)")
}
