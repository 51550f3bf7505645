package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S7 — ETF holdings spreadsheet source (reference:
  * `/root/reference/data_apis/my_ishares.py:11-19`: read the iShares
  * holdings workbook, drop duplicate rows by Ticker).
  *
  * The workbook is PRE-CONVERTED to CSV outside the cluster (SURVEY §2.1:
  * xlsx is a zip of XML sheets — a driver-side one-time convert, not a
  * distributed-scan format; a 100 TB lakehouse ingests the *converted*
  * artifact). The convert step prepends an explicit `row_idx` column:
  * pandas' `drop_duplicates(subset=['Ticker'])` keeps the FIRST file-order
  * occurrence, and file order is a property a distributed reader must
  * carry as data to honor it deterministically.
  *
  * The loader owns the messy-spreadsheet surface: explicit schema (no
  * schema inference job), real-world column headers ("Weight (%)",
  * "Asset Class") normalized to engine-friendly names, and keep-first
  * semantics as a window rank on `row_idx` — one shuffle on ticker,
  * no driver-side pass.
  */
object HoldingsSource {

  /** Committed pre-converted fixture (one month-end IWM holdings pull). */
  val FixturePath = "/root/repo/fixtures/20240131_IWM_holdings.csv"

  /** Raw spreadsheet schema, in file column order (header names as the
    * vendor emits them). */
  val rawSchema: StructType = StructType(Seq(
    StructField("row_idx", LongType, nullable = false),
    StructField("Ticker", StringType),
    StructField("Name", StringType),
    StructField("Sector", StringType),
    StructField("Asset Class", StringType),
    StructField("Market Value", DoubleType),
    StructField("Weight (%)", DoubleType),
    StructField("Shares", DoubleType),
    StructField("Price", DoubleType)))

  /** Vendor header → engine column name (the F13 rename-map shape). */
  val renames: Seq[(String, String)] = Seq(
    "Ticker" -> "ticker", "Name" -> "name", "Sector" -> "sector",
    "Asset Class" -> "asset_class", "Market Value" -> "market_value",
    "Weight (%)" -> "weight_pct", "Shares" -> "shares", "Price" -> "price")

  /** Load a pre-converted holdings CSV with the vendor headers normalized. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .schema(rawSchema)
      .csv(path)
    renames.foldLeft(raw) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }
  }

  /** Keep-first dedup by ticker (my_ishares.py:18) — first occurrence in
    * file order, carried by `row_idx`. */
  def dedupByTicker(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("ticker").orderBy("row_idx")
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
