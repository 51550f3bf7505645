package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S7 — ETF holdings spreadsheet source (reference:
  * `/root/reference/data_apis/my_ishares.py:11-19`: read the iShares
  * holdings workbook, drop duplicate rows by Ticker).
  *
  * The engine ingests the VENDOR WORKBOOK directly: [[XlsxSource]] is a
  * pure-JVM xlsx parser (java.util.zip + JDK StAX) that runs on executors
  * through the `binaryFile` source — a directory of monthly workbooks
  * scans as one distributed DataFrame. `row_idx` is synthesized from sheet
  * row order, because pandas' `drop_duplicates(subset=['Ticker'])` keeps
  * the FIRST file-order occurrence and file order is a property a
  * distributed reader must carry as data to honor it deterministically.
  *
  * The committed CSV twin of the fixture exists ONLY for the DuckDB oracle
  * (which cannot read xlsx); [[XlsxSourceSpec]] pins the two views
  * row-for-row equal, so the oracle still checks the workbook path
  * end-to-end.
  *
  * This loader owns the messy-spreadsheet surface: real-world vendor
  * headers ("Weight (%)", "Asset Class") normalized to engine-friendly
  * names during parse (the F13 rename-map shape), and keep-first semantics
  * as a window rank on `row_idx` — one shuffle on ticker, no driver-side
  * pass.
  */
object HoldingsSource {

  /** Committed vendor workbook fixture (one month-end IWM holdings pull),
    * generated reproducibly by `scripts/make_xlsx_fixture.py`. */
  val FixturePath = "/root/repo/fixtures/20240131_IWM_holdings.xlsx"

  /** CSV twin of [[FixturePath]] for the DuckDB oracle (same rows, plus an
    * explicit `row_idx` column carrying the file order the workbook
    * expresses positionally). */
  val OracleCsvPath = "/root/repo/fixtures/20240131_IWM_holdings.csv"

  /** CSV-twin schema, in file column order (header names as the vendor
    * emits them; `row_idx` prepended by the convert). */
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

  /** Load holdings: `.xlsx` paths parse distributed via [[XlsxSource]];
    * anything else is read as the pre-converted CSV layout. Both produce
    * the same normalized columns in the same order. */
  def load(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".xlsx")) XlsxSource.holdings(spark, path)
    else loadCsv(spark, path)

  /** The CSV-twin read (oracle parity + legacy pre-converted feeds). */
  def loadCsv(spark: SparkSession, path: String): DataFrame = {
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
