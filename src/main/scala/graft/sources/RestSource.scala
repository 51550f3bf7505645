package graft.sources

import java.io.InputStream
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S8 — REST JSON ingestion adapter (the reference's EODHD index boundary,
  * `my_eodhd.py:8-18` list fetch, `:88-102` per-index fetch, `:103-121`
  * historical-constituent normalization).
  *
  * Division of labor, sized for 100 TB: the HTTP exchange is driver-side by
  * nature — a vendor index API returns KB-sized control-plane payloads
  * (index membership), never fact data — while everything after the fetch
  * is distributed: payload strings become a Dataset and are parsed by
  * `from_json` with a DECLARED schema (no inference pass, executors do the
  * parsing), normalization is plain Catalyst expressions. The fact-data
  * analog of this boundary (bulk bars) is S9's [[BatchedIngest]], which
  * merges per-batch DataFrames through the idempotent sink.
  *
  * Fetch semantics mirror the reference's branches plus the retry behavior
  * a production adapter needs:
  *   - 200 → payload ([[Ok]]);
  *   - 403 → [[Forbidden]], NO retry — the reference falls back to its last
  *     local snapshot on auth failure (`my_eodhd.py:14-16`), it does not
  *     hammer the endpoint;
  *   - 429 → honor `Retry-After` (seconds) when present, else exponential
  *     backoff, then retry;
  *   - 5xx → exponential backoff retry;
  *   - other 4xx → fail fast ([[HttpFetchException]], the reference's
  *     `raise Exception` branch `my_eodhd.py:17-18`).
  * Retries are capped; the sleeper is injectable so specs assert the exact
  * backoff schedule without wall-clock waits.
  */
object RestSource {

  sealed trait FetchResult
  final case class Ok(body: String) extends FetchResult
  /** 403 — caller switches to its local snapshot (reference fallback). */
  case object Forbidden extends FetchResult

  final class HttpFetchException(val code: Int, url: String, body: String)
    extends RuntimeException(
      s"Failed to fetch $url: $code - ${body.take(200)}")

  /** GET with bounded retries. Total attempts = maxRetries + 1.
    * Transient connection-level failures (refused, reset, timeout — any
    * IOException before a status line or mid-body) retry on the same
    * exponential schedule as 5xx: an ingestion job that dies on one
    * dropped TCP connection is not a production adapter. GETs are
    * idempotent, so the blind re-request is safe. */
  def get(url: String,
          maxRetries: Int = 4,
          baseBackoffMs: Long = 200L,
          connectTimeoutMs: Int = 10000,
          readTimeoutMs: Int = 30000,
          sleep: Long => Unit = Thread.sleep): FetchResult = {
    var attempt = 0
    var lastCode = -1
    var lastBody = ""
    while (attempt <= maxRetries) {
      val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("GET")
      conn.setRequestProperty("Accept", "application/json")
      try {
        val codeOpt =
          try Some(conn.getResponseCode)
          catch {
            case e: java.io.IOException =>
              lastCode = -1
              lastBody = s"connection failure: ${e.getMessage}"
              None
          }
        // The body read shares the status read's IOException envelope for
        // RETRYABLE statuses: a reset mid-payload after a 200 is as
        // transient as a refused connect and a GET re-request is safe.
        // But the status line itself is AUTHORITATIVE — a mid-body
        // failure after a TERMINAL status (403 → snapshot fallback, other
        // 4xx → fail) keeps its terminal semantics instead of retrying as
        // a generic connection failure: lastCode preserves the status,
        // and the dispatch below handles it before any retry sleep.
        var midBodyCode = -1
        val bodyOpt = codeOpt.flatMap { code =>
          try Some((code, readAll(
            if (code >= 400) conn.getErrorStream else conn.getInputStream)))
          catch {
            case e: java.io.IOException =>
              // lastCode stays -1 (the transport-failure sentinel): if a
              // RETRYABLE status (200/429/5xx) keeps dying mid-body until
              // retries exhaust, the terminal exception must read as
              // "never got the payload", not as a nonsensical
              // HTTP-200/500 failure. Terminal statuses never reach
              // exhaustion — the dispatch below returns/throws on
              // midBodyCode before any retry.
              lastCode = -1
              midBodyCode = code
              lastBody = s"mid-body failure (status $code): ${e.getMessage}"
              None
          }
        }
        bodyOpt match {
          case Some((code, body)) =>
            code match {
              case 200 => return Ok(body)
              case 403 => return Forbidden
              case 429 =>
                lastCode = code; lastBody = body
                // no sleep after the final attempt — the caller gets the
                // exception immediately, not a backoff it can't use.
                // Retry-After is vendor input: negative values would make
                // Thread.sleep throw and a huge value would park the
                // driver, so out-of-range headers fall back to the
                // exponential schedule and in-range ones are capped.
                if (attempt < maxRetries) sleep(
                  Option(conn.getHeaderField("Retry-After"))
                    .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
                    .filter(_ >= 0L)
                    // cap BEFORE the seconds→millis multiply: a huge
                    // parseable value would overflow Long negative and
                    // crash Thread.sleep — the exact failure this branch
                    // exists to absorb
                    .map(s => math.min(s, MaxRetryAfterMs / 1000L) * 1000L)
                    .getOrElse(backoffMs(baseBackoffMs, attempt)))
              case c if c >= 500 =>
                lastCode = code; lastBody = body
                if (attempt < maxRetries)
                  sleep(backoffMs(baseBackoffMs, attempt))
              case c =>
                throw new HttpFetchException(c, url, body)
            }
          case None =>
            // terminal statuses stay terminal even when their body read
            // died: a 403's Forbidden signal (the caller's snapshot-
            // fallback trigger) and a 4xx's hard failure don't depend on
            // payload bytes the vendor never delivered
            if (midBodyCode == 403) return Forbidden
            if (midBodyCode >= 400 && midBodyCode < 500 &&
                midBodyCode != 429)
              throw new HttpFetchException(midBodyCode, url, lastBody)
            // pre-status connection failure or mid-body on a retryable
            // status (200/429/5xx): the 5xx schedule
            if (attempt < maxRetries)
              sleep(backoffMs(baseBackoffMs, attempt))
        }
      } finally conn.disconnect()
      attempt += 1
    }
    throw new HttpFetchException(lastCode, url, lastBody)
  }

  /** [[get]] that must succeed — Forbidden is an error here (used where the
    * caller has no snapshot to fall back to, `my_eodhd.py:94-97`). */
  def getOk(url: String,
            maxRetries: Int = 4,
            baseBackoffMs: Long = 200L,
            sleep: Long => Unit = Thread.sleep): String =
    get(url, maxRetries, baseBackoffMs, sleep = sleep) match {
      case Ok(b)     => b
      case Forbidden => throw new HttpFetchException(403, url, "forbidden")
    }

  /** Upper bound on an honored Retry-After (vendor input must not be able
    * to park the driver arbitrarily long). */
  private val MaxRetryAfterMs = 30000L

  private def backoffMs(base: Long, attempt: Int): Long =
    base << math.min(attempt, 16)

  private def readAll(in: InputStream): String =
    if (in == null) ""
    else try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()

  // ---------------------------------------------------------------------
  // Payload → DataFrame (distributed parse, declared schemas)
  // ---------------------------------------------------------------------

  /** Vendor index-list element, pre-rename (`my_eodhd.py:64-84`). All
    * scalar payload fields are declared STRING and cast after parse — a
    * vendor feed's number formatting is not a schema contract. */
  private val indexFields: StructType = StructType(Seq(
    StructField("ID", StringType),
    StructField("Code", StringType),
    StructField("Name", StringType),
    StructField("Constituents", LongType),
    StructField("CurrencyCode", StringType),
    StructField("LastUpdate", StringType)))

  /** Vendor constituent element, pre-rename (`my_eodhd.py:123-139`). */
  private val componentFields: StructType = StructType(Seq(
    StructField("Code", StringType),
    StructField("Name", StringType),
    StructField("Sector", StringType),
    StructField("StartDate", StringType),
    StructField("EndDate", StringType),
    StructField("Weight", StringType),
    StructField("IsActiveNow", BooleanType)))

  /** Parse the index-list payload (one JSON array) into the renamed frame
    * (`MyMarketIndexList.rename_columns`, `my_eodhd.py:64-84`). */
  def indexList(spark: SparkSession, payload: String): DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(payload))
      .select(from_json(col("value"), ArrayType(indexFields)).as("a"))
      .select(explode(col("a")).as("i"))
      .select(
        col("i.ID").as("full_symbol"),
        col("i.Code").as("symbol"),
        col("i.Name").as("name"),
        col("i.Constituents").as("constituents_count"),
        col("i.CurrencyCode").as("currency_code"),
        col("i.LastUpdate").as("last_update"))
  }

  /** Parse per-index detail payloads into the CURRENT constituents
    * (`get_index_current_constituents`, `my_eodhd.py:123-130`): the
    * `Components` JSON map's values become rows under the same renames —
    * no date normalization, current membership carries none. */
  def currentConstituents(spark: SparkSession,
                          payloads: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val doc = StructType(Seq(StructField(
      "Components", MapType(StringType, componentFields))))
    spark.createDataset(payloads).toDF("index_symbol", "payload")
      .select(col("index_symbol"),
        explode(map_values(from_json(col("payload"), doc)("Components")))
          .as("c"))
      .select(
        col("index_symbol"),
        col("c.Code").as("symbol"),
        col("c.Name").as("name"),
        col("c.Sector").as("sector"),
        col("c.Weight").cast(DoubleType).as("weight"),
        col("c.IsActiveNow").as("is_active_in_index"))
  }

  /** Parse per-index detail payloads and normalize the historical
    * constituents (`get_index_historical_constituents`,
    * `my_eodhd.py:103-121`): the `HistoricalTickerComponents` JSON map's
    * VALUES become rows (`constituents.values()`), `index_symbol`
    * identifies the source index (`my_eodhd.py:42`), and null/empty
    * start/end dates fill with the reference's open-interval sentinels
    * 1950-01-01 / 2199-12-31 (`my_eodhd.py:110-113`).
    *
    * One input row per index; the map explode fans out to constituents on
    * executors, so a 10k-index crawl parses in parallel. */
  def historicalConstituents(spark: SparkSession,
                             payloads: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val doc = StructType(Seq(StructField(
      "HistoricalTickerComponents",
      MapType(StringType, componentFields))))
    def filled(c: Column, sentinel: String): Column =
      when(c.isNull || c === "", lit(sentinel)).otherwise(c)
    spark.createDataset(payloads).toDF("index_symbol", "payload")
      .select(col("index_symbol"),
        explode(map_values(
          from_json(col("payload"), doc)("HistoricalTickerComponents")))
          .as("c"))
      .select(
        col("index_symbol"),
        col("c.Code").as("symbol"),
        col("c.Name").as("name"),
        col("c.Sector").as("sector"),
        filled(col("c.StartDate"), "1950-01-01").as("start_date"),
        filled(col("c.EndDate"), "2199-12-31").as("end_date"),
        col("c.Weight").cast(DoubleType).as("weight"),
        col("c.IsActiveNow").as("is_active_in_index"))
  }
}
