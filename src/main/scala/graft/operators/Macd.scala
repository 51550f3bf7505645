package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MACD (moving-average convergence/divergence) — fast EWM − slow EWM,
  * plus the signal line (an EWM of the MACD itself) and the histogram
  * (reference analog: the volatility/momentum feature family of
  * my_stock_functions.py; standard 12/26/9 spans, pandas
  * `ewm(span=n, adjust=False)` ⇒ α = 2/(n+1)).
  *
  * The signal line is a recurrence over a DERIVED series (the MACD), so a
  * window/FIR formulation can't express it — but all three recurrences
  * advance row-by-row in the same key order, so ONE secondary-sorted
  * O(1)-memory scan (the [[Ewm]]/[[Rsi]] doctrine) carries three state
  * doubles and emits macd/signal/histogram per row. The oracle replays
  * the same three states through one recursive CTE; float parity holds
  * because both engines evaluate identical IEEE trees in identical
  * per-key rank order.
  */
object Macd {

  final case class In(key: Long, ts: java.sql.Timestamp, x: Double)
  final case class Out(key: Long, ts: java.sql.Timestamp, x: Double,
                       ewm_fast: Double, ewm_slow: Double, macd: Double,
                       signal: Double, histogram: Double)

  /** pandas ewm(span=n, adjust=False) smoothing factor. */
  def alpha(span: Int): Double = 2.0 / (span + 1.0)

  def macd(df: DataFrame, keyCol: String, tsCol: String, xCol: String,
           fast: Int = 12, slow: Int = 26, signal: Int = 9): DataFrame = {
    import df.sparkSession.implicits._
    val (aF, aS, aG) = (alpha(fast), alpha(slow), alpha(signal))
    val ds = df.select(col(keyCol).cast("long").as("key"),
      col(tsCol).as("ts"), col(xCol).cast("double").as("x")).as[In]
    ds.repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts"))
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var haveKey = false
        var yF = 0.0; var yS = 0.0; var yG = 0.0
        it.map { r =>
          if (!haveKey || r.key != curKey) {
            curKey = r.key; haveKey = true
            yF = r.x; yS = r.x; yG = yF - yS // = 0.0: first macd seeds it
          } else {
            yF = aF * r.x + (1.0 - aF) * yF
            yS = aS * r.x + (1.0 - aS) * yS
            yG = aG * (yF - yS) + (1.0 - aG) * yG
          }
          Out(r.key, r.ts, r.x, yF, yS, yF - yS, yG, (yF - yS) - yG)
        }
      }.toDF()
  }

  /** The oracle-side recursive CTE carrying the same three states — kept
    * next to the recurrence so the two can't drift. `src` must expose
    * (user_id, ts, value). */
  def oracleSql(src: String, fast: Int = 12, slow: Int = 26,
                signal: Int = 9): String = {
    // alphas as DIVISION EXPRESSIONS, not evaluated literals: DuckDB
    // parses a 17-digit decimal literal as DECIMAL (its double value can
    // differ from 2.0/13.0 in the last ulp — measured 1e-13 recursion
    // drift); "2.0 / 13.0" runs the same correctly-rounded double divide
    // Scala's alpha() does.
    val aF = s"(2.0 / ${fast + 1}.0)"
    val aS = s"(2.0 / ${slow + 1}.0)"
    val aG = s"(2.0 / ${signal + 1}.0)"
    s"""WITH RECURSIVE o AS (
       |  SELECT user_id, ts, value,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
       |  FROM $src),
       |r AS (
       |  SELECT user_id, ts, value, rn,
       |    value AS yf, value AS ys, value - value AS yg
       |  FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT o.user_id, o.ts, o.value, o.rn,
       |    $aF * o.value + (1.0 - $aF) * r.yf,
       |    $aS * o.value + (1.0 - $aS) * r.ys,
       |    $aG * (($aF * o.value + (1.0 - $aF) * r.yf) -
       |           ($aS * o.value + (1.0 - $aS) * r.ys))
       |      + (1.0 - $aG) * r.yg
       |  FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
       |SELECT user_id, ts, value, yf AS ewm_fast, ys AS ewm_slow,
       |  yf - ys AS macd, yg AS signal, (yf - ys) - yg AS histogram
       |FROM r""".stripMargin
  }
}
