package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key trend segmentation — the reference's path-dependent event builder
  * (`data_apis/my_alpaca.py:19-111` + tiered thresholds
  * `my_helper.py:3-24`) re-expressed as a typed `groupByKey.flatMapGroups`
  * state machine.
  *
  * Semantics: scan each key's price path in time order, tracking the
  * segment's reference (open) price and running high/low. When the price
  * moves beyond the price-tiered threshold factor from the reference
  * (|p/ref - 1| >= factor(ref)), emit the completed segment and restart it
  * at the crossing row. The final open segment is emitted at end-of-key
  * (mirrors `my_alpaca.py:98-109`).
  *
  * Scale: one shuffle on the key; each group is scanned sequentially (the
  * recurrence is inherently serial per key — this is the `flatMapGroups`
  * case of SURVEY §2.10, not expressible as window algebra). Group rows are
  * sorted in-memory: bounded by rows-per-key (~100k for a decade of 30-min
  * bars), independent of total data size.
  */
object TrendEvents {

  final case class PricePoint(key: Long, ts: java.sql.Timestamp, price: Double)
  final case class TrendEvent(
      key: Long, start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp,
      open: Double, high: Double, low: Double, close: Double,
      pct_change: Double, n_points: Int, closed: Boolean)

  /** Price-tiered threshold factor (shape of my_helper.min_max_target). */
  def targetFactor(p: Double): Double =
    if (p < 1.0) 0.12
    else if (p < 10.0) 0.08
    else if (p < 50.0) 0.05
    else if (p < 200.0) 0.03
    else 0.02

  def segment(points: Dataset[PricePoint]): Dataset[TrendEvent] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (key, it) =>
      val rows = it.toIndexedSeq.sortBy(_.ts.getTime)
      val out = scala.collection.mutable.ArrayBuffer.empty[TrendEvent]
      if (rows.nonEmpty) {
        var start = rows.head
        var hi = start.price
        var lo = start.price
        var n = 1
        var i = 1
        while (i < rows.length) {
          val r = rows(i)
          hi = math.max(hi, r.price); lo = math.min(lo, r.price); n += 1
          val factor = targetFactor(start.price)
          if (math.abs(r.price / start.price - 1.0) >= factor) {
            out += TrendEvent(key, start.ts, r.ts, start.price, hi, lo,
              r.price, r.price / start.price - 1.0, n, closed = true)
            start = r; hi = r.price; lo = r.price; n = 1
          }
          i += 1
        }
        val last = rows.last
        if (n > 1 || out.isEmpty)
          out += TrendEvent(key, start.ts, last.ts, start.price, hi, lo,
            last.price, last.price / start.price - 1.0, n, closed = false)
      }
      out.iterator
    }
  }

  /** DataFrame adapter: (keyCol: long, tsCol: timestamp, priceCol: double). */
  def fromDf(df: DataFrame, keyCol: String, tsCol: String,
             priceCol: String): DataFrame = {
    import df.sparkSession.implicits._
    segment(df.select(
      col(keyCol).cast("long").as("key"),
      col(tsCol).as("ts"),
      col(priceCol).cast("double").as("price")).as[PricePoint]).toDF()
  }
}
