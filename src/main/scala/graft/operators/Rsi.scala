package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wilder's RSI — the classic momentum oscillator over a per-key value
  * series (reference analog: the volatility feature family of
  * my_stock_functions.py; smoothing per Wilder 1978, the
  * `ewm(alpha=1/n, adjust=False)` recurrence applied to gains and losses).
  *
  * Both smoothed series ride ONE secondary-sorted O(1)-memory iterator
  * scan (the [[Ewm]] doctrine: repartition on the key, sort partitions by
  * (key, ts), stream with recurrence reset on key change — a skewed key
  * costs sort spill, never executor heap), computing delta, avg_gain,
  * avg_loss, and the RSI in a single pass instead of two Ewm.recursive
  * passes + a join.
  *
  * Parity: the recurrence doubles evaluate through the same expression
  * shapes as the recursive-CTE oracle, in the same per-key rank order, so
  * every float is bit-identical (the pl4 pattern). The loss leg uses
  * `0.0 - delta` (not `-delta`): a zero delta must contribute POSITIVE
  * zero on both engines — `greatest(-0.0, 0.0)` is engine-dependent about
  * which zero it returns, and the hash compare sees the sign bit.
  * Division guards: flat-so-far series (ag=al=0) pins RSI to 50,
  * loss-free series to 100 — no NaN/Inf ever reaches the output.
  */
object Rsi {

  final case class In(key: Long, ts: java.sql.Timestamp, x: Double)
  final case class Out(key: Long, ts: java.sql.Timestamp, x: Double,
                       delta: Option[Double], avg_gain: Option[Double],
                       avg_loss: Option[Double], rsi: Option[Double])

  def rsi(df: DataFrame, keyCol: String, tsCol: String, xCol: String,
          n: Int = 14): DataFrame = {
    import df.sparkSession.implicits._
    val alpha = 1.0 / n
    val ds = df.select(col(keyCol).cast("long").as("key"),
      col(tsCol).as("ts"), col(xCol).cast("double").as("x")).as[In]
    ds.repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts"))
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var haveKey = false
        var havePrev = false // seen the first delta row of this key yet
        var prev = 0.0
        var ag = 0.0
        var al = 0.0
        it.map { r =>
          if (!haveKey || r.key != curKey) {
            curKey = r.key; haveKey = true; havePrev = false
            prev = r.x
            Out(r.key, r.ts, r.x, None, None, None, None)
          } else {
            val delta = r.x - prev
            prev = r.x
            val g = math.max(delta, 0.0)
            val l = math.max(0.0 - delta, 0.0)
            if (!havePrev) { havePrev = true; ag = g; al = l }
            else {
              ag = alpha * g + (1.0 - alpha) * ag
              al = alpha * l + (1.0 - alpha) * al
            }
            val rsi =
              if (al == 0.0 && ag == 0.0) 50.0
              else if (al == 0.0) 100.0
              else 100.0 - 100.0 / (1.0 + ag / al)
            Out(r.key, r.ts, r.x, Some(delta), Some(ag), Some(al),
              Some(rsi))
          }
        }
      }.toDF()
  }
}
