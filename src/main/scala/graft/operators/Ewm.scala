package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponentially weighted mean — the reference's `ewm(alpha, adjust=False)`
  * (`data_alpaca/alpa.py:49-57`), which Spark has no builtin for.
  *
  * Two implementations (SURVEY §7.3's preference order):
  *
  *  1. [[recursive]] — exact pandas `adjust=False` semantics
  *     (y_t = α·x_t + (1-α)·y_{t-1}) via repartition + secondary sort +
  *     an O(1)-memory iterator scan. One shuffle; serial per key (the
  *     recurrence admits no frame rewrite); no per-group buffering.
  *
  *  2. [[fir]] — a K-term truncated, renormalized EWM
  *     (pandas `adjust=True` cut at K lags): y_t = Σ w_i·x_{t-i} / Σ w_i,
  *     w_i = (1-α)^i. Pure window algebra — one WindowExec, fully
  *     distributed AND oracle-verifiable bitwise (weights are literal
  *     doubles; the sum is a fixed left-associated chain, identical IEEE
  *     tree on any engine). Null until K rows exist (min_periods parity).
  */
object Ewm {

  final case class KV(key: Long, ts: java.sql.Timestamp, x: Double)
  final case class KVY(key: Long, ts: java.sql.Timestamp, x: Double, ewm: Double)

  def recursive(df: DataFrame, keyCol: String, tsCol: String, xCol: String,
                alpha: Double): DataFrame = {
    import df.sparkSession.implicits._
    val ds = df.select(col(keyCol).cast("long").as("key"),
      col(tsCol).as("ts"), col(xCol).cast("double").as("x")).as[KV]
    // Secondary sort, not per-group buffering: repartition on the key,
    // sort each partition by (key, ts) — full microsecond timestamp
    // precision, unlike a .getTime in-memory sort — and stream the rows
    // through an O(1)-memory scan that resets the recurrence on key
    // change. A skewed key costs sort spill, never executor heap.
    ds.repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts"))
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var haveKey = false
        var y = 0.0
        it.map { r =>
          if (!haveKey || r.key != curKey) {
            curKey = r.key; haveKey = true; y = r.x
          } else {
            y = alpha * r.x + (1.0 - alpha) * y
          }
          KVY(r.key, r.ts, r.x, y)
        }
      }.toDF()
  }

  /** FIR weights for [[fir]] — exposed so the oracle SQL can embed the
    * exact same double literals. */
  def firWeights(alpha: Double, k: Int): Seq[Double] =
    (0 until k).map(i => math.pow(1.0 - alpha, i))

  def fir(xCol: Column, w: org.apache.spark.sql.expressions.WindowSpec,
          alpha: Double, k: Int): Column = {
    val ws = firWeights(alpha, k)
    val terms = ws.zipWithIndex.map { case (wi, i) =>
      lit(wi) * lag(xCol, i).over(w)
    }
    val norm = ws.map(lit).reduce(_ + _)
    (terms.reduce(_ + _) / norm)
  }

  /** Integer-exact FIR weights: w_i quantized to a 1e-9 grid as longs.
    * A 32-term double addition chain is NOT portable across engines (DuckDB's
    * vectorized accumulator disagrees with a strict left fold in the last
    * ulp on ~0.6% of rows); quantizing weights and inputs makes the dot
    * product exact integer math — association-free, hence oracle-exact. */
  def firWeightsQ(alpha: Double, k: Int): Seq[Long] =
    firWeights(alpha, k).map(w => math.floor(w * 1e9 + 0.5).toLong)

  /** Quantized FIR EWM: inputs are quantized to `xScale` decimals
    * (exact for k-decimal data), weights to 1e-9; the result is
    * (Σ wq_i·xq_i) / (Σ wq_i · 10^xScale) computed from exact longs. */
  def firQ(xCol: Column, w: org.apache.spark.sql.expressions.WindowSpec,
           alpha: Double, k: Int, xScale: Int): Column = {
    val ws = firWeightsQ(alpha, k)
    val scale = math.pow(10.0, xScale)
    val xq = floor(xCol * scale + 0.5).cast("long")
    val terms = ws.zipWithIndex.map { case (wi, i) =>
      lit(wi) * lag(xq, i).over(w)
    }
    terms.reduce(_ + _).cast("double") /
      lit(ws.sum).cast("double") / lit(scale)
  }
}
