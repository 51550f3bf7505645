package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key trend segmentation — the reference's path-dependent event builder
  * (`data_apis/my_alpaca.py:19-111` + tiered thresholds
  * `my_helper.py:3-24`).
  *
  * Semantics: scan each key's price path in time order, tracking the
  * segment's reference (open) price and running high/low. When the price
  * moves beyond the price-tiered threshold factor from the reference
  * (|p/ref - 1| >= factor(ref)), emit the completed segment and restart it
  * at the crossing row. The final open segment is emitted at end-of-key
  * (mirrors `my_alpaca.py:98-109`).
  *
  * Scale: one shuffle on the key, then `sortWithinPartitions(key, ts)` +
  * an ITERATOR state machine over the partition — memory is O(1) per row,
  * never O(rows-per-key) (no per-group buffering: a skewed key cannot blow
  * the executor heap). The sort runs at full timestamp precision
  * (microseconds), unlike a `.getTime`-keyed in-memory sort.
  *
  * [[segmentTwoGranularity]] is the reference's two-granularity drill-down
  * (`my_alpaca.py:53-63`): the scan runs on COARSE bars; only when a
  * coarse bar's high/low crosses the band does it consult the
  * pre-loaded FINE rows inside that bar's window to find the precise
  * crossing row — the event ends at the fine row's timestamp and the next
  * segment restarts at its price. At 100 TB the fine table is only
  * touched for crossing windows (a time-range join, partition-prunable),
  * not scanned wholesale by the state machine.
  */
object TrendEvents {

  final case class PricePoint(key: Long, ts: java.sql.Timestamp, price: Double)
  final case class TrendEvent(
      key: Long, start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp,
      open: Double, high: Double, low: Double, close: Double,
      pct_change: Option[Double], n_points: Int, closed: Boolean)

  /** Band-crossing test with an EXPLICIT zero-reference policy. A raw
    * `abs(p/ref - 1) >= factor` silently diverges across engines once a
    * 0.0 price becomes a segment reference (sf0.1 has them): IEEE gives
    * p/0 = +inf (trips any band when p > 0; 0/0 = NaN never does) while
    * DuckDB defines double division by zero as NULL (never trips). The
    * policy here is the IEEE/pandas behavior of the reference
    * (my_alpaca.py's plain numpy division), written branch-explicitly so
    * the oracle can state the identical condition. */
  def crossingFrom(ref: Double, p: Double): Boolean =
    if (ref == 0.0) p > 0.0
    else math.abs(p / ref - 1.0) >= targetFactor(ref)

  /** Segment pct_change; None (SQL NULL) when the reference is 0 — the
    * IEEE value would be +inf/NaN, which no oracle can roundtrip. */
  def pctFrom(ref: Double, p: Double): Option[Double] =
    if (ref == 0.0) None else Some(p / ref - 1.0)

  /** Tagged merged-stream row for the two-granularity scan. tag 0 = coarse
    * bar marker (open/hi/lo/close of the window), tag 1 = fine tick. */
  final case class Tagged(key: Long, ts: java.sql.Timestamp, tag: Int,
                          hi: Double, lo: Double, open: Double,
                          price: Double, winEnd: java.sql.Timestamp)

  /** Price-tiered threshold factor (shape of my_helper.min_max_target). */
  def targetFactor(p: Double): Double =
    if (p < 1.0) 0.12
    else if (p < 10.0) 0.08
    else if (p < 50.0) 0.05
    else if (p < 200.0) 0.03
    else 0.02

  /** Single-granularity segmentation: iterator state machine over a
    * secondary-sorted partition stream. */
  def segment(points: Dataset[PricePoint]): Dataset[TrendEvent] = {
    import points.sparkSession.implicits._
    points
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts"))
      .mapPartitions { it =>
        new Iterator[TrendEvent] {
          private var start: PricePoint = _
          private var hi = 0.0; private var lo = 0.0; private var n = 0

          // emit-driven pull loop: advance the underlying iterator until an
          // event is produced or input is exhausted.
          private def closeOpen(last: PricePoint, emittedAny: Boolean): TrendEvent =
            if (start == null) null
            else if (n > 1 || !emittedAny)
              TrendEvent(start.key, start.ts, last.ts, start.price, hi, lo,
                last.price, pctFrom(start.price, last.price), n,
                closed = false)
            else null

          private var last: PricePoint = _
          private var emitted = false
          private var queued: TrendEvent = _

          private def advance(): Unit = {
            while (queued == null && it.hasNext) {
              val r = it.next()
              if (start == null || r.key != start.key) {
                // key change: flush the previous key's open segment
                val flush = closeOpen(last, emitted)
                start = r; hi = r.price; lo = r.price; n = 1
                last = r; emitted = false
                if (flush != null) { queued = flush; return }
              } else {
                hi = math.max(hi, r.price); lo = math.min(lo, r.price); n += 1
                last = r
                if (crossingFrom(start.price, r.price)) {
                  queued = TrendEvent(r.key, start.ts, r.ts, start.price, hi,
                    lo, r.price, pctFrom(start.price, r.price), n,
                    closed = true)
                  emitted = true
                  start = r; hi = r.price; lo = r.price; n = 1
                }
              }
            }
            if (queued == null && start != null) {
              val flush = closeOpen(last, emitted)
              start = null
              if (flush != null) queued = flush
            }
          }

          override def hasNext: Boolean = {
            if (queued == null) advance()
            queued != null
          }
          override def next(): TrendEvent = {
            if (!hasNext) throw new NoSuchElementException
            val r = queued; queued = null; r
          }
        }
      }
  }

  /** Two-granularity segmentation: coarse bars drive the scan; fine rows
    * are consulted only inside a coarse bar whose high/low crosses the
    * band, to locate the precise crossing (my_alpaca.py:53-63).
    *
    * `coarse`: (key, ts=window start, winEnd, hi, lo, close);
    * `fine`: (key, ts, price). Both merged into one secondary-sorted
    * stream — a coarse marker sorts before its window's fine rows.
    */
  def segmentTwoGranularity(coarse: DataFrame, fine: DataFrame): Dataset[TrendEvent] = {
    val spark = coarse.sparkSession
    import spark.implicits._
    val c = coarse.select(col("key").cast("long"), col("ts"), lit(0).as("tag"),
      col("hi").cast("double"), col("lo").cast("double"),
      col("open").cast("double"),
      col("close").cast("double").as("price"), col("winEnd")).as[Tagged]
    val f = fine.select(col("key").cast("long"), col("ts"), lit(1).as("tag"),
      col("price").cast("double").as("hi"),
      col("price").cast("double").as("lo"),
      col("price").cast("double").as("open"),
      col("price").cast("double"), col("ts").as("winEnd")).as[Tagged]
    c.unionByName(f)
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts"), col("tag"))
      .mapPartitions { it =>
        new Iterator[TrendEvent] {
          private var curKey = 0L
          private var haveKey = false
          private var startTs: java.sql.Timestamp = _
          private var ref = 0.0
          private var hi = 0.0; private var lo = 0.0; private var n = 0
          private var lastPrice = 0.0
          private var lastTs: java.sql.Timestamp = _
          private var fineUntil: java.sql.Timestamp = _
          private var emitted = false
          private val queue = scala.collection.mutable.Queue.empty[TrendEvent]

          private def flushOpen(): Unit =
            if (haveKey && (n > 1 || !emitted))
              queue += TrendEvent(curKey, startTs, lastTs, ref, hi, lo,
                lastPrice, pctFrom(ref, lastPrice), n, closed = false)

          private def advance(): Unit = {
            while (queue.isEmpty && it.hasNext) {
              val r = it.next()
              if (!haveKey || r.key != curKey) {
                flushOpen()
                // reference_price = first bar OPEN (my_alpaca.py:33);
                // running high/low start AT the reference, not bar hi/lo.
                curKey = r.key; haveKey = true; emitted = false
                fineUntil = null; startTs = r.ts
                ref = if (r.tag == 0) r.open else r.price
                hi = ref; lo = ref; n = 0
                lastPrice = ref; lastTs = r.ts
              }
              if (r.tag == 0) {
                // coarse bar drives the scan outside fine windows
                if (fineUntil != null && !r.ts.before(fineUntil)) fineUntil = null
                if (fineUntil == null) {
                  n += 1; lastPrice = r.price; lastTs = r.ts
                  val fac = targetFactor(ref)
                  // zero-ref policy (see crossingFrom): hi/0 = +inf trips
                  // the upper band iff hi > 0; lo/0 can never trip the
                  // lower one for non-negative prices
                  val hits =
                    if (ref == 0.0) r.hi > 0.0
                    else (r.hi / ref - 1.0 >= fac) ||
                         (r.lo / ref - 1.0 <= -fac)
                  if (hits) fineUntil = r.winEnd // drill into fine rows
                  else { hi = math.max(hi, r.hi); lo = math.min(lo, r.lo) }
                }
              } else if (fineUntil != null && r.ts.before(fineUntil)) {
                // fine tick inside a crossing window: precise lookup
                hi = math.max(hi, r.price); lo = math.min(lo, r.price)
                if (crossingFrom(ref, r.price)) {
                  queue += TrendEvent(curKey, startTs, r.ts, ref, hi, lo,
                    r.price, pctFrom(ref, r.price), n, closed = true)
                  emitted = true
                  startTs = r.ts; ref = r.price; hi = r.price; lo = r.price
                  n = 1; lastPrice = r.price; lastTs = r.ts; fineUntil = null
                }
              } // fine tick outside a crossing window: not consulted
            }
            if (queue.isEmpty && haveKey && !it.hasNext) {
              flushOpen()
              haveKey = false
            }
          }

          override def hasNext: Boolean = {
            if (queue.isEmpty) advance()
            queue.nonEmpty
          }
          override def next(): TrendEvent = {
            if (!hasNext) throw new NoSuchElementException
            queue.dequeue()
          }
        }
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

  /** Two-granularity adapter over the events fixture: coarse = hourly
    * candles (hi/lo/close per hour), fine = the raw ticks. */
  def refinedFromEvents(events: DataFrame, keyCol: String, tsCol: String,
                        priceCol: String): DataFrame = {
    val coarse = events
      .groupBy(col(keyCol).cast("long").as("key"),
               date_trunc("hour", col(tsCol)).as("ts"))
      .agg(max(priceCol).as("hi"), min(priceCol).as("lo"),
           min_by(col(priceCol), col(tsCol)).as("open"),
           max_by(col(priceCol), col(tsCol)).as("close"))
      .withColumn("winEnd", col("ts") + expr("INTERVAL 1 HOUR"))
    val fine = events.select(col(keyCol).cast("long").as("key"),
      col(tsCol).as("ts"), col(priceCol).as("price"))
    segmentTwoGranularity(coarse, fine).toDF()
  }
}
