package graft

import org.apache.spark.sql.functions._

import graft.operators.TrendEvents
import graft.operators.TrendEvents.PricePoint

/** The streaming trend state machine must equal the batch operator's
  * CLOSED events over the union of all micro-batches — including a
  * segment whose reference price, extrema, and count cross the batch
  * boundary in state. (Open segments never stream out; the batch twin
  * flags them closed=false.)
  */
class StreamingTrendSpec extends SparkSpec {

  test("streaming segmentation equals batch closed events across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // key 1: p=100 ref → band 3%: 100, 101, [cut], 104 (closes: 104/100-1
    // = 4% ≥ 3%, hi=104 n=3) → new seg ref 104: 104, 100 (closes:
    // |100/104-1| ≈ 3.85% ≥ 3%) → open seg at 100 (never emitted).
    // key 2: 10, 10.4 → still open (4% < 8% band): nothing emitted.
    val batch1 = Seq(
      PricePoint(1L, ts("2024-01-01 00:00:00"), 100.0),
      PricePoint(1L, ts("2024-01-01 00:01:00"), 101.0),
      PricePoint(2L, ts("2024-01-01 00:00:30"), 10.0))
    val batch2 = Seq(
      PricePoint(1L, ts("2024-01-01 00:02:00"), 104.0),
      PricePoint(1L, ts("2024-01-01 00:03:00"), 100.0),
      PricePoint(2L, ts("2024-01-01 00:02:30"), 10.4))

    val expected = TrendEvents.segment((batch1 ++ batch2).toDS())
      .filter(col("closed"))
      .collect().toSet
    assert(expected.nonEmpty, "fixture produced no closed events")
    assert(expected.exists(e =>
        e.start_ts.before(ts("2024-01-01 00:02:00")) &&
        !e.end_ts.before(ts("2024-01-01 00:02:00"))),
      "fixture has no boundary-crossing segment")

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[PricePoint]
    val q = graft.streaming.StreamingOps.streamingTrend(mem.toDS())
      .writeStream.format("memory").queryName("trend_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("trend_out")
        .as[TrendEvents.TrendEvent].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }
}
