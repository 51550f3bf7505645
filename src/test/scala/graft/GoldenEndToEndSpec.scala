package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §5 "Golden end-to-end": mini bronze CSV fixture → Silver
  * (complete hourly grid + forward fill) → Gold (the 15-feature battery)
  * with hand-derived expected values. 2 keys × 10 days; prices follow a
  * closed form (close(k, d) = 100·k + d) so every expectation below is an
  * arithmetic identity, independently derived — not a call back into the
  * library.
  */
class GoldenEndToEndSpec extends SparkSpec {

  private def approx(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9

  private lazy val (silver, gold) = {
    import spark.implicits._
    // bronze: 2 keys × 10 days (2024-01-08..17) × 3 events (04:00 pm,
    // 10:00, 15:00); close(k,d) = 100k + d, open(k,d) = close - 0.5
    val rows = for {
      k <- Seq(1L, 2L); d <- 0 until 10
      (hh, v) <- Seq((4, 100.0 * k + d - 0.5), (10, 100.0 * k + d - 0.2),
                     (15, 100.0 * k + d))
    } yield (k, ts(f"2024-01-${8 + d}%02d $hh%02d:00:00"), v)
    val dir = java.nio.file.Files.createTempDirectory("graft_golden").toString
    // bronze CSV roundtrip: S6 sink → S5 schema'd source
    rows.toDF("user_id", "ts", "value")
      .write.mode("overwrite").option("header", "true").csv(s"$dir/bronze")
    val bronze = spark.read
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("header", "true").csv(s"$dir/bronze")

    // Silver: per-key complete hourly grid clipped to the active range,
    // forward-filled close (the pl1 shape)
    val hourly = bronze.repartition(col("user_id"))
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("slot"))
      .agg(max_by(col("value"), col("ts")).as("close"))
    val ranges = hourly.groupBy("user_id")
      .agg(min("slot").as("lo"), max("slot").as("hi"))
    val grid = ranges.select(col("user_id"),
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("slot"))
    val wFill = Window.partitionBy("user_id").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val silver = grid.join(hourly, Seq("user_id", "slot"), "left")
      .select(col("user_id"), col("slot"),
        last("close", ignoreNulls = true).over(wFill).as("close_ffill"))

    // Gold: the full feature battery over the bronze events
    val gold = graft.operators.GoldFeatures.goldTable(bronze)
      .orderBy("user_id", "day").collect()
    (silver, gold)
  }

  test("silver grid is complete per key and forward fill is total") {
    // active range 04:00 day0 .. 15:00 day9 = 9*24 + 11 + 1 hourly slots
    val counts = silver.groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(counts == Map(1L -> 228L, 2L -> 228L))
    assert(silver.filter(col("close_ffill").isNull).count() == 0)
  }

  test("gold features match the closed-form expectations") {
    assert(gold.length == 20)
    def row(k: Long, d: Int) = gold((k.toInt - 1) * 10 + d)
    def close(k: Long, d: Int) = 100.0 * k + d
    // prev_day_return(k, d) = close(d-1)/close(d-2) - 1
    for (k <- Seq(1L, 2L); d <- 2 until 10) {
      val r = row(k, d)
      assert(approx(r.getAs[Double]("prev_day_return"),
        close(k, d - 1) / close(k, d - 2) - 1.0), s"pdr k=$k d=$d")
    }
    // gap_pct(k, d) = (pm_open - prev_close)/prev_close;
    // pm_open(k,d) = close(k,d) - 0.5, prev_close = close(k, d-1)
    for (k <- Seq(1L, 2L); d <- 1 until 10) {
      val r = row(k, d)
      val exp = (close(k, d) - 0.5 - close(k, d - 1)) / close(k, d - 1)
      assert(approx(r.getAs[Double]("gap_pct"), exp), s"gap k=$k d=$d")
    }
    // range_rel_last1d(k, d) = (high - low)/close of day d-1 = 0.5/close
    for (k <- Seq(1L, 2L); d <- 1 until 10) {
      val r = row(k, d)
      val exp = 0.5 / close(k, d - 1)
      assert(approx(r.getAs[Double]("range_rel_last1d"), exp), s"rr k=$k d=$d")
    }
    // one premarket candle per day → HHI exactly 1; pm vwap return =
    // pm_open/prev_reg_close - 1 (single-event pm candle)
    for (k <- Seq(1L, 2L); d <- 1 until 10) {
      val r = row(k, d)
      assert(approx(r.getAs[Double]("hhi_premarket_volume"), 1.0))
      assert(approx(r.getAs[Double]("pm_vwap_return"),
        (close(k, d) - 0.5) / close(k, d - 1) - 1.0), s"pmv k=$k d=$d")
    }
    // Jan 8 2024 is a Monday; weekday one-hot cycles Mon..Fri then weekend
    assert(row(1L, 0).getAs[Int]("weekday_0") == 1)
    assert(row(1L, 4).getAs[Int]("weekday_4") == 1)
    // 20-day-gated features are null on a 10-day sample
    for (k <- Seq(1L, 2L); d <- 0 until 10; c <- Seq("rvol_20d",
        "dist_max_20d", "z_pm", "r_pm_hist_q")) {
      val r = row(k, d)
      assert(r.isNullAt(r.fieldIndex(c)), s"$c should be null k=$k d=$d")
    }
  }
}
