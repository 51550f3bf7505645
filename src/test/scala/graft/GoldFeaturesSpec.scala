package graft

import org.apache.spark.sql.functions._
import graft.operators.GoldFeatures

/** Golden parity for the 15-feature Gold battery: a tiny hand-computable
  * fixture (1 user, 3 days, known hours) with expectations derived by hand
  * from the reference semantics (my_stock_functions.py). The full-scale
  * independent check is the pl14_gold_full DuckDB oracle row.
  */
class GoldFeaturesSpec extends SparkSpec {

  private lazy val gold = {
    import spark.implicits._
    // Mon Jan 8 / Tue Jan 9 / Wed Jan 10, 2024; hours 4 (premarket),
    // 10 and 15 (regular)
    val rows = Seq(
      (1L, ts("2024-01-08 04:00:00"), 10.0),
      (1L, ts("2024-01-08 10:00:00"), 12.0),
      (1L, ts("2024-01-08 15:00:00"), 11.0),
      (1L, ts("2024-01-09 05:00:00"), 11.5),
      (1L, ts("2024-01-09 10:00:00"), 13.0),
      (1L, ts("2024-01-09 15:00:00"), 12.0),
      (1L, ts("2024-01-10 04:00:00"), 12.5),
      (1L, ts("2024-01-10 10:00:00"), 12.0),
      (1L, ts("2024-01-10 15:00:00"), 14.0))
      .toDF("user_id", "ts", "value")
    GoldFeatures.goldTableFold(rows).orderBy("day").collect()
  }

  private def row(i: Int) = gold(i)
  private def d(i: Int, c: String): Double = row(i).getAs[Double](c)
  private def approx(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9

  test("daily spine and hand-computed feature values") {
    assert(gold.length == 3)
    // prev_day_return on day 3 = close(d2)/close(d1) - 1 = 12/11 - 1
    assert(approx(d(2, "prev_day_return"), 12.0 / 11.0 - 1.0))
    // gap_pct day2 = (pm_open 11.5 - prev_close 11)/11; day1 has no prev → 0
    assert(d(0, "gap_pct") == 0.0)
    assert(approx(d(1, "gap_pct"), (11.5 - 11.0) / 11.0))
    // range_rel_last1d day2 = (high1-low1)/close1 = (12-10)/11
    assert(approx(d(1, "range_rel_last1d"), 2.0 / 11.0))
    // single-event candles have no range → day-1 wick means are 0
    assert(approx(d(1, "upper_wick_ratio_last1d"), 0.0))
    assert(approx(d(1, "lower_wick_ratio_last1d"), 0.0))
    // Jan 8 2024 is a Monday: weekday_0 = 1, sin(0)=0, cos(0)=1
    assert(row(0).getAs[Int]("weekday_0") == 1)
    assert(approx(d(0, "weekday_sin"), 0.0))
    assert(approx(d(0, "weekday_cos"), 1.0))
    // days since the Jan 1 holiday
    assert(row(0).getAs[Int]("days_since_holiday") == 7)
    assert(row(2).getAs[Int]("days_since_holiday") == 9)
    // one premarket candle → HHI exactly 1
    assert(approx(d(0, "hhi_premarket_volume"), 1.0))
    // pm vwap return day2 = vwap_pm(11.5) / reg_close(day1, 11) - 1
    assert(approx(d(1, "pm_vwap_return"), 11.5 / 11.0 - 1.0))
    // 20-day-gated features are null this early
    assert(row(2).isNullAt(row(2).fieldIndex("rvol_20d")))
    assert(row(2).isNullAt(row(2).fieldIndex("dist_max_20d")))
    assert(row(2).isNullAt(row(2).fieldIndex("z_pm")))
    assert(row(2).isNullAt(row(2).fieldIndex("r_pm_hist_q")))
    // std_return_last5d needs 5 days
    assert(row(2).isNullAt(row(2).fieldIndex("std_return_last5d")))
  }

  test("gold table is one row per (user_id, day) with all 21 feature columns") {
    val cols = Set("prev_day_return", "std_return_last5d", "range_rel_last1d",
      "rvol_20d", "gap_pct", "dist_max_20d", "upper_wick_ratio_last1d",
      "lower_wick_ratio_last1d", "weekday_0", "weekday_1", "weekday_2",
      "weekday_3", "weekday_4", "weekday_sin", "weekday_cos",
      "days_since_holiday", "hhi_premarket_volume", "z_pm", "r_pm_hist_q",
      "pm_vwap_return")
    assert(cols.subsetOf(gold.head.schema.fieldNames.toSet))
  }
}
