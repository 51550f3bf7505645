package graft.queries

import graft.{QueryDef, Tables}
import graft.Parity.{lq, oLq}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY §2.5 window functions — the reference's workhorse family. All
  * windows are PARTITION BY user_id ORDER BY ts ((user_id, ts) is unique, so
  * every frame is deterministic).
  *
  * Scale notes: one hash-partition shuffle on user_id serves every window
  * here; Catalyst chains same-partitioning WindowExecs without re-exchange.
  * Frames are row-bounded so state per partition is O(frame), not O(n).
  *
  * Parity notes: rolling sums/means/stds go through exact DECIMAL window
  * aggregation (order-independent in both engines); pandas `min_periods`
  * semantics (null until the frame is full) are enforced with count-gates,
  * which the reference requires for parity anyway (SURVEY §4).
  */
object WindowQueries {

  private val DEC = DecimalType(30, 6)
  private def wsum(c: Column, w: WindowSpec): Column =
    sum(c.cast(DEC)).over(w).cast("double")
  /** Oracle text for a decimal-exact window sum over `frame`. */
  private def oWsum(x: String, frame: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(30,6))) OVER ($frame) AS DOUBLE)"

  private val oW = "PARTITION BY user_id ORDER BY ts"

  val all: Seq[QueryDef] = Seq(

    // W5b: the lag battery at the REFERENCE's offsets over the reference's
    // grid (Procesamiento_fase_2.ipynb:113): a 32-slot-per-day New-York
    // WALL-CLOCK grid (30-min slots from 04:00, the trading-day band that
    // never touches the 2-3am DST skip) spanning BOTH 2023/2024 US DST
    // transitions, so lag(32)=same slot prev day, lag(224)=prev week,
    // lag(11680)=same wall-clock slot 365 grid-days back — all DST-exact.
    // Grid generated DISTRIBUTED (sequence+explode per key from the events
    // key universe); values are portable hashes so both engines agree.
    QueryDef(
      "w5b_lag_battery_dst",
      Some {
        val lags = Seq(1, 32, 224, 11680).map(k =>
          s"lag(value, $k) OVER (PARTITION BY user_id ORDER BY utc) AS lag_$k")
          .mkString(",\n  ")
        s"""WITH users AS (
           |  SELECT DISTINCT user_id FROM events WHERE user_id < 3),
           |grid AS (
           |  SELECT user_id, d AS day, CAST(s AS INT) AS slot,
           |    CAST(d AS TIMESTAMP) + INTERVAL 4 HOUR +
           |      s * (INTERVAL 30 MINUTE) AS wall
           |  FROM users,
           |    unnest(CAST(generate_series(DATE '2023-04-01',
           |      DATE '2024-04-30', INTERVAL 1 DAY) AS DATE[])) t(d),
           |    unnest(generate_series(0, 31)) u(s)),
           |vals AS (
           |  SELECT user_id, day, slot, wall,
           |    CAST(timezone('America/New_York', wall) AS TIMESTAMP) AS utc,
           |    CAST('0x' || substr(md5(concat_ws(':', user_id, day, slot)),
           |      1, 8) AS BIGINT) AS value
           |  FROM grid)
           |SELECT user_id, day, slot, wall, utc, value,
           |  $lags
           |FROM vals""".stripMargin
      },
      (s, d) => {
        val lags = Seq(1, 32, 224, 11680)
        // 3 keys keep the verify dump small; each key still carries the
        // full 396-day x 32-slot grid (12,672 rows > the 11,680 max lag).
        val users = Tables.events(s, d)
          .filter(col("user_id") < 3).select("user_id").distinct()
        val vals = graft.operators.TradingGrid.nyGrid(users,
            java.time.LocalDate.parse("2023-04-01"),
            java.time.LocalDate.parse("2024-04-30"))
          .withColumn("value",
            conv(substring(md5(concat_ws(":", col("user_id"), col("day"),
              col("slot"))), 1, 8), 16, 10).cast("long"))
        val w = Window.partitionBy("user_id").orderBy("utc")
        vals.select(
          (Seq(col("user_id"), col("day"), col("slot"), col("wall"),
            col("utc"), col("value")) ++
           lags.map(k => lag("value", k).over(w).as(s"lag_$k"))): _*)
      }),

    // W1+W2+W3: forward-fill / backward-fill / zero-fill battery
    // (Procesamiento_fase_1.ipynb:241-273). The sparse column only exists on
    // 'purchase' rows; ffill carries the last purchase value forward, bfill
    // the next one backward, and the composite prefers ffill over bfill.
    QueryDef(
      "w1_fill_battery",
      Some(s"""SELECT event_id, user_id, ts,
              |  last_value(pv IGNORE NULLS) OVER
              |    ($oW ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
              |  first_value(pv IGNORE NULLS) OVER
              |    ($oW ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill,
              |  COALESCE(
              |    last_value(pv IGNORE NULLS) OVER
              |      ($oW ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |    first_value(pv IGNORE NULLS) OVER
              |      ($oW ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
              |    0.0) AS filled
              |FROM (SELECT event_id, user_id, ts,
              |        CASE WHEN event_type = 'purchase' THEN value END AS pv
              |      FROM events)""".stripMargin),
      (s, d) => {
        val base = Tables.events(s, d).withColumn("pv",
          when(col("event_type") === "purchase", col("value")))
        val wPast = Window.partitionBy("user_id").orderBy("ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wFut = Window.partitionBy("user_id").orderBy("ts")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val ff = last("pv", ignoreNulls = true).over(wPast)
        val bf = first("pv", ignoreNulls = true).over(wFut)
        base.select(col("event_id"), col("user_id"), col("ts"),
          ff.as("ffill"), bf.as("bfill"),
          coalesce(ff, bf, lit(0.0)).as("filled"))
      }),

    // W4+W6: lag(1) gap/return (Procesamiento_fase_2.ipynb:97).
    QueryDef(
      "w4_lag_gap",
      // NULLIF guards: value can be exactly 0 at sf0.1 and ANSI mode makes
      // /0 an error, not Inf.
      Some(s"""SELECT event_id, user_id, ts, value,
              |  lag(value, 1) OVER ($oW) AS prev_value,
              |  (value - lag(value, 1) OVER ($oW)) /
              |    NULLIF(lag(value, 1) OVER ($oW), 0.0) * 100.0 AS gap_pct,
              |  value / NULLIF(lag(value, 1) OVER ($oW), 0.0) - 1.0 AS ret
              |FROM events""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val prev = lag("value", 1).over(w)
        val prevNz = nullif(prev, lit(0.0))
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"), col("value"),
          prev.as("prev_value"),
          ((col("value") - prev) / prevNz * 100.0).as("gap_pct"),
          (col("value") / prevNz - 1.0).as("ret"))
      }),

    // W5: multi-offset lag battery sharing ONE window spec — the 6-horizon
    // lookback of Procesamiento_fase_2.ipynb:113 (one WindowExec, no
    // re-shuffle per horizon).
    QueryDef(
      "w5_lag_battery",
      Some {
        val cols = Seq(1, 5, 20, 100).map { n =>
          s"""(value - lag(value, $n) OVER ($oW)) /
             |NULLIF(lag(value, $n) OVER ($oW), 0.0) * 100.0
             |AS pct_change_$n""".stripMargin
        }.mkString(",\n")
        Some(s"SELECT event_id, user_id, ts, value,\n$cols\nFROM events")
      }.get,
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val base = Seq(col("event_id"), col("user_id"), col("ts"), col("value"))
        val lags = Seq(1, 5, 20, 100).map { n =>
          val l = lag("value", n).over(w)
          ((col("value") - l) / nullif(l, lit(0.0)) * 100.0)
            .as(s"pct_change_$n")
        }
        Tables.events(s, d).select(base ++ lags: _*)
      }),

    // W7: previous-row feature shift (assign yesterday's range to today).
    QueryDef(
      "w7_feature_shift",
      Some(s"""WITH daily AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day,
              |    max(value) - min(value) AS day_range, count(*) AS n
              |  FROM events GROUP BY 1, 2)
              |SELECT user_id, day, day_range,
              |  lag(day_range, 1) OVER (PARTITION BY user_id ORDER BY day)
              |    AS range_last1d
              |FROM daily""".stripMargin),
      (s, d) => {
        val daily = Tables.events(s, d)
          .repartition(col("user_id"))
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg((max("value") - min("value")).as("day_range"),
               count(lit(1)).as("n"))
          .drop("n")
        val w = Window.partitionBy("user_id").orderBy("day")
        daily.withColumn("range_last1d", lag("day_range", 1).over(w))
      }),

    // W8: rolling std with pandas min_periods gate (null until 5 rows seen),
    // from exact decimal window sums — identical IEEE tree to the oracle.
    QueryDef(
      "w8_rolling_std",
      Some {
        val f = s"$oW ROWS BETWEEN 4 PRECEDING AND CURRENT ROW"
        val s1 = oWsum("value", f); val s2 = oWsum("value * value", f)
        s"""SELECT event_id, user_id, ts,
           |  CASE WHEN count(*) OVER ($f) >= 5 THEN
           |    SQRT(($s2 - $s1 * $s1 / 5.0) / 4.0)
           |  END AS std_5
           |FROM events""".stripMargin
      },
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-4, 0)
        val s1 = wsum(col("value"), w)
        val s2 = wsum(col("value") * col("value"), w)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          when(count(lit(1)).over(w) >= 5,
            sqrt((s2 - s1 * s1 / 5.0) / 4.0)).as("std_5"))
      }),

    // W9: shifted rolling mean — 20 rows EXCLUDING current (the reference's
    // "20-day MA excluding today", my_stock_functions.py:184).
    QueryDef(
      "w9_rolling_mean_shifted",
      Some {
        val f = s"$oW ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING"
        s"""SELECT event_id, user_id, ts,
           |  CASE WHEN count(*) OVER ($f) >= 20 THEN
           |    ${oWsum("value", f)} / 20.0
           |  END AS ma_20
           |FROM events""".stripMargin
      },
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-20, -1)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          when(count(lit(1)).over(w) >= 20,
            wsum(col("value"), w) / 20.0).as("ma_20"))
      }),

    // W10: exact rolling median over an odd 21-row frame (odd + full-frame
    // gate → a single order statistic, no interpolation ambiguity).
    QueryDef(
      "w10_rolling_median",
      Some {
        val f = s"$oW ROWS BETWEEN 20 PRECEDING AND CURRENT ROW"
        s"""SELECT event_id, user_id, ts,
           |  CASE WHEN count(*) OVER ($f) >= 21 THEN
           |    median(value) OVER ($f)
           |  END AS med_21
           |FROM events""".stripMargin
      },
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-20, 0)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          when(count(lit(1)).over(w) >= 21,
            sort_array(collect_list(col("value")).over(w)).getItem(10))
            .as("med_21"))
      }),

    // W11: shifted rolling max + distance-from-high
    // (my_stock_functions.py:304: dist_max_20d).
    QueryDef(
      "w11_dist_from_max",
      Some {
        val f = s"$oW ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING"
        s"""SELECT event_id, user_id, ts, value,
           |  CASE WHEN count(*) OVER ($f) >= 20 THEN
           |    (value - max(value) OVER ($f)) /
           |      NULLIF(max(value) OVER ($f), 0.0)
           |  END AS dist_max_20
           |FROM events""".stripMargin
      },
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-20, -1)
        val mx = max("value").over(w)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"), col("value"),
          when(count(lit(1)).over(w) >= 20,
            (col("value") - mx) / nullif(mx, lit(0.0))).as("dist_max_20"))
      }),

    // W13: true range from the daily rollup — greatest/least across prev
    // close (alpa.py:42-46), composed on A2's order-safe rollup.
    QueryDef(
      "w13_true_range",
      Some("""WITH daily AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    max(value) AS high, min(value) AS low,
             |    arg_max(value, ts) AS close
             |  FROM events GROUP BY 1, 2),
             |d2 AS (
             |  SELECT *, lag(close, 1) OVER (PARTITION BY user_id ORDER BY day)
             |    AS prev_close FROM daily)
             |SELECT user_id, day,
             |  greatest(high, COALESCE(prev_close, low)) -
             |    least(low, COALESCE(prev_close, high)) AS true_range,
             |  CASE WHEN prev_close IS NOT NULL AND prev_close <> 0.0 THEN
             |    (greatest(high, COALESCE(prev_close, low)) -
             |     least(low, COALESCE(prev_close, high))) / prev_close
             |  END AS rel_tr
             |FROM d2""".stripMargin),
      (s, d) => {
        val daily = Tables.events(s, d)
          .repartition(col("user_id"))
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max("value").as("high"), min("value").as("low"),
               max_by(col("value"), col("ts")).as("close"))
        val w = Window.partitionBy("user_id").orderBy("day")
        val d2 = daily.withColumn("prev_close", lag("close", 1).over(w))
        val tr = greatest(col("high"), coalesce(col("prev_close"), col("low"))) -
          least(col("low"), coalesce(col("prev_close"), col("high")))
        d2.select(col("user_id"), col("day"), tr.as("true_range"),
          when(col("prev_close").isNotNull && col("prev_close") =!= 0.0,
            tr / col("prev_close")).as("rel_tr"))
      }),

    // W14: per-key cumulative row index (cumcount, my_model.py:60).
    QueryDef(
      "w14_row_number",
      Some(s"""SELECT event_id, user_id, ts,
              |  row_number() OVER ($oW) - 1 AS cumcount,
              |  count(*) OVER ($oW ROWS BETWEEN UNBOUNDED PRECEDING AND
              |    CURRENT ROW) AS running_n
              |FROM events""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          (row_number().over(w) - 1).cast("long").as("cumcount"),
          count(lit(1)).over(wRun).as("running_n"))
      }),

    // W15: intraday log-return with day-boundary reset, then daily sum
    // (my_stock_functions.py:85-94). The log outputs are per-row
    // deterministic, and the daily sum of logs goes through the decimal
    // path after rounding to a fixed grid — here we keep the raw per-row
    // values and an exact count instead, summing via DECIMAL on a
    // quantized copy would lose the semantic; the grain keeps groups tiny.
    QueryDef(
      "w15_day_reset_logret",
      // round(9) absorbs the 1-ulp libm difference between engines; the
      // positivity guard keeps ln/÷ defined when value hits 0 (sf0.1).
      Some(s"""SELECT event_id, user_id, ts,
              |  CASE WHEN CAST(ts AS DATE) =
              |            CAST(lag(ts, 1) OVER ($oW) AS DATE)
              |        AND value > 0.0 AND lag(value, 1) OVER ($oW) > 0.0 THEN
              |    round(ln(value / lag(value, 1) OVER ($oW)), 9)
              |  END AS log_ret
              |FROM events""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts")
        val prev = lag("value", 1).over(w)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          when(to_date(col("ts")) === to_date(lag("ts", 1).over(w)) &&
               col("value") > 0.0 && prev > 0.0,
            round(log(col("value") / prev), 9))
            .as("log_ret"))
      }),

    // W16: rolling z-score — (value - mean_20) / std_20 composed from the
    // exact-decimal rolling blocks (my_stock_functions.py:632-641).
    QueryDef(
      "w16_rolling_zscore",
      Some {
        val f = s"$oW ROWS BETWEEN 19 PRECEDING AND CURRENT ROW"
        val s1 = oWsum("value", f); val s2 = oWsum("value * value", f)
        s"""SELECT event_id, user_id, ts,
           |  CASE WHEN count(*) OVER ($f) >= 20 THEN
           |    (value - $s1 / 20.0) /
           |    NULLIF(SQRT(($s2 - $s1 * $s1 / 20.0) / 19.0), 0.0)
           |  END AS z_20
           |FROM events""".stripMargin
      },
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-19, 0)
        val s1 = wsum(col("value"), w)
        val s2 = wsum(col("value") * col("value"), w)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          when(count(lit(1)).over(w) >= 20,
            (col("value") - s1 / 20.0) /
              nullif(sqrt((s2 - s1 * s1 / 20.0) / 19.0), lit(0.0)))
            .as("z_20"))
      }),

    // W17: rolling beta / correlation vs a market index (the EDA notebooks'
    // rolling-corr shape, generalized to the cross-sectional index) — per
    // user-day price changes regressed against the same-day changes of a
    // market index (sum of all users' daily closes), over a trailing
    // 10-observation window.
    //
    // Parity design: everything before the final ratios is INTEGER. Closes
    // quantize losslessly to cents; the index is a cent SUM (not a mean —
    // exact long); both diffs come off lag() on the user's own day
    // sequence; the five rolling moments are long window-sums; corr/beta
    // derive from them through one identical IEEE tree. Magnitude audit at
    // fixture scale: |dm| ≤ ~8e6 cents, Σxy over 10 obs ≤ ~5e12,
    // n·Σxy ≤ 5e13 — comfortably < 2^53, so the one long→double cast at
    // the end is exact on both engines (at 1000× the user count, rescale
    // the index or widen to DECIMAL — noted, not needed here).
    //
    // Scale shape: daily rollup shuffles once on (user, day); the index is
    // a tiny per-day aggregate broadcast back; the rolling windows ride
    // ONE (user_id, day) sort. No data-sized join.
    QueryDef(
      "w17_rolling_beta",
      Some("""WITH daily AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    CAST(floor(arg_max(value, ts) * 100.0 + 0.5) AS BIGINT)
             |      AS cx
             |  FROM events GROUP BY 1, 2),
             |mkt AS (
             |  SELECT day, CAST(sum(cx) AS BIGINT) AS cm
             |  FROM daily GROUP BY day),
             |j AS (
             |  SELECT d.user_id, d.day, d.cx, m.cm,
             |    d.cx - lag(d.cx, 1) OVER w AS dx,
             |    m.cm - lag(m.cm, 1) OVER w AS dm
             |  FROM daily d JOIN mkt m USING (day)
             |  WINDOW w AS (PARTITION BY d.user_id ORDER BY d.day)),
             |r AS (
             |  SELECT user_id, day, dx, dm,
             |    CAST(count(*) OVER f AS BIGINT) AS n,
             |    CAST(sum(dx) OVER f AS BIGINT) AS sx,
             |    CAST(sum(dm) OVER f AS BIGINT) AS sy,
             |    CAST(sum(dx * dm) OVER f AS BIGINT) AS sxy,
             |    CAST(sum(dx * dx) OVER f AS BIGINT) AS sxx,
             |    CAST(sum(dm * dm) OVER f AS BIGINT) AS syy
             |  FROM j WHERE dx IS NOT NULL
             |  WINDOW f AS (PARTITION BY user_id ORDER BY day
             |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
             |SELECT user_id, day, dx, dm,
             |  CASE WHEN n >= 10 THEN
             |    CAST(n * sxy - sx * sy AS DOUBLE) /
             |      nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
             |             sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
             |  END AS roll_corr,
             |  CASE WHEN n >= 10 THEN
             |    CAST(n * sxy - sx * sy AS DOUBLE) /
             |      nullif(CAST(n * syy - sy * sy AS DOUBLE), 0.0)
             |  END AS roll_beta
             |FROM r""".stripMargin),
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(floor(max_by(col("value"), col("ts")) * 100.0 + 0.5)
            .cast("long").as("cx"))
          // persisted for its two readers (index aggregate + join); the
          // windows re-key on user_id after the broadcast join, so a
          // pre-repartition here would be a wasted second exchange
          .persist()
        val mkt = daily.groupBy("day").agg(sum("cx").as("cm"))
        val wLag = Window.partitionBy("user_id").orderBy("day")
        val j = daily.join(broadcast(mkt), "day")
          .select(col("user_id"), col("day"), col("cx"), col("cm"))
          .withColumn("dx", col("cx") - lag("cx", 1).over(wLag))
          .withColumn("dm", col("cm") - lag("cm", 1).over(wLag))
          .filter(col("dx").isNotNull)
        val f = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(-9, 0)
        val (n, sx, sy) = (count(lit(1)).over(f), sum("dx").over(f),
          sum("dm").over(f))
        val (sxy, sxx, syy) = (sum(col("dx") * col("dm")).over(f),
          sum(col("dx") * col("dx")).over(f),
          sum(col("dm") * col("dm")).over(f))
        val cov = (n * sxy - sx * sy).cast("double")
        val vx = (n * sxx - sx * sx).cast("double")
        val vy = (n * syy - sy * sy).cast("double")
        j.select(col("user_id"), col("day"), col("dx"), col("dm"),
          when(n >= 10, cov / nullif(sqrt(vx) * sqrt(vy), lit(0.0)))
            .as("roll_corr"),
          when(n >= 10, cov / nullif(vy, lit(0.0))).as("roll_beta"))
      }),

    // W18: running peak / drawdown — the canonical equity risk curve:
    // per-key running maximum since inception, instantaneous drawdown
    // (peak − v)/peak, and the running MAX drawdown. All three are
    // order-free aggregations (max) over one deterministic (ts, event_id)
    // ordering, so ties in ts cannot flip the frame; the per-row ratio is
    // a single IEEE tree. One window partition per key — at scale this is
    // exactly one exchange + one sort, nothing else.
    QueryDef(
      "w18_drawdown",
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts, value,
             |    max(value) OVER w AS peak
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id, ts, value, peak,
             |  (peak - value) / peak AS drawdown,
             |  max((peak - value) / peak) OVER w AS max_drawdown
             |FROM p
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        val dd = (col("peak") - col("value")) / col("peak")
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            max("value").over(w).as("peak"))
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            col("peak"), dd.as("drawdown"),
            max(dd).over(w).as("max_drawdown"))
      }),

    // W19: Wilder's RSI (graft.operators.Rsi) — gains/losses of the
    // per-user value series smoothed by the recursive
    // ewm(alpha=1/14, adjust=False) recurrence, both legs in ONE
    // O(1)-memory secondary-sort scan; hash-verified against a
    // state-carrying recursive-CTE oracle (the pl4 pattern, doubled).
    // Division guards pin flat series to 50 and loss-free to 100, so no
    // NaN/Inf crosses the hash compare.
    QueryDef(
      "w19_rsi",
      Some("""WITH RECURSIVE o AS (
             |  SELECT user_id, ts, value,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts)
             |      AS rn,
             |    value - lag(value) OVER (PARTITION BY user_id
             |      ORDER BY ts) AS delta
             |  FROM events),
             |r AS (
             |  SELECT user_id, ts, value, rn, delta,
             |    greatest(delta, 0.0) AS ag,
             |    greatest(0.0 - delta, 0.0) AS al
             |  FROM o WHERE rn = 2
             |  UNION ALL
             |  SELECT o.user_id, o.ts, o.value, o.rn, o.delta,
             |    (1.0 / 14.0) * greatest(o.delta, 0.0)
             |      + (1.0 - 1.0 / 14.0) * r.ag,
             |    (1.0 / 14.0) * greatest(0.0 - o.delta, 0.0)
             |      + (1.0 - 1.0 / 14.0) * r.al
             |  FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
             |SELECT user_id, ts, value, delta, ag AS avg_gain,
             |  al AS avg_loss,
             |  CASE WHEN al = 0.0 AND ag = 0.0 THEN 50.0
             |       WHEN al = 0.0 THEN 100.0
             |       ELSE 100.0 - 100.0 / (1.0 + ag / al) END AS rsi
             |FROM r
             |UNION ALL
             |SELECT user_id, ts, value, NULL, NULL, NULL, NULL
             |FROM o WHERE rn = 1""".stripMargin),
      (s, d) =>
        graft.operators.Rsi.rsi(
            Tables.events(s, d).select("user_id", "ts", "value"),
            "user_id", "ts", "value")
          .select(col("key").as("user_id"), col("ts"),
            col("x").as("value"), col("delta"), col("avg_gain"),
            col("avg_loss"), col("rsi"))),

    // W20: MACD 12/26/9 (graft.operators.Macd) — fast/slow EWMs, the
    // signal line (an EWM of the DERIVED macd series — inexpressible as
    // a window/FIR, the recurrence-over-recurrence case), and the
    // histogram, all three states in ONE O(1)-memory secondary-sort
    // scan; hash-verified against a triple-state recursive-CTE oracle
    // generated by the operator itself so recurrence and oracle cannot
    // drift.
    QueryDef(
      "w20_macd",
      Some(graft.operators.Macd.oracleSql("events")),
      (s, d) =>
        graft.operators.Macd.macd(
            Tables.events(s, d).select("user_id", "ts", "value"),
            "user_id", "ts", "value")
          .select(col("key").as("user_id"), col("ts"),
            col("x").as("value"), col("ewm_fast"), col("ewm_slow"),
            col("macd"), col("signal"), col("histogram"))),

    // W21: interval-union coverage — each event opens a 5-minute
    // interval; per user, merge overlaps (gaps-and-islands: an island
    // starts where the start exceeds the running max end of everything
    // before it) and report island count + total covered time. All
    // arithmetic on exact epoch MICROSECONDS (longs); one window
    // partition per key + one bounded island rollup — the same
    // one-exchange shape as the other per-key window batteries.
    QueryDef(
      "w21_interval_union",
      Some("""WITH iv AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS s,
             |    epoch_us(ts) + 300000000 AS e
             |  FROM events),
             |m AS (
             |  SELECT user_id, event_id, s, e,
             |    max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS prev_max
             |  FROM iv),
             |isl AS (
             |  SELECT user_id, s, e,
             |    CAST(sum(CASE WHEN prev_max IS NULL OR s > prev_max
             |        THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY s, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS island
             |  FROM m),
             |agg AS (
             |  SELECT user_id, island, min(s) AS i_start, max(e) AS i_end
             |  FROM isl GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_islands,
             |  CAST(sum(i_end - i_start) AS BIGINT) AS covered_us
             |FROM agg GROUP BY user_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("s", "event_id")
        val iv = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("s"),
            (unix_micros(col("ts")) + 300000000L).as("e"))
        iv
          .withColumn("prev_max",
            max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("island",
            sum(when(col("prev_max").isNull ||
              col("s") > col("prev_max"), 1L).otherwise(0L))
              .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "island")
          .agg(min("s").as("i_start"), max("e").as("i_end"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum(col("i_end") - col("i_start")).as("covered_us"))
      }),

    // W22: CUSUM drift detection — the sequential change-point monitor
    // (Page 1954): s⁺ accumulates positive deviations from the per-user
    // baseline (first value), decays by the slack, floors at 0; s⁻
    // mirrors it downward; an alarm fires when either side crosses the
    // threshold. The recurrence is max(0, prev + dev) — not a window
    // frame — so it rides the same O(1)-memory secondary-sort scan as
    // EWM/RSI/MACD, replayed by a two-state recursive-CTE oracle.
    // Baseline = the key's first value keeps the whole query
    // deterministic without a training pass.
    QueryDef(
      "w22_cusum",
      Some("""WITH RECURSIVE o AS (
             |  SELECT user_id, ts, value,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts)
             |      AS rn,
             |    first_value(value) OVER (PARTITION BY user_id
             |      ORDER BY ts) AS base
             |  FROM events),
             |r AS (
             |  SELECT user_id, ts, value, rn, base,
             |    CAST(0.0 AS DOUBLE) AS s_pos, CAST(0.0 AS DOUBLE) AS s_neg
             |  FROM o WHERE rn = 1
             |  UNION ALL
             |  SELECT o.user_id, o.ts, o.value, o.rn, o.base,
             |    greatest(0.0, r.s_pos + (o.value - o.base) - 0.5),
             |    greatest(0.0, r.s_neg - (o.value - o.base) - 0.5)
             |  FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
             |SELECT user_id, ts, value, s_pos, s_neg,
             |  s_pos > 5.0 OR s_neg > 5.0 AS alarm
             |FROM r""".stripMargin),
      (s, d) => {
        import s.implicits._
        val slack = 0.5; val threshold = 5.0
        val ds = Tables.events(s, d)
          .select(col("user_id").cast("long").as("key"), col("ts"),
            col("value").cast("double").as("x"))
          .as[graft.operators.Rsi.In]
        ds.repartition(col("key"))
          .sortWithinPartitions(col("key"), col("ts"))
          .mapPartitions { it =>
            var curKey = Long.MinValue
            var haveKey = false
            var base = 0.0; var sPos = 0.0; var sNeg = 0.0
            it.map { r =>
              if (!haveKey || r.key != curKey) {
                curKey = r.key; haveKey = true
                base = r.x; sPos = 0.0; sNeg = 0.0
              } else {
                val dev = r.x - base
                sPos = math.max(0.0, sPos + dev - slack)
                sNeg = math.max(0.0, sNeg - dev - slack)
              }
              (r.key, r.ts, r.x, sPos, sNeg,
                sPos > threshold || sNeg > threshold)
            }
          }
          .toDF("user_id", "ts", "value", "s_pos", "s_neg", "alarm")
      }),

    // W23: lag-k autocorrelation (ACF at k = 1, 2, 3) of each user's
    // value series — the time-series diagnostic behind every volatility
    // model's "is there structure left" check. One window pass produces
    // all three lag columns (shared (user, ts) sort), one hash aggregate
    // produces every moment; the ACF ratio expands the mean-centered
    // form to RAW integer moments on the cent grid
    // (r_k = [n²P_k − nS(A_k+B_k) + m_k S²] / [n(nQ − S²)]) so every
    // aggregate is an exact long and the ratio is one identical IEEE
    // tree from identical integers — no mean subtraction ever touches a
    // float accumulator.
    QueryDef(
      "w23_autocorr",
      Some {
        def terms(k: Int) =
          s"""CAST(count(l$k) AS BIGINT) AS m$k,
             |  CAST(sum(vc * l$k) AS BIGINT) AS p$k,
             |  CAST(sum(CASE WHEN l$k IS NOT NULL THEN vc END) AS BIGINT)
             |    AS a$k,
             |  CAST(sum(l$k) AS BIGINT) AS b$k""".stripMargin
        def r(k: Int) =
          s"""(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(p$k AS DOUBLE)
             |   - CAST(n AS DOUBLE) * CAST(s AS DOUBLE) *
             |     (CAST(a$k AS DOUBLE) + CAST(b$k AS DOUBLE))
             |   + CAST(m$k AS DOUBLE) * CAST(s AS DOUBLE)
             |     * CAST(s AS DOUBLE)) /
             |  (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) *
             |     CAST(q AS DOUBLE) - CAST(s AS DOUBLE) *
             |     CAST(s AS DOUBLE)))""".stripMargin
        s"""WITH v AS (
           |  SELECT user_id,
           |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
           |    lag(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 1)
           |      OVER w AS l1,
           |    lag(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 2)
           |      OVER w AS l2,
           |    lag(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 3)
           |      OVER w AS l3
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |m AS (
           |  SELECT user_id, count(*) AS n,
           |    CAST(sum(vc) AS BIGINT) AS s,
           |    CAST(sum(vc * vc) AS BIGINT) AS q,
           |    ${terms(1)},
           |    ${terms(2)},
           |    ${terms(3)}
           |  FROM v GROUP BY 1)
           |SELECT user_id, n,
           |  ${r(1)} AS r1,
           |  ${r(2)} AS r2,
           |  ${r(3)} AS r3
           |FROM m""".stripMargin
      },
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val vc = floor(col("value") * 100.0 + 0.5).cast("long")
        val v = Tables.events(s, d)
          .select(col("user_id"), vc.as("vc"),
            lag(vc, 1).over(w).as("l1"), lag(vc, 2).over(w).as("l2"),
            lag(vc, 3).over(w).as("l3"))
        def terms(k: Int) = Seq(
          count(col(s"l$k")).as(s"m$k"),
          sum(col("vc") * col(s"l$k")).as(s"p$k"),
          sum(when(col(s"l$k").isNotNull, col("vc"))).as(s"a$k"),
          sum(col(s"l$k")).as(s"b$k"))
        val aggs = Seq(count(lit(1)).as("n"), sum("vc").as("s"),
          sum(col("vc") * col("vc")).as("q")) ++
          terms(1) ++ terms(2) ++ terms(3)
        val m = v.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
        def dbl(c: String) = col(c).cast("double")
        def r(k: Int) =
          (dbl("n") * dbl("n") * dbl(s"p$k")
            - dbl("n") * dbl("s") * (dbl(s"a$k") + dbl(s"b$k"))
            + dbl(s"m$k") * dbl("s") * dbl("s")) /
          (dbl("n") * (dbl("n") * dbl("q") - dbl("s") * dbl("s")))
        m.select(col("user_id"), col("n"),
          r(1).as("r1"), r(2).as("r2"), r(3).as("r3"))
      }),

    // W24: Average True Range (Wilder) — daily true range (w13's
    // three-way max vs previous close) smoothed by the Wilder recurrence
    // atr_t = (1/14)·tr_t + (13/14)·atr_{t-1}, atr_1 = tr_1: the EWM
    // alpha=1/14 composition of w13 + the pl4 recursive-scan operator
    // ([[graft.operators.Ewm.recursive]] — secondary-sort O(1)-memory
    // iterator; the recurrence admits no frame rewrite). Oracle replays
    // the identical IEEE recursion as a recursive CTE with alpha embedded
    // as the DIVISION EXPRESSION 1.0/14.0 (never a printed decimal — the
    // w20 lesson).
    QueryDef(
      "w24_atr",
      Some("""WITH RECURSIVE daily AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    max(value) AS high, min(value) AS low,
             |    arg_max(value, ts) AS close
             |  FROM events GROUP BY 1, 2),
             |o AS (
             |  SELECT user_id, day, high, low,
             |    lag(close, 1) OVER (PARTITION BY user_id ORDER BY day)
             |      AS pc,
             |    row_number() OVER (PARTITION BY user_id ORDER BY day)
             |      AS rn
             |  FROM daily),
             |t AS (
             |  SELECT user_id, day, rn,
             |    CASE WHEN pc IS NULL THEN high - low
             |         ELSE greatest(high - low, abs(high - pc),
             |                       abs(low - pc)) END AS tr
             |  FROM o),
             |r AS (
             |  SELECT user_id, day, rn, tr, tr AS atr14
             |  FROM t WHERE rn = 1
             |  UNION ALL
             |  SELECT t.user_id, t.day, t.rn, t.tr,
             |    (1.0 / 14.0) * t.tr + (1.0 - 1.0 / 14.0) * r.atr14 AS atr14
             |  FROM t JOIN r ON t.user_id = r.user_id AND t.rn = r.rn + 1)
             |SELECT user_id, day, tr, atr14 FROM r""".stripMargin),
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max("value").as("high"), min("value").as("low"),
               max_by(col("value"), col("ts")).as("close"))
        val w = Window.partitionBy("user_id").orderBy("day")
        val pc = lag("close", 1).over(w)
        val tr = when(pc.isNull, col("high") - col("low"))
          .otherwise(greatest(col("high") - col("low"),
            abs(col("high") - pc), abs(col("low") - pc)))
        graft.operators.Ewm.recursive(
            daily.select(col("user_id"),
              col("day").cast("timestamp").as("ts"), tr.as("tr")),
            "user_id", "ts", "tr", alpha = 1.0 / 14.0)
          .select(col("key").as("user_id"), col("ts").cast("date").as("day"),
            col("x").as("tr"), col("ewm").as("atr14"))
      }),

    // W25: realized volatility — per (user_id, day): RV = Σ ln(v_t /
    // v_{t-1})² over intraday log returns, and realized vol = √RV. The
    // high-frequency estimator the range-based a38 family is benchmarked
    // against; one lag window (the family's shared user_id exchange) and
    // one hash aggregate.
    //
    // Parity: prices ride the lq cent grid so each ratio is a division
    // of exact doubles; each ln is rounded at 9 (tx7 doctrine); each
    // SQUARED return is then quantized onto a COARSE 1e-6 grid and the
    // per-day accumulation is an order-free LONG sum (the a31
    // never-sum-raw-doubles rule — r² ≤ ln(49002)² ≈ 117, so qterms ≤
    // 1.2e8 and ~2.3e14 rows/day of headroom). The final √ is
    // round(·, 9).
    QueryDef(
      "w25_realized_vol",
      Some {
        val r = "round(ln(CAST(vc AS DOUBLE) / CAST(pv AS DOUBLE)), 9)"
        s"""WITH e AS (
           |  SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS tu,
           |    ${graft.Parity.oLq("value")} AS vc
           |  FROM events WHERE value > 0.0),
           |w AS (
           |  SELECT user_id, day, vc,
           |    lag(vc) OVER (PARTITION BY user_id, day ORDER BY tu)
           |      AS pv
           |  FROM e),
           |q AS (
           |  SELECT user_id, day,
           |    CASE WHEN pv IS NULL THEN NULL ELSE
           |      CAST(floor($r * $r * 1000000.0 + 0.5) AS BIGINT)
           |    END AS qr2
           |  FROM w)
           |SELECT user_id, day,
           |  CAST(count(qr2) AS BIGINT) AS n_returns,
           |  CAST(CAST(sum(qr2) AS BIGINT) AS DOUBLE) / 1000000.0 AS rv,
           |  round(sqrt(CAST(CAST(sum(qr2) AS BIGINT) AS DOUBLE)
           |    / 1000000.0), 9) AS realized_vol
           |FROM q GROUP BY 1, 2 HAVING count(qr2) > 0""".stripMargin
      },
      (s, d) => {
        val w = Window.partitionBy("user_id", "day").orderBy("tu")
        val r = round(log(col("vc").cast("double") /
          col("pv").cast("double")), 9)
        Tables.events(s, d)
          // zero prints (bad ticks) would put a 0 in a log-return
          // denominator — excluded on BOTH engines
          .filter(col("value") > 0.0)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            unix_micros(col("ts")).as("tu"),
            graft.Parity.lq(col("value")).as("vc"))
          .withColumn("pv", lag("vc", 1).over(w))
          .select(col("user_id"), col("day"),
            when(col("pv").isNull, lit(null))
              .otherwise(floor(r * r * 1000000.0 + 0.5).cast("long"))
              .as("qr2"))
          .groupBy("user_id", "day")
          .agg(count(col("qr2")).as("n_returns"),
            (sum(col("qr2")).cast("double") / 1000000.0).as("rv"),
            round(sqrt(sum(col("qr2")).cast("double") / 1000000.0), 9)
              .as("realized_vol"))
          .filter(col("n_returns") > 0)
      }),

    // W26: on-balance volume — the classic flow indicator: each print's
    // size (props.k, the reference's per-tick lot field) is ADDED to the
    // running total when the price ticked up, SUBTRACTED when it ticked
    // down, and ignored on flat/first prints. One user_id exchange serves
    // both windows (lag + running sum — same partitioning AND ordering,
    // Catalyst chains the WindowExecs without re-shuffle), and the JSON
    // parse happens ONCE per row in its own projection (the f12 rule —
    // at 100 TB the parse is the cost, not the cumsum).
    //
    // Parity: prices ride the lq cent grid so the up/down comparison is
    // exact long ordering; flows and the running OBV are pure long sums
    // (|Σflow| ≤ 100·rows/user — ~2^20 at sf1000, eons of headroom).
    // Both frames are ROWS-bounded over the unique (ts, event_id) order;
    // DuckDB's windowed SUM(BIGINT) returns HUGEINT, so the oracle casts
    // it back (the tx14/mix3 rule).
    QueryDef(
      "w26_obv",
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts,
             |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
             |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS sz
             |  FROM events),
             |s AS (
             |  SELECT user_id, event_id, ts, sz,
             |    lag(vc, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS pv,
             |    vc
             |  FROM e),
             |f AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN pv IS NULL THEN CAST(0 AS BIGINT)
             |         WHEN vc > pv THEN sz
             |         WHEN vc < pv THEN -sz
             |         ELSE CAST(0 AS BIGINT) END AS flow
             |  FROM s)
             |SELECT user_id, event_id, flow,
             |  CAST(sum(flow) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS obv
             |FROM f""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = Tables.events(s, d)
          .withColumn("j", from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
          .select(col("user_id"), col("event_id"), col("ts"),
            graft.Parity.lq(col("value")).as("vc"),
            col("j").getField("k").as("sz"))
        val pv = lag("vc", 1).over(w)
        e.select(col("user_id"), col("event_id"), col("ts"), col("sz"),
            pv.as("pv"), col("vc"))
          .select(col("user_id"), col("event_id"), col("ts"),
            when(col("pv").isNull, lit(0L))
              .when(col("vc") > col("pv"), col("sz"))
              .when(col("vc") < col("pv"), -col("sz"))
              .otherwise(lit(0L)).as("flow"))
          .select(col("user_id"), col("event_id"), col("flow"),
            sum("flow").over(cum).as("obv"))
      }),

    // W27: stochastic oscillator — %K = 100·(close − low14)/(high14 −
    // low14) over a full 14-day frame of the daily OHLC rollup, %D = the
    // 3-day mean of %K. Both frames gate on completeness (pandas
    // min_periods semantics, the w8 precedent) and a flat 14-day range
    // (high14 = low14) yields NULL rather than 0/0. Daily rollup + every
    // window share ONE user_id exchange.
    //
    // Parity: o/h/l/c are exact cent longs (max_by on the unique µs
    // timestamp, the a2/a38 precedent); %K is one identical IEEE tree
    // over exact longs; %K is then quantized onto a COARSE 1e-6 grid and
    // %D is a 3-term LONG sum de-scaled once (the a31 never-sum-raw-
    // doubles rule — 3 doubles summed in frame order would be engine-
    // dependent). DuckDB's windowed SUM(BIGINT) → HUGEINT is cast back.
    QueryDef(
      "w27_stochastic",
      Some {
        val vc = "CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
        s"""WITH daily AS (
           |  SELECT user_id, CAST(ts AS DATE) AS day,
           |    max($vc) AS h, min($vc) AS l,
           |    arg_max($vc, epoch_us(ts)) AS c
           |  FROM events GROUP BY 1, 2),
           |k AS (
           |  SELECT user_id, day, c,
           |    min(l) OVER f AS ll, max(h) OVER f AS hh,
           |    count(*) OVER f AS nf
           |  FROM daily
           |  WINDOW f AS (PARTITION BY user_id ORDER BY day
           |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
           |p AS (
           |  SELECT user_id, day,
           |    CASE WHEN nf = 14 AND hh > ll THEN
           |      100.0 * CAST(c - ll AS DOUBLE) / CAST(hh - ll AS DOUBLE)
           |    END AS pct_k
           |  FROM k),
           |q AS (
           |  SELECT user_id, day, pct_k,
           |    CAST(floor(pct_k * 1000000.0 + 0.5) AS BIGINT) AS kq
           |  FROM p)
           |SELECT user_id, day, pct_k,
           |  CASE WHEN count(kq) OVER g = 3 THEN
           |    CAST(CAST(sum(kq) OVER g AS BIGINT) AS DOUBLE) / 3.0
           |      / 1000000.0 END AS pct_d
           |FROM q
           |WINDOW g AS (PARTITION BY user_id ORDER BY day
           |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin
      },
      (s, d) => {
        val vc = graft.Parity.lq(col("value"))
        val daily = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max(vc).as("h"), min(vc).as("l"),
            max_by(vc, unix_micros(col("ts"))).as("c"))
        val f = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(-13, Window.currentRow)
        val g = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(-2, Window.currentRow)
        daily
          .select(col("user_id"), col("day"), col("c"),
            min("l").over(f).as("ll"), max("h").over(f).as("hh"),
            count(lit(1)).over(f).as("nf"))
          .select(col("user_id"), col("day"),
            when(col("nf") === 14 && col("hh") > col("ll"),
              lit(100.0) * (col("c") - col("ll")).cast("double") /
                (col("hh") - col("ll")).cast("double")).as("pct_k"))
          .withColumn("kq",
            floor(col("pct_k") * 1000000.0 + 0.5).cast("long"))
          .select(col("user_id"), col("day"), col("pct_k"),
            when(count(col("kq")).over(g) === 3,
              sum("kq").over(g).cast("double") / 3.0 / 1000000.0)
              .as("pct_d"))
      }),

    // W28: TIME-based RANGE window frame — the frame mode every other
    // window row here deliberately avoids (ROWS frames need a unique
    // tiebreak; a RANGE frame is defined on the ORDER VALUE itself:
    // all peers of the current timestamp are in-frame, so the result
    // is deterministic under ties BY CONSTRUCTION). Per event: count
    // and exact-grid sum of the same user's events in the trailing
    // hour — the "activity in the last hour" feature a ROWS-19 frame
    // (w8/w16) can only approximate when event spacing is uneven. At
    // scale it is the same single user-keyed exchange + one sort as
    // every ROWS battery; the frame bound costs nothing extra.
    QueryDef(
      "w28_range_frame",
      Some(s"""SELECT event_id, user_id, ts,
             |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
             |  CAST(SUM(${oLq("value")}) OVER w AS DOUBLE) / 100.0
             |    AS sum_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""
        .stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, Window.currentRow)
        Tables.events(s, d).select(col("event_id"), col("user_id"),
          col("ts"),
          count(lit(1)).over(w).as("n_1h"),
          (sum(lq(col("value"))).over(w).cast("double") / 100.0)
            .as("sum_1h"))
      }),
  )
}
