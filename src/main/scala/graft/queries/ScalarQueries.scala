package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.8 scalar function families (F1–F18), one query per family,
  * all pure per-row Column expressions — codegen'd, no UDFs (Spark-first:
  * a `when`-chain or builtin beats a UDF at any scale because it stays
  * inside WholeStageCodegen and Catalyst can push/prune around it).
  */
object ScalarQueries {

  val all: Seq[QueryDef] = Seq(

    // F1+F2+F3: timezone conversion UTC→America/New_York (incl. the naive
    // wall-time materialization and the 4am session anchor of
    // my_alpaca.py:270), plus date/time part extraction.
    QueryDef(
      "f1_tz_localize",
      Some("""SELECT event_id, ts,
             |  (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York'
             |    AS local_ts,
             |  CAST((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York'
             |    AS DATE) AS local_date,
             |  CAST(date_trunc('day',
             |    (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York')
             |    + INTERVAL 4 HOUR AS TIMESTAMP) AS session_anchor,
             |  CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
             |  CAST(EXTRACT(minute FROM ts) AS BIGINT) AS mi,
             |  dayname(ts) AS weekday_name,
             |  CAST(year(ts) AS BIGINT) AS yr,
             |  CAST(month(ts) AS BIGINT) AS mo
             |FROM events""".stripMargin),
      (s, d) => {
        val local = from_utc_timestamp(col("ts"), "America/New_York")
        Tables.events(s, d).select(
          col("event_id"), col("ts"),
          local.as("local_ts"),
          to_date(local).as("local_date"),
          (date_trunc("day", local) + expr("INTERVAL 4 HOURS"))
            .as("session_anchor"),
          hour(col("ts")).cast("long").as("hr"),
          minute(col("ts")).cast("long").as("mi"),
          date_format(col("ts"), "EEEE").as("weekday_name"),
          year(col("ts")).cast("long").as("yr"),
          month(col("ts")).cast("long").as("mo"))
      }),

    // F4: timestamp parse with ISO space→'T' normalization (SQL doc CTAS)
    // — parse a string rebuilt from ts, prove the round trip.
    QueryDef(
      "f4_ts_parse",
      Some("""SELECT event_id,
             |  CAST(strptime(regexp_replace(
             |    strftime(ts, '%Y-%m-%d %H:%M:%S'), ' ', 'T'),
             |    '%Y-%m-%dT%H:%M:%S') AS TIMESTAMP) AS parsed
             |FROM events""".stripMargin),
      (s, d) =>
        Tables.events(s, d).select(
          col("event_id"),
          to_timestamp(
            regexp_replace(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
              " ", "T"),
            "yyyy-MM-dd'T'HH:mm:ss").as("parsed"))),

    // F5+F10: ratio arithmetic with divide-by-zero guard
    // (np.where(range==0, 0, ratio) of my_stock_functions.py:346).
    QueryDef(
      "f5_guarded_ratios",
      Some("""WITH daily AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    arg_min(value, ts) AS open, max(value) AS high,
             |    min(value) AS low, arg_max(value, ts) AS close
             |  FROM events GROUP BY 1, 2)
             |SELECT user_id, day,
             |  CASE WHEN open <> 0.0 THEN (high - low) / open * 100.0
             |       ELSE 0.0 END AS range_pct,
             |  CASE WHEN open <> 0.0 THEN (close - open) / open * 100.0
             |       ELSE 0.0 END AS change_pct,
             |  CASE WHEN high - low <> 0.0
             |       THEN (high - greatest(open, close)) / (high - low)
             |       ELSE 0.0 END AS upper_wick_ratio
             |FROM daily""".stripMargin),
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(min_by(col("value"), col("ts")).as("open"),
               max("value").as("high"), min("value").as("low"),
               max_by(col("value"), col("ts")).as("close"))
        daily.select(col("user_id"), col("day"),
          when(col("open") =!= 0.0,
            (col("high") - col("low")) / col("open") * 100.0)
            .otherwise(0.0).as("range_pct"),
          when(col("open") =!= 0.0,
            (col("close") - col("open")) / col("open") * 100.0)
            .otherwise(0.0).as("change_pct"),
          when(col("high") - col("low") =!= 0.0,
            (col("high") - greatest(col("open"), col("close"))) /
              (col("high") - col("low")))
            .otherwise(0.0).as("upper_wick_ratio"))
      }),

    // F6+F7: log family + cyclic weekday encoding (sin/cos) —
    // per-row transcendentals, deterministic per engine build.
    QueryDef(
      "f7_cyclic_encoding",
      // ln differs by 1 ulp between Java and C libm on some inputs; a
      // 9-decimal round on both sides absorbs it (verified: no input lands
      // within 10x of a rounding boundary on the fixture data).
      Some("""SELECT event_id,
             |  round(ln(value + 1.0), 9) AS log_value,
             |  sin(2.0 * pi() * CAST(dayofweek(ts) AS DOUBLE) / 7.0) AS dow_sin,
             |  cos(2.0 * pi() * CAST(dayofweek(ts) AS DOUBLE) / 7.0) AS dow_cos
             |FROM events""".stripMargin),
      (s, d) =>
        Tables.events(s, d).select(
          col("event_id"),
          round(log(col("value") + 1.0), 9).as("log_value"),
          sin(lit(2.0) * lit(math.Pi) * (dayofweek(col("ts")) - 1)
            .cast("double") / 7.0).as("dow_sin"),
          cos(lit(2.0) * lit(math.Pi) * (dayofweek(col("ts")) - 1)
            .cast("double") / 7.0).as("dow_cos"))),

    // F8+F15: tiered threshold factor (my_helper.py:3-24 min_max_target) as
    // a pure when-chain, with floor-based tier rounding (floor is exact
    // IEEE — engine-portable, unlike decimal round of a double).
    QueryDef(
      "f15_tiered_target",
      Some("""SELECT event_id, value,
             |  CASE WHEN value < 1.0 THEN 0.12
             |       WHEN value < 10.0 THEN 0.08
             |       WHEN value < 50.0 THEN 0.05
             |       WHEN value < 200.0 THEN 0.03
             |       ELSE 0.02 END AS target_factor,
             |  value * (1.0 + CASE WHEN value < 1.0 THEN 0.12
             |       WHEN value < 10.0 THEN 0.08
             |       WHEN value < 50.0 THEN 0.05
             |       WHEN value < 200.0 THEN 0.03
             |       ELSE 0.02 END) AS upper_target,
             |  floor(value * 10.0) / 10.0 AS value_tier
             |FROM events""".stripMargin),
      (s, d) => {
        val factor = when(col("value") < 1.0, 0.12)
          .when(col("value") < 10.0, 0.08)
          .when(col("value") < 50.0, 0.05)
          .when(col("value") < 200.0, 0.03)
          .otherwise(0.02)
        Tables.events(s, d).select(
          col("event_id"), col("value"),
          factor.as("target_factor"),
          (col("value") * (lit(1.0) + factor)).as("upper_target"),
          (floor(col("value") * 10.0) / 10.0).as("value_tier"))
      }),

    // F9: greatest/least across columns + F11 coalesce fill.
    QueryDef(
      "f9_greatest_least",
      Some("""SELECT l_orderkey, l_linenumber,
             |  greatest(l_quantity, l_discount * 100.0, l_tax * 100.0) AS g,
             |  least(l_quantity, l_discount * 100.0, l_tax * 100.0) AS l,
             |  COALESCE(NULLIF(l_discount, 0.0), 0.005) AS disc_filled
             |FROM lineitem""".stripMargin),
      (s, d) =>
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          greatest(col("l_quantity"), col("l_discount") * 100.0,
            col("l_tax") * 100.0).as("g"),
          least(col("l_quantity"), col("l_discount") * 100.0,
            col("l_tax") * 100.0).as("l"),
          coalesce(nullif(col("l_discount"), lit(0.0)), lit(0.005))
            .as("disc_filled"))),

    // F12+F13+F14: JSON extraction from the props payload (the REST-boundary
    // shape, S8) + cast-with-coercion (to_numeric errors="coerce") + rename.
    QueryDef(
      "f12_json_extract_cast",
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) * 2
             |    AS k_doubled,
             |  TRY_CAST(event_type AS DOUBLE) AS type_as_num,
             |  CAST(event_id AS VARCHAR) AS id_str
             |FROM events""".stripMargin),
      (s, d) =>
        // ONE from_json per row; both k columns derive from the parsed
        // struct. The two-projection shape is load-bearing: `j` is used
        // twice downstream and from_json is non-cheap, so CollapseProject
        // keeps the parse in its own projection instead of inlining (and
        // thus re-evaluating) it per consumer — at 100 TB the JSON parse
        // IS this query's cost, everything else is arithmetic.
        Tables.events(s, d)
          .withColumn("j", from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
          .select(
            col("event_id"),
            col("j").getField("k").as("k_value"),
            (col("j").getField("k") * 2).as("k_doubled"),
            expr("try_cast(event_type AS double)").as("type_as_num"),
            col("event_id").cast("string").as("id_str"))),

    // F16: days-since-holiday — as-of lookup against the committed calendar
    // dimension (broadcast; the searchsorted of my_stock_functions.py:509).
    // Both sides read sources/CalendarSource so Spark and oracle can't drift.
    QueryDef(
      "f16_days_since_holiday",
      Some(s"""WITH holidays AS (
             |  SELECT CAST(h AS DATE) AS holiday FROM
             |    ${graft.sources.CalendarSource.valuesSql("us_federal")}),
             |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
             |SELECT d.day,
             |  CAST(datediff('day',
             |    (SELECT max(holiday) FROM holidays WHERE holiday <= d.day),
             |    d.day) AS BIGINT) AS days_since_holiday
             |FROM days d""".stripMargin),
      (s, d) => {
        val holidays = graft.sources.CalendarSource.dim(s, "us_federal")
        val days = Tables.events(s, d)
          .select(to_date(col("ts")).as("day")).distinct()
        days.join(broadcast(holidays), col("holiday") <= col("day"), "left")
          .groupBy("day")
          .agg(max("holiday").as("last_holiday"))
          .select(col("day"),
            datediff(col("day"), col("last_holiday")).cast("long")
              .as("days_since_holiday"))
      }),

    // F17+F18: categorical recode via a literal map + one-hot indicators
    // (my_model.py:53-57) — static schema, no driver-side discovery.
    QueryDef(
      "f17_recode_onehot",
      Some("""SELECT event_id,
             |  CASE event_type WHEN 'click' THEN 'engagement'
             |    WHEN 'view' THEN 'engagement'
             |    WHEN 'purchase' THEN 'conversion'
             |    WHEN 'signup' THEN 'conversion'
             |    ELSE 'other' END AS type_group,
             |  CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
             |    AS BIGINT) AS is_purchase,
             |  CAST(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
             |    AS BIGINT) AS is_click,
             |  CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
             |    AS BIGINT) AS is_error
             |FROM events""".stripMargin),
      (s, d) => {
        val recode = typedLit(Map(
          "click" -> "engagement", "view" -> "engagement",
          "purchase" -> "conversion", "signup" -> "conversion",
          "error" -> "other"))
        Tables.events(s, d).select(
          col("event_id"),
          coalesce(element_at(recode, col("event_type")), lit("other"))
            .as("type_group"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("is_purchase"),
          when(col("event_type") === "click", 1L).otherwise(0L)
            .as("is_click"),
          when(col("event_type") === "error", 1L).otherwise(0L)
            .as("is_error"))
      }),

    // F19: UNPIVOT / melt — the wide→long reshape (`pd.melt`, the
    // inverse of a15's pivot; every pandas notebook reshapes bars this
    // way before plotting/joining per-field). Spark's native
    // `Dataset.unpivot` plans as one Expand over the scan — a single
    // pass emitting |fields| rows per input row, map-side only, no
    // shuffle beyond the upstream rollup. Oracle uses the portable
    // UNION ALL form (one branch per field — semantically identical;
    // DuckDB's UNPIVOT reorders columns).
    QueryDef(
      "f19_unpivot",
      Some("""WITH bars AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day,
             |    arg_min(value, ts) AS open, max(value) AS high,
             |    min(value) AS low, arg_max(value, ts) AS close
             |  FROM events GROUP BY 1, 2)
             |SELECT user_id, day, 'open' AS field, open AS v FROM bars
             |UNION ALL
             |SELECT user_id, day, 'high', high FROM bars
             |UNION ALL
             |SELECT user_id, day, 'low', low FROM bars
             |UNION ALL
             |SELECT user_id, day, 'close', close FROM bars""".stripMargin),
      (s, d) => {
        val bars = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(min_by(col("value"), col("ts")).as("open"),
               max(col("value")).as("high"),
               min(col("value")).as("low"),
               max_by(col("value"), col("ts")).as("close"))
        val out = bars.unpivot(
          ids = Array(col("user_id"), col("day")),
          values = Array(col("open"), col("high"), col("low"),
            col("close")),
          variableColumnName = "field", valueColumnName = "v")
        // the reshape must stay a map-side Expand — a shuffle here would
        // mean the melt re-keyed the data
        val phys = out.queryExecution.executedPlan.toString
        require(phys.contains("Expand"),
          s"f19: expected Expand for unpivot, got:\n$phys")
        out
      }),
  )
}
