package graft.queries

import graft.{QueryDef, Tables}

/** The `spark.sql(...)` TEXT entry point — the reference's Athena SQL
  * layer (SURVEY §3.2: SQL in the console → Presto parse → distributed
  * plan → Iceberg). Every other graft query builds its plan through the
  * DataFrame API; a reference user's SQL transcripts enter through SQL
  * text, and this family proves that surface end-to-end: the statement
  * goes through Spark's SQL parser into the SAME Catalyst pipeline and
  * must hash-match the DuckDB oracle like any DataFrame-built plan.
  */
object SqlQueries {

  val all: Seq[QueryDef] = Seq(

    // SQL1: the §3.2 Bronze→clean sequence as ONE Spark SQL text over a
    // registered view — timestamp parse from the raw string (CTAS
    // shape), null-parse guard, retention DELETE as a predicate, NY
    // wall-time day (the ALTER+UPDATE local_timestamp step), per-day
    // OHLC bars, the null/negative audit counter, and the corrective
    // vwap UPDATE as a CASE (`vwap=(low+high)/2 WHERE vwap<low OR
    // vwap>high` — the transcript's final statement).
    //
    // Parity notes: the synthetic vwap0 = close + (open−close)·2 keeps
    // every arithmetic exact-in-double (2-decimal inputs, ×2 and /2 are
    // exact IEEE scalings), so the CASE compares identical doubles on
    // both engines. Scale shape: one scan → one (user, day) hash
    // aggregate — identical plan to a2's DataFrame form; the parser is
    // the only thing this row adds.
    QueryDef(
      "sql1_bronze_clean",
      Some("""WITH src AS (
             |  SELECT event_id, user_id,
             |    CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
             |      '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ts2,
             |    value
             |  FROM events),
             |filt AS (
             |  SELECT * FROM src
             |  WHERE ts2 IS NOT NULL AND ts2 >= TIMESTAMP '2024-01-08'),
             |days AS (
             |  SELECT *, CAST((ts2 AT TIME ZONE 'UTC')
             |    AT TIME ZONE 'America/New_York' AS DATE) AS ny_day
             |  FROM filt),
             |picked AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY user_id, ny_day
             |      ORDER BY ts2, event_id) AS rn_a,
             |    row_number() OVER (PARTITION BY user_id, ny_day
             |      ORDER BY ts2 DESC, event_id DESC) AS rn_d
             |  FROM days),
             |bars AS (
             |  SELECT user_id, ny_day,
             |    max(CASE WHEN rn_a = 1 THEN value END) AS open,
             |    max(value) AS high, min(value) AS low,
             |    max(CASE WHEN rn_d = 1 THEN value END) AS close,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(count_if(value < 0) AS BIGINT) AS n_neg
             |  FROM picked GROUP BY 1, 2),
             |fixed AS (
             |  SELECT *, close + (open - close) * 2 AS vwap0 FROM bars)
             |SELECT user_id, ny_day, open, high, low, close, n, n_neg,
             |  CASE WHEN vwap0 < low OR vwap0 > high
             |    THEN (low + high) / 2 ELSE vwap0 END AS vwap,
             |  CAST(CASE WHEN vwap0 < low OR vwap0 > high
             |    THEN 1 ELSE 0 END AS BIGINT) AS corrected
             |FROM fixed""".stripMargin),
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("events_v")
        s.sql(
          """WITH src AS (
            |  SELECT event_id, user_id,
            |    to_timestamp(date_format(ts, 'yyyy-MM-dd HH:mm:ss'),
            |      'yyyy-MM-dd HH:mm:ss') AS ts2,
            |    value
            |  FROM events_v),
            |filt AS (
            |  SELECT * FROM src
            |  WHERE ts2 IS NOT NULL AND ts2 >= TIMESTAMP '2024-01-08'),
            |days AS (
            |  SELECT *,
            |    to_date(from_utc_timestamp(ts2, 'America/New_York'))
            |      AS ny_day
            |  FROM filt),
            |picked AS (
            |  SELECT *,
            |    row_number() OVER (PARTITION BY user_id, ny_day
            |      ORDER BY ts2, event_id) AS rn_a,
            |    row_number() OVER (PARTITION BY user_id, ny_day
            |      ORDER BY ts2 DESC, event_id DESC) AS rn_d
            |  FROM days),
            |bars AS (
            |  SELECT user_id, ny_day,
            |    max(CASE WHEN rn_a = 1 THEN value END) AS open,
            |    max(value) AS high, min(value) AS low,
            |    max(CASE WHEN rn_d = 1 THEN value END) AS close,
            |    count(*) AS n,
            |    count_if(value < 0) AS n_neg
            |  FROM picked GROUP BY 1, 2),
            |fixed AS (
            |  SELECT *, close + (open - close) * 2 AS vwap0 FROM bars)
            |SELECT user_id, ny_day, open, high, low, close, n, n_neg,
            |  CASE WHEN vwap0 < low OR vwap0 > high
            |    THEN (low + high) / 2 ELSE vwap0 END AS vwap,
            |  CAST(CASE WHEN vwap0 < low OR vwap0 > high
            |    THEN 1 ELSE 0 END AS BIGINT) AS corrected
            |FROM fixed""".stripMargin)
      }),

    // SQL2: SQL text OVER THE TABLE FORMAT — the "Athena reads Iceberg"
    // composition (§3.2's other half): the snapshot table takes a commit
    // plus a merge-on-read delete, its readMor view registers as a temp
    // view, and an analyst-shaped window query (per-user last-5 with lag
    // deltas) runs as pure SQL text against it. The row proves the text
    // surface and the table-format read path compose: the manifest-
    // pinned, delete-vector-subtracted frame is what the parser's plan
    // scans, and the hash must match the declarative oracle over the
    // surviving rows.
    QueryDef(
      "sql2_table_sql",
      Some("""WITH t AS (
             |  SELECT user_id, event_id, ts, value FROM events
             |  WHERE event_id % 6 <> 0),
             |w AS (
             |  SELECT user_id, event_id, value,
             |    value - lag(value) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS dv,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM t)
             |SELECT user_id, event_id, value, dv,
             |  CAST(rn AS BIGINT) AS rn
             |FROM w WHERE rn <= 5""".stripMargin),
      (s, d) => {
        import graft.operators.SnapshotTable
        import org.apache.spark.sql.functions.col
        val t = graft.Sinks.dir(s, "sql2_table", d)
        val p = new org.apache.hadoop.fs.Path(t)
        val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fsys.exists(p)) fsys.delete(p, true)
        SnapshotTable.commit(s,
          Tables.events(s, d).select("user_id", "event_id", "ts", "value"),
          t)
        SnapshotTable.deleteWhere(s, t, "event_id",
          col("event_id") % 6 === 0)
        SnapshotTable.readMor(s, t).createOrReplaceTempView("sql2_tbl")
        s.sql(
          """WITH w AS (
            |  SELECT user_id, event_id, value,
            |    value - lag(value) OVER (PARTITION BY user_id
            |      ORDER BY ts, event_id) AS dv,
            |    row_number() OVER (PARTITION BY user_id
            |      ORDER BY ts DESC, event_id DESC) AS rn
            |  FROM sql2_tbl)
            |SELECT user_id, event_id, value, dv,
            |  CAST(rn AS BIGINT) AS rn
            |FROM w WHERE rn <= 5""".stripMargin)
      }),

    // SQL3: CORRELATED scalar subquery (the TPC-H Q17 shape — "rows
    // below half their part's average quantity"). What this row proves
    // is DECORRELATION: Catalyst's RewriteCorrelatedScalarSubquery must
    // turn the per-row subquery into ONE per-part aggregate joined back
    // to the fact — executed as two scans + a hash/merge join, never a
    // subquery per row (which would be O(n·groups) and a scale killer;
    // the naive interpretation at 100 TB re-scans lineitem per row).
    // Plan-pinned in `Plans` (aggregate + equi-join, no per-row
    // subquery execution).
    //
    // Parity: l_quantity is integral (1..50), so per-part sums are
    // exact in double at any accumulation order, avg = one exact IEEE
    // division, and ×0.5 is an exact scaling — the boundary compare is
    // bit-identical on both engines. Output sums ride exact BIGINTs.
    QueryDef(
      "sql3_decorrelated_subquery",
      Some("""SELECT l.l_partkey AS partkey,
             |  CAST(count(*) AS BIGINT) AS n_small,
             |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
             |    AS qty_small
             |FROM lineitem l
             |WHERE l.l_quantity < (
             |  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
             |  WHERE l2.l_partkey = l.l_partkey)
             |GROUP BY 1""".stripMargin),
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
        s.sql(
          """SELECT l.l_partkey AS partkey,
            |  CAST(count(*) AS BIGINT) AS n_small,
            |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
            |    AS qty_small
            |FROM lineitem_v l
            |WHERE l.l_quantity < (
            |  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem_v l2
            |  WHERE l2.l_partkey = l.l_partkey)
            |GROUP BY 1""".stripMargin)
      }),

    // SQL4: the PARSER-TIER extension end-to-end — ASOF LEFT JOIN as SQL
    // TEXT (graft.parser.AsOfSqlParser via injectParser), the one engine
    // extension surface the other tiers don't reach. The statement below
    // is the syntax DuckDB ships natively (the oracle runs it verbatim
    // modulo the view name); in Spark the injected parser lowers it onto
    // the AsOfJoin operator — union + one ordered window forward-fill,
    // one shuffle by key — NOT a range join, so the SQL user gets j7's
    // 100 TB-safe plan from text. Negative space (stock SQL untouched,
    // ASOF-in-literal, inner-ASOF falls through to the stock syntax
    // error) is pinned by AsOfSqlParserSpec.
    QueryDef(
      "sql4_asof_sugar",
      Some("""SELECT e.event_id, e.user_id, e.ts, e.value,
             |  sg.sv AS last_signup_value
             |FROM events e
             |ASOF LEFT JOIN
             |  (SELECT user_id, ts AS sts, value AS sv FROM events
             |   WHERE event_type = 'signup') sg
             |  ON e.user_id = sg.user_id AND sg.sts <= e.ts""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.select("event_id", "user_id", "ts", "value")
          .createOrReplaceTempView("sql4_events")
        ev.filter(org.apache.spark.sql.functions.col("event_type")
            === "signup")
          .selectExpr("user_id", "ts AS sts", "value AS sv")
          .createOrReplaceTempView("sql4_signups")
        s.sql(
          """SELECT e.event_id, e.user_id, e.ts, e.value,
            |  sg.sv AS last_signup_value
            |FROM sql4_events e
            |ASOF LEFT JOIN sql4_signups sg
            |ON e.user_id = sg.user_id AND sg.sts <= e.ts""".stripMargin)
      }),
  )
}
