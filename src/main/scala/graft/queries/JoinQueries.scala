package graft.queries

import graft.{Parity, QueryDef, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** SURVEY §2.3 joins. Join-strategy notes for scale:
  *  - dimension sides (region/nation/customer subsets, band tables) are
  *    `broadcast()`-hinted — no shuffle of the fact side;
  *  - fact-fact joins are equi-keyed so Catalyst picks shuffled hash / SMJ
  *    on the join key, the partitioning a 1000-executor cluster wants;
  *  - the interval join keeps an equality key (orderkey) next to its range
  *    predicate, so it is an equi-join with a residual filter, NOT a
  *    cartesian range scan;
  *  - the as-of join is the union+ffill rewrite (see [[AsOfJoin]]) — one
  *    shuffle, no candidate explosion.
  */
object JoinQueries {
  import Parity._

  val all: Seq[QueryDef] = Seq(

    // J1: cross join — small dim × small derived dim (the symbols×grid
    // shape; both sides tiny => BroadcastNestedLoop, no shuffle).
    QueryDef(
      "j1_cross_join",
      Some("""SELECT r.r_name, p.o_orderpriority
             |FROM region r CROSS JOIN
             |  (SELECT DISTINCT o_orderpriority FROM orders) p""".stripMargin),
      (s, d) =>
        Tables.region(s, d).crossJoin(
          Tables.orders(s, d).select("o_orderpriority").distinct())
          .select("r_name", "o_orderpriority")),

    // J2: broadcast equi join chain through two dimensions — revenue by
    // nation (customer and nation broadcast; orders never re-shuffled).
    QueryDef(
      "j2_broadcast_dim_join",
      Some(s"""SELECT n.n_name,
              |  CAST(SUM(${oLq("o.o_totalprice")}) AS DOUBLE) / 100.0
              |    AS revenue,
              |  count(*) AS n_orders
              |FROM orders o
              |JOIN customer c ON o.o_custkey = c.c_custkey
              |JOIN nation n ON c.c_nationkey = n.n_nationkey
              |GROUP BY n.n_name""".stripMargin),
      (s, d) =>
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
                col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
                col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          // lq long path: o_totalprice ≤ ~6e5 2-decimal → q ≤ 6e7,
          // ~1.5e11 rows/group headroom
          .agg((sum(lq(col("o_totalprice"))).cast("double") / 100.0)
                 .as("revenue"),
               count(lit(1)).as("n_orders"))),

    // J3+J8: complete grid LEFT JOIN facts on a 2-part key, missing→default
    // (the Silver grid join, Procesamiento_fase_1.ipynb:209 + the fill
    // default of my_stock_functions.py:242). Grid = users × days, generated
    // distributed (S11), never collected to the driver.
    QueryDef(
      "j3_grid_left_join",
      Some(s"""WITH grid AS (
              |  SELECT u.user_id, CAST(g.d AS DATE) AS day
              |  FROM (SELECT DISTINCT user_id FROM events) u
              |  CROSS JOIN generate_series(DATE '2024-01-01',
              |    DATE '2024-01-30', INTERVAL 1 DAY) g(d)),
              |daily AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day,
              |    CAST(SUM(${oLq("value")}) AS DOUBLE) / 100.0 AS day_value,
              |    count(*) AS n
              |  FROM events GROUP BY 1, 2)
              |SELECT g.user_id, g.day,
              |  COALESCE(d.day_value, 0.0) AS day_value,
              |  COALESCE(d.n, 0) AS n
              |FROM grid g LEFT JOIN daily d
              |  ON g.user_id = d.user_id AND g.day = d.day""".stripMargin),
      (s, d) => {
        val users = Tables.events(s, d).select("user_id").distinct()
        val days = s.range(1).select(explode(sequence(
          lit("2024-01-01").cast("date"), lit("2024-01-30").cast("date"),
          expr("INTERVAL 1 DAY"))).as("day"))
        val grid = users.crossJoin(broadcast(days))
        val daily = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg((sum(lq(col("value"))).cast("double") / 100.0)
                 .as("day_value"),
               count(lit(1)).as("n"))
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            coalesce(col("day_value"), lit(0.0)).as("day_value"),
            coalesce(col("n"), lit(0L)).as("n"))
      }),

    // J4: inner merge with column-subset right side (adjusted-close shape,
    // my_alpaca.py:163) — per-row derived margin is exact IEEE both sides.
    QueryDef(
      "j4_inner_subset_join",
      Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
             |  p.p_retailprice,
             |  l.l_extendedprice - l.l_quantity * p.p_retailprice AS margin
             |FROM lineitem l
             |JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin),
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_retailprice")),
                col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("p_retailprice"),
            (col("l_extendedprice") - col("l_quantity") * col("p_retailprice"))
              .as("margin"))),

    // J5: feature-append fold — three independently aggregated feature
    // frames left-joined one by one onto the daily base, right side winning
    // on overlap (my_alpaca.py:308-335 drop-then-join order). Catalyst
    // fuses the three joins over the shared (user_id, day) partitioning.
    QueryDef(
      "j5_feature_fold",
      Some(s"""WITH base AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
              |  FROM events GROUP BY 1, 2),
              |f1 AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day,
              |    CAST(SUM(${oLq("value")}) AS DOUBLE) / 100.0 AS total_value
              |  FROM events GROUP BY 1, 2),
              |f2 AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day,
              |    max(value) AS max_value
              |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
              |f3 AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day,
              |    count(*) AS n_errors
              |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
              |SELECT b.user_id, b.day, b.n, f1.total_value, f2.max_value,
              |  f3.n_errors
              |FROM base b
              |LEFT JOIN f1 ON b.user_id = f1.user_id AND b.day = f1.day
              |LEFT JOIN f2 ON b.user_id = f2.user_id AND b.day = f2.day
              |LEFT JOIN f3 ON b.user_id = f3.user_id AND b.day = f3.day""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        def daily(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        val base = daily(ev).agg(count(lit(1)).as("n"))
        val f1 = daily(ev).agg((sum(lq(col("value"))).cast("double") / 100.0)
          .as("total_value"))
        val f2 = daily(ev.filter(col("event_type") === "purchase"))
          .agg(max("value").as("max_value"))
        val f3 = daily(ev.filter(col("event_type") === "error"))
          .agg(count(lit(1)).as("n_errors"))
        // right-wins fold: drop any overlapping non-key column, then join
        Seq(f1, f2, f3).foldLeft(base) { (acc, f) =>
          val overlap = f.columns.toSet
            .intersect(acc.columns.toSet) -- Seq("user_id", "day")
          overlap.foldLeft(acc)(_ drop _).join(f, Seq("user_id", "day"), "left")
        }
      }),

    // J6: interval (validity-range) join — equi key + range predicate, the
    // constituents-assignment shape (my_alpaca.py:283-290): lineitems that
    // shipped within 60 days of their order date.
    QueryDef(
      "j6_interval_join",
      Some("""SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate,
             |  CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
             |    AS ship_lag_days
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |WHERE l.l_shipdate >= o.o_orderdate
             |  AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY""".stripMargin),
      (s, d) =>
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
                col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >= col("o_orderdate") &&
                  col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAY"))
          .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"),
            col("l_shipdate"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
              .as("ship_lag_days"))),

    // J6b: non-equi band join — value banded against a generated dimension
    // (broadcast nested loop on a tiny side; the size_index assignment
    // flavor where no equi key exists).
    QueryDef(
      "j6b_band_join",
      Some("""WITH bands AS (
             |  SELECT CAST(g.i AS BIGINT) AS band_id,
             |    CAST(g.i * 50 AS DOUBLE) AS lo,
             |    CAST((g.i + 1) * 50 AS DOUBLE) AS hi
             |  FROM generate_series(0, 9) g(i))
             |SELECT e.event_id, e.value, b.band_id
             |FROM events e LEFT JOIN bands b
             |  ON e.value >= b.lo AND e.value < b.hi""".stripMargin),
      (s, d) => {
        val bands = s.range(0, 10).select(
          col("id").as("band_id"),
          (col("id") * 50).cast("double").as("lo"),
          ((col("id") + 1) * 50).cast("double").as("hi"))
        Tables.events(s, d)
          .join(broadcast(bands),
                col("value") >= col("lo") && col("value") < col("hi"), "left")
          .select("event_id", "value", "band_id")
      }),

    // J7: as-of join — each event joined to the latest prior 'purchase' of
    // the same user (union+ffill rewrite vs DuckDB's native ASOF JOIN).
    QueryDef(
      "j7_asof_join",
      Some("""SELECT e.event_id, e.user_id, e.ts, e.value,
             |  p.pv AS last_purchase_value
             |FROM events e
             |ASOF LEFT JOIN
             |  (SELECT user_id, ts AS pts, value AS pv FROM events
             |   WHERE event_type = 'purchase') p
             |  ON e.user_id = p.user_id AND p.pts <= e.ts""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value").as("pv"))
        AsOfJoin.backward(
            ev.select("event_id", "user_id", "ts", "value"), purchases,
            key = "user_id", leftTs = "ts", rightTs = "pts",
            payload = Seq("pv"))
          .withColumnRenamed("pv", "last_purchase_value")
      }),

    // J13: as-of join with TOLERANCE (pandas merge_asof(tolerance=...)):
    // the latest prior purchase counts only if it is at most 1 hour stale —
    // the quote-staleness bound every market-data as-of join carries in
    // production. Same single forward-fill pass as j7; the bound is one
    // projection over exact epoch microseconds. Oracle: DuckDB's native
    // ASOF JOIN with the staleness CASE applied to the matched row.
    QueryDef(
      "j13_asof_tolerance",
      Some("""SELECT e.event_id, e.user_id, e.ts, e.value,
             |  CASE WHEN p.pts IS NOT NULL
             |        AND epoch_us(e.ts) - epoch_us(p.pts) <= 3600000000
             |       THEN p.pv END AS recent_purchase_value
             |FROM events e
             |ASOF LEFT JOIN
             |  (SELECT user_id, ts AS pts, value AS pv FROM events
             |   WHERE event_type = 'purchase') p
             |  ON e.user_id = p.user_id AND p.pts <= e.ts""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value").as("pv"))
        AsOfJoin.backward(
            ev.select("event_id", "user_id", "ts", "value"), purchases,
            key = "user_id", leftTs = "ts", rightTs = "pts",
            payload = Seq("pv"), toleranceSeconds = Some(3600L))
          .withColumnRenamed("pv", "recent_purchase_value")
      }),

    // Semi/anti joins (implicit membership filters in the reference, P2):
    QueryDef(
      "j9_semi_anti",
      Some("""SELECT c.c_custkey, c.c_mktsegment,
             |  EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             |          AND o.o_orderpriority = '1-URGENT') AS has_urgent
             |FROM customer c""".stripMargin),
      (s, d) => {
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct()
        Tables.customer(s, d)
          .join(broadcast(urgent.withColumn("has_urgent", lit(true))),
                col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_mktsegment"),
            coalesce(col("has_urgent"), lit(false)).as("has_urgent"))
      }),

    // J10: skew-robust salted join ([[graft.operators.SaltedJoin]]) — the
    // fact side salted by hash(event_id) mod 8, the dim side replicated ×8,
    // equi-join on (user_id, salt). Results are IDENTICAL to the plain
    // join (the oracle is the plain join); what changes is the shuffle
    // layout: a hot user's rows spread over 8 partitions instead of one.
    // `shuffle_hash`-hinted so the salted path actually materializes at
    // fixture scale (a 150-row dim would otherwise broadcast, which is the
    // RIGHT default — SaltedJoin is for when the dim is too big to
    // broadcast and a key is too hot for one task; the hint makes the
    // bench measure that regime, and Plans asserts no-broadcast).
    QueryDef(
      "j10_salted_skew_join",
      Some(s"""WITH dim AS (
              |  SELECT user_id, ${oLavg("value")} AS user_mean
              |  FROM events GROUP BY user_id)
              |SELECT e.event_id, e.user_id, e.value, d.user_mean,
              |  e.value - d.user_mean AS dev
              |FROM events e JOIN dim d USING (user_id)""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val dim = ev.groupBy("user_id")
          .agg(lavg(col("value")).as("user_mean"))
          .hint("shuffle_hash")
        graft.operators.SaltedJoin.join(
            ev.select("event_id", "user_id", "value"), dim,
            keys = Seq("user_id"), spreadCol = col("event_id"),
            saltBuckets = 8)
          .select(col("event_id"), col("user_id"), col("value"),
            col("user_mean"), (col("value") - col("user_mean")).as("dev"))
      }),

    // J11: Bloom-filter join pruning (graft.operators.BloomPrune) — the
    // selective-dim join with the fact side pre-filtered by a 512-byte
    // Bloom filter over the dim's keys, so non-matching fact rows (here
    // ~97%) never reach the join. The oracle is the PLAIN join: blooms
    // have no false negatives, so result identity with the un-pruned join
    // IS the operator's contract, and the hash compare verifies it
    // end-to-end (false positives are removed by the real join). At
    // 100 TB this is the pre-shuffle row reducer when the dim is too big
    // to broadcast as a semi-join key set — the filter stays m/8 bytes no
    // matter how many keys the dim has.
    QueryDef(
      "j11_bloom_prune",
      Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
             |  o.o_totalprice, o.o_orderpriority
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |WHERE o.o_totalprice > 489000.0""".stripMargin),
      (s, d) => {
        val dim = Tables.orders(s, d)
          .filter(col("o_totalprice") > 489000.0)
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
        val fact = Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity")
        graft.operators.BloomPrune
          .prune(fact, "l_orderkey", dim.select("o_orderkey"), "o_orderkey")
          .join(dim, col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "o_totalprice", "o_orderpriority")
      }),

    // J12: the star-schema rollup (TPC-H Q5 shape) — revenue per nation
    // for one region: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    // The declarative form is the point: Catalyst broadcasts every
    // dimension (nation/region always; customer by statistics) and the
    // one genuinely data-sized join (orders ⋈ lineitem on orderkey)
    // carries the only big exchange — at 100 TB both fact tables are
    // orderkey-bucketed and even that disappears. Revenue rides the
    // whole-unit quantization: cents × (100 − discount_cents) is an
    // exact integer per row (≤1e9), summed as long, de-scaled once.
    QueryDef(
      "j12_star_revenue",
      Some("""SELECT n.n_name,
             |  CAST(SUM(CAST(floor(l.l_extendedprice * 100.0 + 0.5)
             |    AS BIGINT) * (100 - CAST(floor(l.l_discount * 100.0
             |    + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
             |  count(*) AS n_items
             |FROM lineitem l
             |JOIN orders o ON l.l_orderkey = o.o_orderkey
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |WHERE r.r_name = 'ASIA'
             |GROUP BY n.n_name""".stripMargin),
      (s, d) => {
        val rev = floor(col("l_extendedprice") * 100.0 + 0.5).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100.0 + 0.5).cast("long"))
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), rev.as("rev"))
          .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg((sum("rev").cast("double") / 10000.0).as("revenue"),
            count(lit(1)).as("n_items"))
      }),

    // J14: fuzzy entity resolution via token blocking — the record-linkage
    // join (Fellegi-Sunter blocking + edit-distance verify) that a
    // catalog/feed consolidation pipeline runs: collapse rows to name
    // entities, generate candidate pairs ONLY where a blocking key (a
    // shared name token) agrees, verify candidates with levenshtein ≤ 2,
    // and report the merge impact (row counts behind each entity).
    //
    // Scale design: the pair space is token-blocked (the dd5 posting-list
    // shape — Σ df² over blocking keys, never |entities|²), with a df cap
    // so a stop-token never contributes O(df²) candidates; entities are
    // the DISTINCT names (the DedupStage rep trick), so the quadratic
    // verify runs on the collapsed vocabulary, not the row count; the
    // expensive levenshtein runs only on blocked candidates. Recall
    // relative to all-pairs is a property of the blocking keys (like
    // LSH's banding), stated here: a pair must share one unedited token.
    //
    // Parity: levenshtein is the classic integer DP on both engines;
    // counts are exact longs; no floats anywhere.
    QueryDef(
      "j14_fuzzy_blocking",
      Some("""WITH n AS (
             |  SELECT p_name, count(*) AS n_parts FROM part GROUP BY 1),
             |t AS (
             |  SELECT p_name, unnest(string_split(p_name, ' ')) AS tok
             |  FROM n),
             |ok AS (
             |  SELECT tok FROM t GROUP BY tok HAVING count(*) <= 48),
             |c AS (
             |  SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
             |  FROM t a JOIN ok USING (tok) JOIN t b USING (tok)
             |  WHERE a.p_name < b.p_name),
             |v AS (
             |  SELECT name_a, name_b,
             |    CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
             |  FROM c WHERE levenshtein(name_a, name_b) <= 2)
             |SELECT v.name_a, v.name_b, v.dist,
             |  CAST(na.n_parts AS BIGINT) AS parts_a,
             |  CAST(nb.n_parts AS BIGINT) AS parts_b
             |FROM v
             |JOIN n na ON na.p_name = v.name_a
             |JOIN n nb ON nb.p_name = v.name_b""".stripMargin),
      (s, d) => {
        val names = Tables.part(s, d)
          .groupBy("p_name").agg(count(lit(1)).as("n_parts"))
          .persist() // entity dim: read by the postings and both sides
        val toks = names.select(col("p_name"),
          explode(split(col("p_name"), " ")).as("tok"))
        // blocking-key df cap: a token shared by everything is a stop
        // token, not evidence of identity
        val ok = toks.groupBy("tok").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 48).select("tok")
        val cand = toks.select(col("p_name").as("name_a"), col("tok"))
          .join(ok, "tok")
          .join(toks.select(col("p_name").as("name_b"), col("tok")), "tok")
          .filter(col("name_a") < col("name_b"))
          .select("name_a", "name_b").distinct()
        cand
          .filter(levenshtein(col("name_a"), col("name_b")) <= 2)
          .select(col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b")).cast("long")
              .as("dist"))
          .join(names.select(col("p_name").as("name_a"),
            col("n_parts").as("parts_a")), "name_a")
          .join(names.select(col("p_name").as("name_b"),
            col("n_parts").as("parts_b")), "name_b")
          .select("name_a", "name_b", "dist", "parts_a", "parts_b")
      }),

    // J15: SCD2 as-of dimension enrichment — the lookup pl17's interval
    // dimension EXISTS for, composed end-to-end: every event joins the
    // attribute version valid on its day (user equi-key + day within
    // [valid_from, valid_to] — the classic warehouse SCD2 pattern), here
    // rolled up per validity interval: event count, how many events
    // carry the interval's dominant type, and the dominance fraction.
    // Both sides derive from the SAME shared code/SQL as pl17
    // (PipelineQueries.scd2Dim / scd2OracleCtes), so dimension drift
    // between producer and consumer fails the hash.
    //
    // Scale shape: equi-key on user_id with the interval check as a
    // residual — at 100 TB both sides are user-bucketed so the join is
    // exchange-free, and per-user interval counts are small (runs over
    // days), bounding the range fanout.
    QueryDef(
      "j15_scd2_enrich",
      Some(s"""WITH ${PipelineQueries.scd2OracleCtes},
              |e AS (
              |  SELECT user_id, CAST(ts AS DATE) AS day, event_type
              |  FROM events)
              |SELECT e.user_id, s.run_id,
              |  s.event_type AS dominant_type,
              |  CAST(count(*) AS BIGINT) AS n_events,
              |  CAST(sum(CASE WHEN e.event_type = s.event_type
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dominant,
              |  CAST(sum(CASE WHEN e.event_type = s.event_type
              |    THEN 1 ELSE 0 END) AS DOUBLE) /
              |    CAST(count(*) AS DOUBLE) AS dominant_frac
              |FROM e JOIN scd s
              |  ON e.user_id = s.user_id
              |  AND e.day BETWEEN s.valid_from AND s.valid_to
              |GROUP BY 1, 2, 3""".stripMargin),
      (s, d) => {
        val dim = PipelineQueries.scd2Dim(s, d).select(
          col("user_id").as("dim_user"), col("run_id"),
          col("event_type").as("dominant_type"),
          col("valid_from"), col("valid_to"))
        val e = Tables.events(s, d).select(col("user_id"),
          to_date(col("ts")).as("day"), col("event_type"))
        e.join(dim, col("user_id") === col("dim_user") &&
            col("day").between(col("valid_from"), col("valid_to")))
          .groupBy(col("user_id"), col("run_id"), col("dominant_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("event_type") === col("dominant_type"), 1L)
              .otherwise(0L)).as("n_dominant"))
          .select(col("user_id"), col("run_id"), col("dominant_type"),
            col("n_events"), col("n_dominant"),
            (col("n_dominant").cast("double") /
              col("n_events").cast("double")).as("dominant_frac"))
      }),

    // J16: GRID-BUCKETED interval join — the large×large time-overlap
    // join with NO shared equi key, the case j6 (equi key + range) and
    // j6b (tiny broadcast dim) don't cover. A naive plan is a nested
    // loop over the cross product — unrunnable at scale. The standard
    // fix (the Databricks range-join / GeoSpark grid technique): quantize
    // time into fixed buckets, EXPLODE each interval into the ≤3 buckets
    // it can touch (bucket width = half the window, so the fan-out is a
    // small constant), map each point to its single bucket, equi-join on
    // the bucket — shuffle-able, partition-parallel, skew-safe — then
    // refine with the exact interval predicate. Each (point, interval)
    // pair meets exactly once because the point owns ONE bucket.
    //
    // Workload: "hot windows" — every event with value ≥ 280 opens a
    // ±15 min window (both sides data-sized, windows carry no user key);
    // count, per event, the hot windows that contain it. All bucket and
    // refine arithmetic is exact integer microseconds; the oracle is the
    // declarative interval join.
    QueryDef(
      "j16_grid_interval_join",
      Some("""WITH hot AS (
             |  SELECT event_id AS hot_id, ts AS hts
             |  FROM events WHERE value >= 280.0)
             |SELECT e.event_id, CAST(count(*) AS BIGINT) AS n_hot
             |FROM events e JOIN hot h
             |  ON e.ts >= h.hts - INTERVAL 15 MINUTE
             |  AND e.ts < h.hts + INTERVAL 15 MINUTE
             |  AND e.event_id <> h.hot_id
             |GROUP BY 1""".stripMargin),
      (s, d) => {
        val W = 900000000L // 15 min in microseconds = bucket width
        val ev = Tables.events(s, d)
          .select(col("event_id"), unix_micros(col("ts")).as("em"))
        // exact integer bucket math (all micros positive, so DIV == floor)
        val pts = ev.withColumn("b", expr(s"em DIV $W"))
        val hot = Tables.events(s, d).filter(col("value") >= 280.0)
          .select(col("event_id").as("hot_id"),
            unix_micros(col("ts")).as("hm"))
          .withColumn("b", explode(sequence(
            expr(s"(hm - $W) DIV $W"), expr(s"(hm + $W) DIV $W"))))
        pts.join(hot, Seq("b"))
          .filter(col("em") >= col("hm") - W && col("em") < col("hm") + W &&
            col("event_id") =!= col("hot_id"))
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_hot"))
      }),

    // J17: DYNAMIC PARTITION PRUNING — the runtime half of partition
    // pruning, which static pushdown (s1) cannot do: the fact table is
    // day-PARTITIONED on disk, the probe days are known only by READING
    // a filtered dim, and Catalyst injects the dim's day set into the
    // fact scan's partition filters at execution (via the reused
    // broadcast), so 26 of 30 day-directories are never opened. At
    // 100 TB this is THE mechanism that keeps star-schema joins from
    // scanning the whole fact table when the predicate lives on the
    // dimension; Plans pins `dynamicpruningexpression` in the fact
    // scan's partition filters. Both sides are real parquet sources
    // (the dim is written and read back so its filter cannot constant-
    // fold into a static partition predicate). Parity: counts and lq
    // long sums; the flag rule (day-of-month mod 7 = 3) is exact
    // integer arithmetic on both engines.
    QueryDef(
      "j17_dpp_prune",
      Some(s"""WITH daily AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
             |    CAST(SUM(${oLq("value")}) AS DOUBLE) / 100.0 AS total
             |  FROM events GROUP BY 1, 2)
             |SELECT user_id, day, CAST(n AS BIGINT) AS n, total
             |FROM daily
             |WHERE EXTRACT(DAY FROM day) % 7 = 3""".stripMargin),
      (s, d) => {
        val base = graft.Sinks.dir(s, "dpp", d)
        val daily = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"),
            (sum(lq(col("value"))).cast("double") / 100.0).as("total"))
        daily.repartition(col("day"))
          .write.mode("overwrite").partitionBy("day")
          .parquet(s"$base/fact")
        daily.select("day").distinct()
          .withColumn("flag", dayofmonth(col("day")) % 7)
          .write.mode("overwrite").parquet(s"$base/dim")
        val fact = s.read.parquet(s"$base/fact")
        val dim = s.read.parquet(s"$base/dim")
          .filter(col("flag") === 3).select("day")
        fact.join(broadcast(dim), "day")
          .select("user_id", "day", "n", "total")
      }),

    // J19: NULL-SAFE equi join (`<=>` / IS NOT DISTINCT FROM) — the
    // semantic corner every dimension-conforming pipeline hits when the
    // join key is itself nullable ("unattributed" rows carry NULL): a
    // plain `=` join silently DROPS the NULL group on both sides, the
    // null-safe operator matches it — and it remains a hash-joinable
    // EQUI key (Spark plans BroadcastHashJoin on <=>; no fallback to
    // nested loops). The row proves the NULL×NULL match end-to-end:
    // one-seventh of events get a NULL key, both aggregates keep their
    // NULL row, and the joined output must contain it (non-vacuity
    // asserted in-query: a plain join would return one row fewer).
    QueryDef(
      "j19_null_safe_join",
      Some("""WITH k AS (
             |  SELECT CASE WHEN event_id % 7 = 0 THEN NULL
             |    ELSE user_id END AS key, event_type, value
             |  FROM events),
             |a AS (
             |  SELECT key, count(*) AS n_all FROM k GROUP BY 1),
             |b AS (
             |  SELECT key, count(*) AS n_click FROM k
             |  WHERE event_type = 'click' GROUP BY 1)
             |SELECT a.key, a.n_all, b.n_click
             |FROM a JOIN b ON a.key IS NOT DISTINCT FROM b.key"""
        .stripMargin),
      (s, d) => {
        val k = Tables.events(s, d).select(
          when(col("event_id") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("user_id")).as("key"),
          col("event_type"))
        val a = k.groupBy("key").agg(count(lit(1)).as("n_all"))
        val b = k.filter(col("event_type") === "click")
          .groupBy("key").agg(count(lit(1)).as("n_click"))
          .select(col("key").as("key_b"), col("n_click"))
        val j = a.join(broadcast(b), col("key") <=> col("key_b"))
          .select(col("key"), col("n_all"), col("n_click"))
        // non-vacuity: the NULL group must survive the join — with a
        // plain `=` condition it vanishes and this row proves nothing
        require(j.filter(col("key").isNull).limit(1).count() == 1,
          "j19: the NULL key group was dropped — null-safe match broke")
        j
      }),
  )
}
