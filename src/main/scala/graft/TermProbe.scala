package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: LEG-LEVEL scale attribution for the rows the full-board
  * scale sweeps flag as frontier (steepest-ratio) entries. Each query is
  * decomposed into its candidate cost terms and every term is timed on
  * the fixture AND an N× replica, so the observed super-linearity (or
  * its absence) gets attributed to a specific expression instead of a
  * guess. Round 10 named tx3_token_count and a28_cms_topk; round 12 adds
  * the r11 20×-sweep frontier — f12_json_extract_cast (13.4×),
  * j6_interval_join (11.8×), tx8_pii_scrub (10.5×):
  *
  *  f12 — events scan floor, the from_json parse alone, the try_cast
  *        leg, full query. The parse is per-CHAR (props payload), so its
  *        leg is judged against the props char ratio.
  *  j6  — lineitem/orders scan floors, the bare equi join (no band
  *        filter), full query. Replicas keep 1:N join density by
  *        construction, so every leg should track the row ratio.
  *  tx8 — events scan floor, the mask (regexp_replace) leg, the three
  *        countMatches legs as one, the extract leg, full query. All
  *        per-char regex automata over props, judged like tx3's.
  *
  *
  *  tx3 — null scan (row/IO floor), whitespace split, BPE regex
  *        extract-all, full query. If the regex leg's ratio tracks the
  *        full query's, the cost is the per-CHAR regex automaton — a
  *        data-sized, embarrassingly parallel term (and the replica's
  *        `_k`-suffixed words make replica chars > N× fixture chars, so
  *        a ratio slightly above N on the regex leg is the CHAR ratio,
  *        not a scale bug).
  *  a28 — md5 cell build (4 hashes/row → 256-cell agg), exact per-user
  *        agg, probe join + top-k, full query. The sketch merge is
  *        constant-width (256 cells); the user-sized legs grow with the
  *        replica's NEW users by construction.
  *
  * Usage: runMain graft.TermProbe <srcDir> <replicaDir> [--factor N]
  * (replicaDir must already hold a ScaleProbe synthesis; TermProbe never
  * writes fixtures.) SPARK_GRAFT_PROBE_OUT writes the JSON artifact.
  */
object TermProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TermProbe <srcDir> <replicaDir>")
    val (src, rep) = (args(0), args(1))
    val factor = args.sliding(2).collectFirst {
      case Array("--factor", n) => n.toLong }.getOrElse(40L)
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    // ---- tx3 legs ------------------------------------------------------
    def docs(d: String) = Tables.fanOut(Tables.documents(spark, d))
    val bpe = "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"
    val tx3Legs: Seq[(String, String => DataFrame)] = Seq(
      "tx3_scan_floor" -> (d => docs(d).select(col("doc_id"),
        length(col("text")).cast("long").as("n"))),
      "tx3_ws_split" -> (d => docs(d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))),
      "tx3_bpe_regex" -> (d => docs(d).select(col("doc_id"),
        size(expr(bpe)).cast("long").as("n"))),
      "tx3_full" -> (d => SparkEntry.queries("tx3_token_count")(spark, d)))

    // ---- a28 legs ------------------------------------------------------
    import graft.operators.TextOps.hash32
    val w = 64
    def bucketOf(u: org.apache.spark.sql.Column,
                 ri: org.apache.spark.sql.Column) =
      hash32(concat(u.cast("string"), lit("#"), ri.cast("string"))) % w
    def ev(d: String) = Tables.events(spark, d).select("user_id")
    def cells(d: String) = ev(d)
      .select(col("user_id"), explode(sequence(lit(0), lit(3))).as("ri"))
      .select(col("ri"), bucketOf(col("user_id"), col("ri")).as("bucket"))
      .groupBy("ri", "bucket").agg(count(lit(1)).as("cnt"))
    def exact(d: String) = ev(d).groupBy("user_id")
      .agg(count(lit(1)).as("exact_count"))
    val a28Legs: Seq[(String, String => DataFrame)] = Seq(
      "a28_cell_build" -> (d => cells(d)),
      "a28_exact_users" -> (d => exact(d)),
      "a28_probe_topk" -> (d => exact(d)
        .select(col("user_id"), col("exact_count"),
          explode(sequence(lit(0), lit(3))).as("ri"))
        .select(col("user_id"), col("exact_count"), col("ri"),
          bucketOf(col("user_id"), col("ri")).as("bucket"))
        .join(broadcast(cells(d)), Seq("ri", "bucket"))
        .groupBy("user_id")
        .agg(min("cnt").as("cms_count"),
          max("exact_count").as("exact_count"))
        .orderBy(col("cms_count").desc, col("user_id")).limit(20)),
      "a28_full" -> (d => SparkEntry.queries("a28_cms_topk")(spark, d)))

    // ---- f12 legs ------------------------------------------------------
    def evFull(d: String) = Tables.fanOut(Tables.events(spark, d))
    val f12Legs: Seq[(String, String => DataFrame)] = Seq(
      "f12_scan_floor" -> (d => evFull(d).select(col("event_id"),
        length(col("props")).cast("long").as("n"))),
      "f12_json_parse" -> (d => evFull(d).select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k_value"))),
      "f12_try_cast" -> (d => evFull(d).select(col("event_id"),
        expr("try_cast(event_type AS double)").as("type_as_num"))),
      "f12_full" -> (d => SparkEntry.queries("f12_json_extract_cast")(spark, d)))

    // ---- j6 legs -------------------------------------------------------
    val j6Legs: Seq[(String, String => DataFrame)] = Seq(
      "j6_lineitem_floor" -> (d => Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))),
      "j6_orders_floor" -> (d => Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_orderdate"))),
      "j6_equi_join" -> (d => Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"),
          col("l_shipdate"))),
      "j6_full" -> (d => SparkEntry.queries("j6_interval_join")(spark, d)))

    // ---- tx8 legs ------------------------------------------------------
    import graft.operators.TextOps.{maskAll, countMatches}
    import graft.operators.TextOps.{DigitRun => digitRun,
      EmailPat => emailPat, SsnPat => ssnPat}
    val tx8Legs: Seq[(String, String => DataFrame)] = Seq(
      "tx8_scan_floor" -> (d => evFull(d).select(col("event_id"),
        length(col("props")).cast("long").as("n"))),
      "tx8_mask" -> (d => evFull(d).select(col("event_id"),
        maskAll(col("props"), digitRun, "<N>").as("masked"))),
      "tx8_counts" -> (d => evFull(d).select(col("event_id"),
        countMatches(col("props"), digitRun).as("a"),
        countMatches(col("props"), emailPat).as("b"),
        countMatches(col("props"), ssnPat).as("c"))),
      "tx8_extract" -> (d => evFull(d).select(col("event_id"),
        regexp_extract(col("props"), "([0-9]+)", 1).as("run"))),
      "tx8_full" -> (d => SparkEntry.queries("tx8_pii_scrub")(spark, d)))

    // the replica's text is longer than N× the fixture's (per-replica
    // word suffixes); report the char ratio so tx3 legs are judged
    // against CHARS, not rows
    val baseChars = docs(src).agg(sum(length(col("text")))).head().getLong(0)
    val repChars = docs(rep).agg(sum(length(col("text")))).head().getLong(0)
    println(f"[term] chars: base=$baseChars rep=$repChars " +
      f"char_ratio=${repChars.toDouble / baseChars}%.1f (factor=$factor)")

    // optional group selector: --legs tx3,f12 runs only those families
    val groups: Map[String, Seq[(String, String => DataFrame)]] = Map(
      "tx3" -> tx3Legs, "a28" -> a28Legs, "f12" -> f12Legs,
      "j6" -> j6Legs, "tx8" -> tx8Legs)
    val selected = args.sliding(2).collectFirst {
      case Array("--legs", g) => g.split(",").toSeq }
      .getOrElse(Seq("tx3", "a28", "f12", "j6", "tx8"))
    val results = selected.flatMap(groups).map { case (name, fn) =>
      fn(src).limit(1).count() // plan warm-up outside the timing
      val b = time(fn(src))
      val g = time(fn(rep))
      val r = g / b
      println(f"[term] $name%-18s base=$b%7.2fs x$factor=$g%7.2fs " +
        f"ratio=$r%5.1f")
      (name, b, g, r)
    }
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { path =>
      val json = results.map { case (q, b, g, r) =>
        f"""  "$q": {"base": $b%.3f, "big": $g%.3f, "ratio": $r%.2f}"""
      }.mkString("{\n \"factor\": " + factor +
        ",\n \"char_ratio\": " +
        f"${repChars.toDouble / baseChars}%.2f" +
        ",\n \"legs\": {\n", ",\n", "\n }\n}")
      val p = new java.io.PrintWriter(path); p.write(json); p.close()
    }
    spark.stop()
  }
}
