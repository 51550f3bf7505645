package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Parser-tier extension (graft.parser.AsOfSqlParser): the ASOF LEFT JOIN
  * sugar must produce exactly the AsOfJoin operator's result, and the
  * negative space must hold — every stock statement (including ones
  * containing the word ASOF in a literal) parses untouched, and
  * out-of-scope ASOF forms fall through to the stock parser's error.
  */
class AsOfSqlParserSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private def views(): Unit = {
    val ev = Tables.events(spark, dir)
    ev.createOrReplaceTempView("ev_all")
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value").as("pv"))
      .createOrReplaceTempView("ev_purch")
  }

  test("sugar text equals the AsOfJoin operator result") {
    views()
    val bySql = spark.sql(
      """SELECT e.event_id, e.user_id, e.ts, p.pv AS last_pv
        |FROM ev_all e
        |ASOF LEFT JOIN ev_purch p
        |ON e.user_id = p.user_id AND p.pts <= e.ts""".stripMargin)
    val byOp = AsOfJoin.backward(
        Tables.events(spark, dir).select("event_id", "user_id", "ts"),
        spark.table("ev_purch"),
        key = "user_id", leftTs = "ts", rightTs = "pts",
        payload = Seq("pv"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("pv").as("last_pv"))
    assert(sortedRows(bySql) == sortedRows(byOp))
    assert(bySql.count() == Tables.events(spark, dir).count(),
      "left join must keep every left row")
  }

  test("flipped inequality, reversed equality, and * projection") {
    views()
    val a = spark.sql(
      """SELECT * FROM ev_all e
        |ASOF LEFT JOIN ev_purch p
        |ON p.user_id = e.user_id AND e.ts >= p.pts""".stripMargin)
    val b = spark.sql(
      """SELECT * FROM ev_all e
        |ASOF LEFT JOIN ev_purch p
        |ON e.user_id = p.user_id AND p.pts <= e.ts""".stripMargin)
    assert(sortedRows(a) == sortedRows(b))
    // merge_asof column convention: left columns then right payload
    assert(a.columns.toSeq ==
      Tables.events(spark, dir).columns.toSeq :+ "pv")
  }

  test("subquery relations parse inside the sugar") {
    views()
    val bySql = spark.sql(
      """SELECT e.event_id, p.pv AS last_pv
        |FROM (SELECT event_id, user_id, ts FROM ev_all) e
        |ASOF LEFT JOIN
        |  (SELECT user_id, ts AS pts, value AS pv FROM ev_all
        |   WHERE event_type = 'purchase') p
        |ON e.user_id = p.user_id AND p.pts <= e.ts""".stripMargin)
    assert(bySql.count() == Tables.events(spark, dir).count())
    assert(bySql.columns.toSeq == Seq("event_id", "last_pv"))
  }

  test("negative space: stock SQL is untouched") {
    views()
    // a normal join still parses and runs through the stock path
    assert(spark.sql(
      "SELECT count(*) AS c FROM ev_all e JOIN ev_purch p " +
        "ON e.user_id = p.user_id AND p.pts <= e.ts").collect()
      .head.getLong(0) > 0)
    // the word ASOF inside a string literal must not trip the detector
    val lit = spark.sql("SELECT 'ASOF LEFT JOIN is just a string' AS s")
      .collect().head.getString(0)
    assert(lit.contains("ASOF"))
    // out-of-scope form (inner ASOF JOIN) falls through to the stock
    // parser, which raises its ordinary syntax error
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM ev_all e ASOF JOIN ev_purch p " +
        "ON e.user_id = p.user_id AND p.pts <= e.ts").collect()
    }
    assert(err.getMessage.toUpperCase.contains("ASOF") ||
      err.getMessage.toLowerCase.contains("syntax"))
  }

  test("comments inside an in-scope statement do not desync the scan") {
    views()
    // line + block comments, both containing unbalanced parens and the
    // phrase ASOF JOIN — stripped before the keyword scan, so the sugar
    // still fires and matches the comment-free text
    val withComments = spark.sql(
      """SELECT e.event_id, p.pv AS last_pv -- trailing (unbalanced paren
        |FROM ev_all e /* block (comment) saying ASOF JOIN */
        |ASOF LEFT JOIN ev_purch p
        |ON e.user_id = p.user_id AND p.pts <= e.ts""".stripMargin)
    val plain = spark.sql(
      """SELECT e.event_id, p.pv AS last_pv
        |FROM ev_all e
        |ASOF LEFT JOIN ev_purch p
        |ON e.user_id = p.user_id AND p.pts <= e.ts""".stripMargin)
    assert(sortedRows(withComments) == sortedRows(plain))
  }

  test("negative space: quoted spans, subquery literals, mixed case") {
    views()
    // ASOF + an unbalanced paren inside a double-quoted string literal:
    // the span is opaque to the scanner, the stock parser runs it
    assert(spark.sql("SELECT \"ASOF (not a join\" AS s")
      .collect().head.getString(0).startsWith("ASOF"))
    // a backquoted identifier NAMED asof is content, not a keyword
    assert(spark.sql("SELECT value AS `asof` FROM ev_all LIMIT 1")
      .columns.toSeq == Seq("asof"))
    // ASOF inside a string literal inside a subquery delegates whole
    val c = spark.sql(
      "SELECT count(*) AS c FROM (SELECT * FROM ev_all " +
        "WHERE event_type <> 'ASOF LEFT JOIN x ON (') t")
      .collect().head.getLong(0)
    assert(c == Tables.events(spark, dir).count())
    // mixed-case keywords stay in scope
    val mc = spark.sql(
      """select e.event_id, p.pv as last_pv
        |from ev_all e
        |Asof Left Join ev_purch p
        |on e.user_id = p.user_id and p.pts <= e.ts""".stripMargin)
    assert(mc.count() == Tables.events(spark, dir).count())
  }

  test("aliases shadowing column names still resolve by alias") {
    views()
    // the join aliases ARE column names of the relations (value, user_id)
    val df = spark.sql(
      """SELECT value.event_id, user_id.pv AS last_pv
        |FROM ev_all value
        |ASOF LEFT JOIN ev_purch user_id
        |ON value.user_id = user_id.user_id
        |  AND user_id.pts <= value.ts""".stripMargin)
    assert(df.count() == Tables.events(spark, dir).count())
    assert(df.columns.toSeq == Seq("event_id", "last_pv"))
  }

  test("contract violations raise AnalysisException, not IAE") {
    views()
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT e.event_id FROM ev_all e
          |ASOF LEFT JOIN ev_purch p
          |ON e.user_id = p.user_id AND p.no_such_ts <= e.ts""".stripMargin)
    }
    assert(err.getMessage.contains("no_such_ts"))
  }
}
