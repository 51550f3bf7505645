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
}
