package graft

import org.apache.spark.sql.types._

/** Loads every driver fixture table through [[Tables]] and pins the schema
  * each query family depends on. Fixture regeneration has silently changed
  * physical encodings between rounds (events.ts went parquet TIMESTAMP(NANOS)
  * → timestamp[us], breaking 108 queries at once); this spec turns any such
  * drift into ONE loud, named failure at round start instead of an opaque
  * cascade inside the verify loop.
  */
class FixtureSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  test("all ten fixture tables load and are non-empty") {
    val loads = Seq(
      "region"     -> Tables.region(spark, dir),
      "nation"     -> Tables.nation(spark, dir),
      "customer"   -> Tables.customer(spark, dir),
      "supplier"   -> Tables.supplier(spark, dir),
      "part"       -> Tables.part(spark, dir),
      "orders"     -> Tables.orders(spark, dir),
      "lineitem"   -> Tables.lineitem(spark, dir),
      "events"     -> Tables.events(spark, dir),
      "documents"  -> Tables.documents(spark, dir),
      "embeddings" -> Tables.embeddings(spark, dir)
    )
    loads.foreach { case (name, df) =>
      assert(df.limit(1).count() == 1L, s"fixture table $name is empty or unreadable")
    }
  }

  test("events.ts loads as a session-TZ timestamp regardless of fixture encoding") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    // The instant must be usable in arithmetic with literals — the exact
    // failure mode of the round-5 regression was analysis-time BINARY_OP on
    // ts; force analysis + execution of a representative expression.
    val n = ev.selectExpr("date_trunc('DAY', ts) AS d", "hour(ts) AS h")
      .where("d IS NOT NULL").limit(5).count()
    assert(n == 5L)
  }

  test("key column contracts the query families depend on") {
    // lineitem/orders timestamps have always surfaced as NTZ (naive micros,
    // matching DuckDB's view); only events.ts is normalized by Tables.events.
    val li = fields(Tables.lineitem(spark, dir))
    assert(li("l_shipdate") == TimestampNTZType)
    assert(li("l_quantity") == DoubleType)
    assert(li("l_orderkey") == LongType)

    val ord = fields(Tables.orders(spark, dir))
    assert(ord("o_orderdate") == TimestampNTZType)
    assert(ord("o_totalprice") == DoubleType)

    val ev = fields(Tables.events(spark, dir))
    assert(ev("event_id") == LongType)
    assert(ev("user_id") == LongType)
    assert(ev("event_type") == StringType)
    assert(ev("value") == DoubleType)
    assert(ev("props") == StringType)

    val doc = fields(Tables.documents(spark, dir))
    assert(doc("doc_id") == LongType)
    assert(doc("text") == StringType)
    assert(doc("lang") == StringType)
    assert(doc("source") == StringType)
    assert(doc("n_chars") == LongType)

    val emb = fields(Tables.embeddings(spark, dir))
    assert(emb("vec_id") == LongType)
    assert(emb("embedding") == ArrayType(FloatType, containsNull = true))
  }
}
