package graft

import graft.operators.Macd
import org.apache.spark.sql.functions._

/** Macd operator guard rails (the oracle hash covers the fixture path):
  * identity histogram = macd − signal, constant series degenerates to
  * zero, per-key state reset. */
class MacdSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: (Long, Double)*) =
    vals.zipWithIndex.map { case ((k, v), i) =>
      (k, ts(f"2024-01-01 10:${i % 60}%02d:${i / 60}%02d"), v)
    }.toDF("user_id", "ts", "value")

  test("histogram equals macd minus signal on every row") {
    val out = Macd.macd(series((1L to 40L).map(i =>
      (1L, ((i * 13) % 7).toDouble + 1.0)): _*),
      "user_id", "ts", "value")
    assert(out.filter(col("histogram") =!=
      (col("macd") - col("signal"))).count() == 0)
  }

  test("constant series: fast = slow = x, macd/signal/histogram all zero") {
    val out = Macd.macd(series((1L, 4.0), (1L, 4.0), (1L, 4.0)),
      "user_id", "ts", "value")
    assert(out.filter(col("ewm_fast") =!= 4.0).count() == 0)
    assert(out.filter(col("macd") =!= 0.0 || col("signal") =!= 0.0 ||
      col("histogram") =!= 0.0).count() == 0)
  }

  test("state resets on key change") {
    val out = Macd.macd(
      series((1L, 1.0), (1L, 100.0), (2L, 5.0)),
      "user_id", "ts", "value")
    val k2 = out.filter(col("key") === 2L)
      .select("ewm_fast", "macd").as[(Double, Double)].head()
    assert(k2 == ((5.0, 0.0))) // seeded from its own first value
  }
}
