package graft

import graft.operators.Rsi
import org.apache.spark.sql.functions._

/** Rsi operator edge contracts (the oracle hash covers the fixture path;
  * these pin the guard rails): flat series → 50, loss-free → 100,
  * gain-free → 0, recurrence resets per key, first row carries nulls. */
class RsiSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: (Long, Double)*) =
    vals.zipWithIndex.map { case ((k, v), i) =>
      (k, ts(f"2024-01-01 10:${i % 60}%02d:${i / 60}%02d"), v)
    }.toDF("user_id", "ts", "value")

  private def rsiOf(df: org.apache.spark.sql.DataFrame) =
    Rsi.rsi(df, "user_id", "ts", "value")

  test("flat series pins RSI to 50; first row is null") {
    val out = rsiOf(series((1L, 5.0), (1L, 5.0), (1L, 5.0))).orderBy("ts")
      .select("rsi").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, Some(50.0), Some(50.0)))
  }

  test("monotone up → 100, monotone down → 0") {
    val up = rsiOf(series((1L, 1.0), (1L, 2.0), (1L, 3.0)))
      .filter(col("rsi").isNotNull).select("rsi").as[Double].collect()
    assert(up.forall(_ == 100.0))
    val down = rsiOf(series((1L, 3.0), (1L, 2.0), (1L, 1.0)))
      .filter(col("rsi").isNotNull).select("rsi").as[Double].collect()
    assert(down.forall(_ == 0.0))
  }

  test("recurrence resets on key change") {
    // key 2's first row must not inherit key 1's smoothed state
    val out = rsiOf(series((1L, 1.0), (1L, 10.0), (2L, 7.0), (2L, 7.0)))
    val k2 = out.filter(col("key") === 2L).orderBy("ts")
      .select("rsi").as[Option[Double]].collect()
    assert(k2.toSeq == Seq(None, Some(50.0)))
  }

  test("rsi stays within [0, 100] on a mixed series") {
    val mixed = series((1L to 50L).map(i =>
      (1L, ((i * 37) % 11).toDouble)): _*)
    val bad = rsiOf(mixed).filter(col("rsi").isNotNull)
      .filter(col("rsi") < 0.0 || col("rsi") > 100.0 ||
        isnan(col("rsi"))).count()
    assert(bad == 0)
  }
}
