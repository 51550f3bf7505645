package graft

import org.apache.spark.sql.functions._

/** Elastic net (mlprep_elastic_net): the λ=0 solution must converge to the
  * independent closed-form OLS fit (normal equations on raw rows — no
  * coordinate descent anywhere in the replay), the λ=1e6 solution must be
  * EXACTLY all-zero slopes with the intercept at the group mean, the λ=0.5
  * path must match a driver-side replay of the descent, and in-sample MSE
  * must be monotone non-decreasing in λ (a regularized fit can't beat OLS
  * on its own training data).
  */
class MlPrepElasticNetSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val en = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_elastic_net").get.fn

  test("OLS limit, sparsity limit, descent replay, MSE monotonicity") {
    val out = en(spark, dir).collect().map(r => ((r.getString(0),
      r.getDouble(1)), (r.getLong(2), r.getLong(3) / 1e9,
      r.getLong(4) / 1e9, r.getLong(5) / 1e9, r.getLong(6),
      r.getLong(7) / 1e6))).toMap
    val rows = Tables.events(spark, dir).select(col("event_type"),
        hour(col("ts")).cast("double").as("x1"),
        dayofweek(col("ts")).cast("double").as("x2"),
        (floor(col("value") * 100.0 + 0.5) / 100.0).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    for (et <- rows.map(_._1).distinct) {
      val ev = rows.filter(_._1 == et)
      val n = ev.length.toDouble
      val (sx1, sx2, sy) = (ev.map(_._2).sum, ev.map(_._3).sum,
        ev.map(_._4).sum)
      val c11 = ev.map(e => e._2 * e._2).sum - sx1 * sx1 / n
      val c22 = ev.map(e => e._3 * e._3).sum - sx2 * sx2 / n
      val c12 = ev.map(e => e._2 * e._3).sum - sx1 * sx2 / n
      val c1y = ev.map(e => e._2 * e._4).sum - sx1 * sy / n
      val c2y = ev.map(e => e._3 * e._4).sum - sx2 * sy / n
      // closed-form centered OLS (independent of any descent)
      val det = c11 * c22 - c12 * c12
      val ob1 = (c1y * c22 - c2y * c12) / det
      val ob2 = (c2y * c11 - c1y * c12) / det
      val (_, _, b1L0, b2L0, _, mse0) = out((et, 0.0))
      assert(math.abs(b1L0 - ob1) <= 1e-6, s"$et λ=0: b1 $b1L0 vs $ob1")
      assert(math.abs(b2L0 - ob2) <= 1e-6, s"$et λ=0: b2 $b2L0 vs $ob2")
      // full-sparsity limit: exact zeros, intercept = mean
      val (_, b0Hi, b1Hi, b2Hi, nnzHi, mseHi) = out((et, 1000000.0))
      assert(b1Hi == 0.0 && b2Hi == 0.0 && nnzHi == 0L,
        s"$et λ=1e6: slopes must be exactly zero")
      assert(math.abs(b0Hi - sy / n) <= 1e-6, s"$et λ=1e6: intercept")
      // descent replay at λ=0.5 (driver-side, same update algebra)
      var (b1, b2) = (0.0, 0.0)
      val t = 0.25
      val d1 = c11 / n + 0.25; val d2 = c22 / n + 0.25
      def soft(z: Double, dj: Double): Double =
        if (z > t) (z - t) / dj else if (z < -t) (z + t) / dj else 0.0
      for (_ <- 1 to 20) {
        b1 = soft((c1y - c12 * b2) / n, d1)
        b2 = soft((c2y - c12 * b1) / n, d2)
      }
      val (_, _, b1M, b2M, _, mseM) = out((et, 0.5))
      assert(math.abs(b1M - b1) <= 1e-6, s"$et λ=.5: b1 $b1M vs $b1")
      assert(math.abs(b2M - b2) <= 1e-6, s"$et λ=.5: b2 $b2M vs $b2")
      // in-sample MSE monotone in λ
      assert(mse0 <= mseM + 1e-6 && mseM <= mseHi + 1e-6,
        s"$et: mse not monotone in λ ($mse0, $mseM, $mseHi)")
    }
  }
}
