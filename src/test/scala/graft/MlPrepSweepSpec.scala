package graft

import org.apache.spark.sql.functions._

/** One-scan λ×CV ridge sweep (mlprep_sweep): the moment-algebra shortcut
  * (train = total − fold; test SSE from the held-out fold's own moments)
  * must agree with a brute-force per-row fit/score, and ridge shrinkage
  * must behave (slope norm non-increasing in λ; the flagged winner is the
  * true CV argmin).
  */
class MlPrepSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val sweep =
    graft.queries.MlPrepQueries.all.find(_.name == "mlprep_sweep").get.fn

  private lazy val rows = sweep(spark, dir).collect().map(r => (
    r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
    r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
    r.getLong(9), r.getLong(10)))

  test("fold-complement OLS matches a brute-force per-row fit and score") {
    import graft.operators.TextOps.hash32
    val data = Tables.events(spark, dir).select(col("event_type"),
        (hash32(concat(lit("cv:"), col("event_id").cast("string"))) % 5)
          .as("fold"),
        hour(col("ts")).cast("double").as("x1"),
        dayofweek(col("ts")).cast("double").as("x2"),
        graft.Parity.lq(col("value")).cast("double").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val (et, fold) = (data.head._1, 0L)
    val train = data.filter(d => d._1 == et && d._2 != fold)
    val test = data.filter(d => d._1 == et && d._2 == fold)
    // driver-side normal-equation solve (λ=0) via Gaussian elimination
    val a = Array.ofDim[Double](3, 4)
    for ((_, _, x1, x2, y) <- train) {
      val x = Array(1.0, x1, x2)
      for (i <- 0 until 3; j <- 0 until 3) a(i)(j) += x(i) * x(j)
      for (i <- 0 until 3) a(i)(3) += x(i) * y
    }
    for (p <- 0 until 3) {
      val piv = (p until 3).maxBy(r => math.abs(a(r)(p)))
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      for (r <- 0 until 3 if r != p) {
        val f = a(r)(p) / a(p)(p)
        for (c2 <- p to 3) a(r)(c2) -= f * a(p)(c2)
      }
    }
    val beta = Array(a(0)(3) / a(0)(0), a(1)(3) / a(1)(1), a(2)(3) / a(2)(2))
    val mse = test.map { case (_, _, x1, x2, y) =>
      val e = y - (beta(0) + beta(1) * x1 + beta(2) * x2); e * e
    }.sum / test.size
    val row = rows.find(r => r._1 == et && r._2 == fold && r._3 == 0.0).get
    assert(row._4 == train.size && row._5 == test.size)
    assert(math.abs(row._6 / 1e7 - beta(0)) < 1e-4, "intercept diverged")
    assert(math.abs(row._7 / 1e7 - beta(1)) < 1e-4, "hour slope diverged")
    assert(math.abs(row._8 / 1e7 - beta(2)) < 1e-4, "dow slope diverged")
    assert(math.abs(row._9 - mse) <= 1.0,
      s"moment-form test MSE ${row._9} vs per-row $mse")
  }

  test("ridge shrinkage is monotone and the winner is the CV argmin") {
    for (((et, fold), grp) <- rows.groupBy(r => (r._1, r._2))) {
      val byLam = grp.sortBy(_._3)
      val norms = byLam.map(r =>
        (r._7 / 1e7) * (r._7 / 1e7) + (r._8 / 1e7) * (r._8 / 1e7))
      for (i <- 1 until norms.length)
        assert(norms(i) <= norms(i - 1) + 1e-9,
          s"$et/$fold: slope norm grew from λ=${byLam(i - 1)._3}")
    }
    for ((et, grp) <- rows.groupBy(_._1)) {
      val cv = grp.groupBy(_._3).map { case (lam, g) =>
        (lam, g.map(_._9).sum, g.head._10) }
      // cv_mse_sum_q really is the fold sum
      cv.foreach { case (_, sum9, reported) => assert(sum9 == reported) }
      val winner = cv.minBy(c => (c._2, c._1))._1
      val flagged = grp.filter(_._11 == 1L).map(_._3).distinct.toSeq
      assert(flagged == Seq(winner), s"$et: flagged $flagged, argmin $winner")
    }
  }
}
