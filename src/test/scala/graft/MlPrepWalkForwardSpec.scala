package graft

import org.apache.spark.sql.functions._

/** Walk-forward retrain (mlprep_walk_forward): each window's closed-form
  * fit and out-of-window MSE must match a brute-force per-row fit/score
  * on that window's raw rows, and the window geometry must be the
  * reference's sliding scheme (7-day slide, 14-day train, 7-day test,
  * strictly disjoint roles).
  */
class MlPrepWalkForwardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val wf = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_walk_forward").get.fn

  private lazy val out = wf(spark, dir).collect().map(r => (
    r.getString(0), r.getLong(1), r.getDate(2), r.getDate(3), r.getDate(4),
    r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9),
    r.getLong(10), r.getLong(11)))

  test("window geometry: 7-day slide, 14-day train, 7-day test") {
    assert(out.nonEmpty, "no walk-forward windows on the fixture span")
    for ((_, k, ts0, te0, xe0, _, _, _, _, _, _, _) <- out) {
      assert(te0.toLocalDate == ts0.toLocalDate.plusDays(14))
      assert(xe0.toLocalDate == te0.toLocalDate.plusDays(7))
      val lo = out.filter(_._2 == 0L).head._3.toLocalDate
      assert(ts0.toLocalDate == lo.plusDays(7 * k))
    }
    // at least two windows so the walk actually walks
    assert(out.map(_._2).distinct.length >= 2)
  }

  test("one window's fit and out-of-window MSE match per-row brute force") {
    val (et, k, ts0, te0, xe0, nTrain, nTest, b0q, b1q, b2q, trq, teq) =
      out.minBy(r => (r._1, r._2))
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).cast("double").as("x1"),
        dayofweek(col("ts")).cast("double").as("x2"),
        graft.Parity.lq(col("value")).cast("double").as("y"))
      .filter(col("event_type") === et &&
        col("day") >= lit(ts0) && col("day") < lit(xe0))
      .collect().map(r => (r.getDate(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val (train, test) = rows.partition(_._1.before(te0))
    assert(train.length == nTrain && test.length == nTest)
    val a = Array.ofDim[Double](3, 4)
    for ((_, x1, x2, y) <- train) {
      val x = Array(1.0, x1, x2)
      for (i <- 0 until 3; j <- 0 until 3) a(i)(j) += x(i) * x(j)
      for (i <- 0 until 3) a(i)(3) += x(i) * y
    }
    for (p <- 0 until 3) {
      val piv = (p until 3).maxBy(r => math.abs(a(r)(p)))
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      for (r <- 0 until 3 if r != p) {
        val fc = a(r)(p) / a(p)(p)
        for (c2 <- p to 3) a(r)(c2) -= fc * a(p)(c2)
      }
    }
    val b = Array(a(0)(3) / a(0)(0), a(1)(3) / a(1)(1), a(2)(3) / a(2)(2))
    assert(math.abs(b0q / 1e7 - b(0)) < 1e-4, s"$et/$k intercept")
    assert(math.abs(b1q / 1e7 - b(1)) < 1e-4, s"$et/$k hour slope")
    assert(math.abs(b2q / 1e7 - b(2)) < 1e-4, s"$et/$k dow slope")
    def mse(part: Array[(java.sql.Date, Double, Double, Double)]): Double =
      part.map { case (_, x1, x2, y) =>
        val e = y - (b(0) + b(1) * x1 + b(2) * x2); e * e
      }.sum / part.length
    assert(math.abs(trq - mse(train)) <= 1.0, s"train MSE $trq vs ${mse(train)}")
    assert(math.abs(teq - mse(test)) <= 1.0, s"test MSE $teq vs ${mse(test)}")
  }
}
