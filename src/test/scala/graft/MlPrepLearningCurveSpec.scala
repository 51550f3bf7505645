package graft

import org.apache.spark.sql.functions._

/** Learning curve (mlprep_learning_curve): each prefix model must equal a
  * driver-side least-squares refit on the RAW rows of exactly those days
  * (independent arithmetic: plain double sums over rows, not the query's
  * exact-long moment algebra), the holdout must be the last ⌈D/5⌉ days for
  * every prefix, and the day/row bookkeeping must be exact.
  */
class MlPrepLearningCurveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val lc = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_learning_curve").get.fn

  test("prefix fits match raw-row least squares on the same days") {
    val out = lc(spark, dir).collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6) / 1e9, r.getLong(7) / 1e9,
      r.getLong(8) / 1e6))
    val rows = Tables.events(spark, dir).select(col("event_type"),
        to_date(col("ts")).as("day"),
        hour(col("ts")).cast("double").as("x"),
        (floor(col("value") * 100.0 + 0.5) / 100.0).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    for ((et, grp) <- out.groupBy(_._1)) {
      assert(grp.map(_._2).sorted.sameElements(Seq(25L, 50L, 75L, 100L)),
        s"$et: expected the four fractions")
      val evs = rows.filter(_._1 == et)
      val days = evs.map(_._2).distinct.sorted(
        Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
      val d = days.length
      val t = d - (d + 4) / 5
      val testDays = days.drop(t).toSet
      val test = evs.filter(e => testDays(e._2))
      for ((_, frac, trainDays, tstDays, nTrain, nTest, b, a, mse) <- grp) {
        val kf = (t * frac + 99) / 100
        assert(trainDays == kf, s"$et f$frac: train day count")
        assert(tstDays == d - t, s"$et f$frac: test day count")
        val prefDays = days.take(kf.toInt).toSet
        val train = evs.filter(e => prefDays(e._2))
        assert(nTrain == train.length && nTest == test.length,
          s"$et f$frac: row counts")
        // independent OLS on raw rows (plain double accumulation)
        val n = train.length.toDouble
        val sx = train.map(_._3).sum; val sy = train.map(_._4).sum
        val sxx = train.map(e => e._3 * e._3).sum
        val sxy = train.map(e => e._3 * e._4).sum
        val eb = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        val ea = (sy - eb * sx) / n
        assert(math.abs(b - eb) <= 1e-6, s"$et f$frac: slope $b vs $eb")
        assert(math.abs(a - ea) <= 1e-6, s"$et f$frac: intercept")
        val emse = test.map(e => math.pow(e._4 - (ea + eb * e._3), 2)).sum /
          test.length
        assert(math.abs(mse - emse) <= 1e-4 * math.max(1.0, emse),
          s"$et f$frac: test mse $mse vs $emse")
      }
      // more data, same holdout: the 100% model is fit on every train day
      val full = grp.find(_._2 == 100L).get
      assert(full._3 == t, s"$et: 100% prefix must cover the train pool")
    }
  }
}
