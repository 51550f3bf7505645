package graft

import org.apache.spark.sql.functions._

/** ROC curve (mlprep_roc_curve): every point must equal a driver-side
  * brute-force sweep over the RAW rows (count comparisons per threshold —
  * no histogram, no window: independent arithmetic), the curve must be
  * monotone in both axes as the threshold drops, and the last point must
  * classify everything positive (TPR = FPR = 1).
  */
class MlPrepRocCurveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val roc = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_roc_curve").get.fn

  test("points match a brute-force sweep; curve is monotone") {
    val out = roc(spark, dir).collect().map(r => (r.getDate(0).toString,
      r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7)))
    val rows = Tables.events(spark, dir).select(
        date_trunc("week", col("ts")).cast("date").as("period"),
        when(col("value") >= 100.0, 1L).otherwise(0L).as("y"),
        ((col("event_id") % 20).cast("double") / 20.0 +
          when(col("value") >= 100.0 && col("event_id") % 3 === 0, 0.35)
            .otherwise(0.0)).as("s"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2)))
    assert(out.nonEmpty)
    for ((period, pts) <- out.groupBy(_._1)) {
      val ev = rows.filter(_._1 == period)
      val np = ev.count(_._2 == 1L); val nn = ev.size - np
      for ((_, thr, tp, fp, fn, tn, tprQ, fprQ) <- pts) {
        // brute force: classify every raw row at this threshold
        val eTp = ev.count(e => e._3 >= thr && e._2 == 1L)
        val eFp = ev.count(e => e._3 >= thr && e._2 == 0L)
        assert((tp, fp) == ((eTp, eFp)), s"$period@$thr: tp/fp")
        assert(fn == np - eTp && tn == nn - eFp, s"$period@$thr: fn/tn")
        assert(tprQ == math.floor(tp.toDouble / np * 1e9 + 0.5).toLong)
        assert(fprQ == math.floor(fp.toDouble / nn * 1e9 + 0.5).toLong)
      }
      // monotone as the threshold drops; terminal point is all-positive
      val sorted = pts.sortBy(-_._2)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) =>
        b._3 >= a._3 && b._4 >= a._4 }, s"$period: not monotone")
      assert(sorted.last._3 == np && sorted.last._4 == nn,
        s"$period: terminal point must classify all positive")
      // the distinct-score sweep is the complete curve: one point per
      // distinct raw score
      assert(pts.length == ev.map(_._3).distinct.length)
    }
  }
}
