package graft

import org.apache.spark.sql.functions._

/** Lift / cumulative-gain curve (mlprep_lift_curve): every decile row must
  * equal a driver-side replay over raw rows (collections code — no Spark,
  * no SQL), the terminal decile must capture everything (gain = lift = 1),
  * gain must be monotone non-decreasing in decile, and the decile row
  * counts must conserve the corpus.
  */
class MlPrepLiftCurveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val lc = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_lift_curve").get.fn

  test("decile rows match a raw replay; terminal decile captures all") {
    val out = lc(spark, dir).collect().map(r => ((r.getDate(0).toString,
      r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val rows = Tables.events(spark, dir).select(
        date_trunc("week", col("ts")).cast("date").as("period"),
        when(col("value") >= 100.0, 1L).otherwise(0L).as("y"),
        ((col("event_id") % 20).cast("double") / 20.0 +
          when(col("value") >= 100.0 && col("event_id") % 3 === 0, 0.35)
            .otherwise(0.0)).as("s"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2)))
    assert(out.nonEmpty)
    for (period <- rows.map(_._1).distinct) {
      val ev = rows.filter(_._1 == period)
      val total = ev.size.toLong; val np = ev.count(_._2 == 1L).toLong
      // histogram → desc-score cum → integer decile, in plain Scala
      val hist = ev.groupBy(_._3).map { case (s, g) =>
        (s, g.size.toLong, g.count(_._2 == 1L).toLong) }
        .toSeq.sortBy(-_._1)
      var (cn, cp) = (0L, 0L)
      val exp = scala.collection.mutable.Map.empty[Long,
        (Long, Long, Long, Long)]
      for ((_, cnt, pos) <- hist) {
        cn += cnt; cp += pos
        val d = (cn * 10 + total - 1) / total
        val (n0, p0, _, _) = exp.getOrElse(d, (0L, 0L, 0L, 0L))
        exp(d) = (n0 + cnt, p0 + pos, cn, cp)
      }
      for ((d, (n, pos, ecn, ecp)) <- exp) {
        val (qn, qpos, qcn, qcp, gainQ, liftQ) = out((period, d))
        assert((qn, qpos, qcn, qcp) == ((n, pos, ecn, ecp)),
          s"$period d$d: counts")
        assert(gainQ ==
          math.floor(ecp.toDouble / np * 1e9 + 0.5).toLong,
          s"$period d$d: gain")
        assert(liftQ == math.floor(ecp.toDouble * total /
          (np.toDouble * ecn) * 1e9 + 0.5).toLong, s"$period d$d: lift")
      }
      // terminal decile captures everything; gain monotone; conservation
      val ds = exp.keys.toSeq.sorted
      assert(out((period, ds.last))._5 == 1000000000L &&
        out((period, ds.last))._6 == 1000000000L,
        s"$period: terminal decile must capture all")
      val gains = ds.map(d => out((period, d))._5)
      assert(gains.zip(gains.drop(1)).forall { case (a, b) => b >= a },
        s"$period: gain not monotone")
      assert(exp.values.map(_._1).sum == total,
        s"$period: decile rows don't conserve the corpus")
    }
  }
}
