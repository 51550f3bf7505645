package graft

import org.apache.spark.sql.functions._

/** Gradient boosting over the histogram grid (mlprep_gbt): round 0 is
  * exactly checkable without any sigmoid machinery — F₀ = 0 makes p = ½
  * EXACTLY, so G = n/2 − y and H = n/4 per cell are rationals a driver-side
  * brute force reproduces precisely; the chosen stump, its leaf values,
  * and its gain must match. Plus structural invariants over all rounds.
  */
class MlPrepGbtSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val gbt =
    graft.queries.MlPrepQueries.all.find(_.name == "mlprep_gbt").get.fn

  private lazy val out = gbt(spark, dir).collect().map(r => (
    r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
    r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))

  test("round-0 stump matches an exact brute-force Newton split search") {
    val grid = Tables.events(spark, dir).select(col("event_type"),
        hour(col("ts")).cast("long").as("x1"),
        dayofweek(col("ts")).cast("long").as("x2"),
        when(col("value") >= 100.0, 1L).otherwise(0L).as("y"))
      .groupBy("event_type", "x1", "x2")
      .agg(count(lit(1)).as("n"), sum("y").as("yc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    for ((et, round0) <- out.filter(_._2 == 0L).groupBy(_._1)) {
      val row = round0.head
      val cells = grid.filter(_._1 == et)
      // p = 1/2 exactly at F0=0: G = n/2 − y, H = n/4 (quantized to the
      // same 1e-9 grid the query uses: pq = 5e8 exactly, hq = n·2.5e8)
      def gh(sub: Array[(String, Long, Long, Long, Long)]): (Double, Double) =
        (sub.map(c => c._4 * 0.5 - c._5).sum, sub.map(_._4 * 0.25).sum)
      val best = (for {
        f <- Seq(1L, 2L)
        t <- cells.map(c => if (f == 1L) c._2 else c._3).distinct.sorted
          .dropRight(1)
      } yield {
        val (l, r) = cells.partition(c => (if (f == 1L) c._2 else c._3) <= t)
        val ((glv, hlv), (grv, hrv), (gtv, htv)) = (gh(l), gh(r), gh(cells))
        val gain = glv * glv / (hlv + 1) + grv * grv / (hrv + 1) -
          gtv * gtv / (htv + 1)
        (gain, f, t, -glv / (hlv + 1), -grv / (hrv + 1))
      }).maxBy(x => (x._1, -x._2, -x._3))
      assert((row._3, row._4) == (best._2, best._3),
        s"$et round 0: query stump (${row._3},${row._4}) vs brute " +
          s"(${best._2},${best._3})")
      assert(math.abs(row._5 / 1e9 - best._4) < 1e-6, s"$et left leaf")
      assert(math.abs(row._6 / 1e9 - best._5) < 1e-6, s"$et right leaf")
      assert(math.abs(row._7 / 1e6 - best._1) < 1.0, s"$et gain")
    }
  }

  test("structural invariants across rounds") {
    for ((et, grp) <- out.groupBy(_._1)) {
      assert(grp.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L),
        s"$et: expected one stump per round")
      for (r <- grp) {
        assert(r._3 == 1L || r._3 == 2L)
        assert(r._8 > 0.0 && r._8 < 1.0 && !r._8.isNaN,
          s"$et round ${r._2}: auc ${r._8} not a probability")
        // unpruned fixed-round boosting: a late round may pick a
        // near-zero (even slightly negative) gain stump — its two
        // leaves then degenerate toward the common root Newton step,
        // still reducing loss. Round 0 must be decisively positive.
      }
      // (no sign assertion on gain: at tiny SFs the λ=1 penalty can
      // dominate every candidate — the brute-force test above already
      // proves the query picks the true argmax either way)
      // a base rate below 1/2 pulls both round-0 leaves negative
      val r0 = grp.find(_._2 == 0L).get
      assert(r0._5 < 0 && r0._6 < 0,
        s"$et: round-0 leaves should correct the 0-init toward log-odds")
    }
  }
}
