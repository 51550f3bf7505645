package graft

import org.apache.spark.sql.functions._

/** Linear SHAP (mlprep_shap_linear): attributions must satisfy the
  * Shapley ADDITIVITY axiom per row (base + Σφ = prediction), match
  * φ_j = b_j(x_j − μ_j) under an independently-fit OLS, and the global
  * mean-|φ| summary must equal a brute-force mean over ALL raw rows
  * (the query derives it from histograms; the replay never builds one).
  */
class MlPrepShapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val sh = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_shap_linear").get.fn

  test("additivity, closed-form phi, histogram-free summary replay") {
    val out = sh(spark, dir).collect().map(r => (r.getLong(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4) / 1e6,
      r.getLong(5) / 1e6, r.getLong(6) / 1e6, r.getLong(7) / 1e6,
      r.getLong(8) / 1e6, r.getLong(9) / 1e6))
    assert(out.nonEmpty)
    val rows = Tables.events(spark, dir).select(col("event_type"),
        hour(col("ts")).cast("double").as("x1"),
        dayofweek(col("ts")).cast("double").as("x2"),
        (floor(col("value") * 100.0 + 0.5) / 100.0).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    for ((et, grp) <- out.groupBy(_._2)) {
      val ev = rows.filter(_._1 == et)
      val n = ev.length.toDouble
      // independent OLS via normal equations on raw rows
      val (sx1, sx2, sy) = (ev.map(_._2).sum, ev.map(_._3).sum,
        ev.map(_._4).sum)
      val s11 = ev.map(e => e._2 * e._2).sum
      val s12 = ev.map(e => e._2 * e._3).sum
      val s22 = ev.map(e => e._3 * e._3).sum
      val s1y = ev.map(e => e._2 * e._4).sum
      val s2y = ev.map(e => e._3 * e._4).sum
      def det3(m: Array[Array[Double]]): Double =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      val a = Array(Array(n, sx1, sx2), Array(sx1, s11, s12),
        Array(sx2, s12, s22))
      val dt = det3(a)
      def repl(c: Int, v: Array[Double]) = {
        val m = a.map(_.clone); for (i <- 0 until 3) m(i)(c) = v(i); m }
      val rhs = Array(sy, s1y, s2y)
      val b0 = det3(repl(0, rhs)) / dt
      val b1 = det3(repl(1, rhs)) / dt
      val b2 = det3(repl(2, rhs)) / dt
      val mu1 = sx1 / n; val mu2 = sx2 / n
      val tol = 1e-4
      for ((_, _, x1, x2, base, p1, p2, pred, m1, m2) <- grp) {
        assert(math.abs(base + p1 + p2 - pred) <= 3e-6,
          s"$et: additivity violated")
        assert(math.abs(p1 - b1 * (x1 - mu1)) <= tol, s"$et: phi1")
        assert(math.abs(p2 - b2 * (x2 - mu2)) <= tol, s"$et: phi2")
        assert(math.abs(base - (b0 + b1 * mu1 + b2 * mu2)) <= tol,
          s"$et: base value")
        // brute-force global mean |phi| over every raw row
        val em1 = ev.map(e => math.abs(b1 * (e._2 - mu1))).sum / n
        val em2 = ev.map(e => math.abs(b2 * (e._3 - mu2))).sum / n
        assert(math.abs(m1 - em1) <= tol, s"$et: mean|phi1| $m1 vs $em1")
        assert(math.abs(m2 - em2) <= tol, s"$et: mean|phi2| $m2 vs $em2")
      }
      // the sample is the stated deterministic slice, non-empty
      assert(grp.forall(_._1 % 97 == 0) && grp.nonEmpty)
    }
  }
}
