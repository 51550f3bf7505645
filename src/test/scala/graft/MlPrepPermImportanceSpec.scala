package graft

import org.apache.spark.sql.functions._

/** Permutation importance (mlprep_permutation_importance): every MSE must
  * equal a brute-force PER-ROW evaluation on driver-side data — the fitted
  * model applied row by row to the original and the cyclically-shifted
  * feature columns (the query never touches rows after its one windowed
  * pass; this replay does nothing BUT rows) — and the permutation must be
  * the stated cyclic shift (multiset-preserving, first row wraps to last).
  */
class MlPrepPermImportanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val pi = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_permutation_importance").get.fn

  test("MSEs match a per-row replay of the shifted columns") {
    val out = pi(spark, dir).collect().map(r => ((r.getString(0),
      r.getLong(2)), (r.getLong(1), r.getLong(3) / 1e6, r.getLong(4) / 1e6)))
      .toMap
    val rows = Tables.events(spark, dir).select(col("event_type"),
        col("event_id"),
        hour(col("ts")).cast("double").as("x1"),
        dayofweek(col("ts")).cast("double").as("x2"),
        (floor(col("value") * 100.0 + 0.5) / 100.0).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    for (et <- rows.map(_._1).distinct) {
      val ev = rows.filter(_._1 == et).sortBy(_._2)
      val n = ev.length
      // cyclic shift: row i takes row i−1's value, row 0 takes the last's
      def shifted(f: ((String, Long, Double, Double, Double)) => Double) =
        Array.tabulate(n)(i => f(ev((i - 1 + n) % n)))
      val x1p = shifted(_._3); val x2p = shifted(_._4)
      assert(x1p.sorted.sameElements(ev.map(_._3).sorted),
        s"$et: shift must be a permutation")
      // independent OLS fit (normal equations, plain double sums)
      val sx1 = ev.map(_._3).sum; val sx2 = ev.map(_._4).sum
      val s11 = ev.map(e => e._3 * e._3).sum
      val s12 = ev.map(e => e._3 * e._4).sum
      val s22 = ev.map(e => e._4 * e._4).sum
      val sy = ev.map(_._5).sum
      val s1y = ev.map(e => e._3 * e._5).sum
      val s2y = ev.map(e => e._4 * e._5).sum
      def det3(m: Array[Array[Double]]): Double =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      val a = Array(Array(n.toDouble, sx1, sx2), Array(sx1, s11, s12),
        Array(sx2, s12, s22))
      val dt = det3(a)
      def repl(c: Int, v: Array[Double]) = {
        val m = a.map(_.clone); for (i <- 0 until 3) m(i)(c) = v(i); m }
      val rhs = Array(sy, s1y, s2y)
      val b0 = det3(repl(0, rhs)) / dt
      val b1 = det3(repl(1, rhs)) / dt
      val b2 = det3(repl(2, rhs)) / dt
      def mseRows(f1: Int => Double, f2: Int => Double): Double =
        (0 until n).map { i =>
          val e = ev(i)._5 - (b0 + b1 * f1(i) + b2 * f2(i))
          e * e
        }.sum / n
      val base = mseRows(i => ev(i)._3, i => ev(i)._4)
      val m1 = mseRows(i => x1p(i), i => ev(i)._4)
      val m2 = mseRows(i => ev(i)._3, i => x2p(i))
      for ((feat, exp) <- Seq(1L -> m1, 2L -> m2)) {
        val (qn, qBase, qPerm) = out((et, feat))
        assert(qn == n, s"$et: n")
        assert(math.abs(qBase - base) <= 1e-4 * math.max(1.0, base),
          s"$et f$feat: base mse $qBase vs $base")
        assert(math.abs(qPerm - exp) <= 1e-4 * math.max(1.0, exp),
          s"$et f$feat: perm mse $qPerm vs $exp")
      }
    }
  }
}
