package graft

import org.apache.spark.sql.functions._

/** PCA via power iteration (mlprep_pca): the returned (eigenvalue,
  * eigenvector) must agree with the CLOSED-FORM symmetric-3×3 eigen
  * solution (the trigonometric characteristic-root formula — entirely
  * independent arithmetic: acos/cos, which the query never touches), the
  * vector must be unit-norm with the sign convention v1 ≥ 0, and the
  * eigen residual ‖Cv − λv‖∞ must vanish at eigen-solution scale.
  */
class MlPrepPcaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val pca = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_pca").get.fn

  /** Largest eigenvalue of a symmetric 3×3 (trig closed form). */
  private def eigMax(a: Array[Array[Double]]): Double = {
    val p1 = a(0)(1) * a(0)(1) + a(0)(2) * a(0)(2) + a(1)(2) * a(1)(2)
    val q = (a(0)(0) + a(1)(1) + a(2)(2)) / 3.0
    if (p1 == 0.0) return math.max(a(0)(0), math.max(a(1)(1), a(2)(2)))
    val p2 = math.pow(a(0)(0) - q, 2) + math.pow(a(1)(1) - q, 2) +
      math.pow(a(2)(2) - q, 2) + 2.0 * p1
    val p = math.sqrt(p2 / 6.0)
    val b = Array.tabulate(3, 3)((i, j) =>
      (a(i)(j) - (if (i == j) q else 0.0)) / p)
    val detB =
      b(0)(0) * (b(1)(1) * b(2)(2) - b(1)(2) * b(2)(1)) -
      b(0)(1) * (b(1)(0) * b(2)(2) - b(1)(2) * b(2)(0)) +
      b(0)(2) * (b(1)(0) * b(2)(1) - b(1)(1) * b(2)(0))
    val r = math.max(-1.0, math.min(1.0, detB / 2.0))
    q + 2.0 * p * math.cos(math.acos(r) / 3.0)
  }

  test("matches the closed-form eigen solution; residual vanishes") {
    val out = pca(spark, dir).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2) / 1e9, r.getLong(3) / 1e9,
        Array(r.getLong(4) / 1e9, r.getLong(5) / 1e9, r.getLong(6) / 1e9)))
      .toMap
    val rows = Tables.events(spark, dir).select(col("event_type"),
        hour(col("ts")).cast("double").as("x1"),
        dayofweek(col("ts")).cast("double").as("x2"),
        dayofmonth(col("ts")).cast("double").as("x3"))
      .collect()
      .map(r => (r.getString(0), Array(r.getDouble(1), r.getDouble(2),
        r.getDouble(3))))
    assert(out.nonEmpty && out.keySet == rows.map(_._1).toSet)
    for ((et, (n, eig, evr, v)) <- out) {
      val xs = rows.filter(_._1 == et).map(_._2)
      assert(n == xs.length, s"$et: row count")
      val mu = Array.tabulate(3)(i => xs.map(_(i)).sum / xs.length)
      val c = Array.tabulate(3, 3)((i, j) =>
        xs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / xs.length)
      val l1 = eigMax(c)
      assert(math.abs(eig - l1) <= 1e-6 * math.max(1.0, l1),
        s"$et: eig $eig vs closed-form $l1")
      val trace = c(0)(0) + c(1)(1) + c(2)(2)
      assert(math.abs(evr - l1 / trace) <= 1e-6, s"$et: evr")
      val nrm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) <= 1e-6, s"$et: not unit norm")
      assert(v(0) >= -1e-9, s"$et: sign convention v1 >= 0")
      val res = Array.tabulate(3)(i =>
        (0 until 3).map(j => c(i)(j) * v(j)).sum - eig * v(i))
      assert(res.map(math.abs).max <= 1e-6 * math.max(1.0, l1),
        s"$et: eigen residual ${res.map(math.abs).max}")
    }
  }
}
