package graft

/** DummyClassifier control (mlprep_dummy): the baselines are closed-form
  * functions of four class counts, so every metric is pinnable exactly —
  * the majority strategy's accuracy IS the test share of the train-majority
  * class, uniform's accuracy is exactly 1/2, and stratified's recall is the
  * train prior (to 1 ulp of the quantizer).
  */
class MlPrepDummySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val out = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_dummy").get.fn(spark, dir)
    .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getLong(8), r.getLong(9)))

  test("every group emits exactly the three sklearn strategies") {
    for ((et, grp) <- out.groupBy(_._1)) {
      assert(grp.map(_._2).sorted.toSeq ==
        Seq("most_frequent", "stratified", "uniform"), et)
      val (nTr, nTe) = (grp.head._3, grp.head._5)
      assert(nTr > 0 && nTe > 0, s"$et: degenerate split")
    }
  }

  test("most_frequent accuracy equals the test share of the train-majority class") {
    val mf = out.filter(_._2 == "most_frequent")
    assert(mf.nonEmpty)
    for ((et, _, nTr, posTr, nTe, posTe, accQ, p1Q, _, _) <- mf) {
      val maj = if (2 * posTr > nTr) 1L else 0L
      val share = (if (maj == 1L) posTe else nTe - posTe).toDouble / nTe
      assert(accQ == math.floor(share * 1e9 + 0.5).toLong,
        s"$et: acc_q $accQ vs majority-share ${share}")
      // predicting all-0 has no positive predictions: precision 0 by the
      // zero_division=0 convention
      if (maj == 0L) assert(p1Q == 0L, s"$et: all-negative precision")
    }
  }

  test("uniform: accuracy exactly 1/2, precision = test prior, recall 1/2") {
    for ((et, _, _, _, nTe, posTe, accQ, p1Q, r1Q, _) <-
         out.filter(_._2 == "uniform")) {
      assert(accQ == 500000000L, s"$et: uniform acc")
      val prior = posTe.toDouble / nTe
      assert(math.abs(p1Q - math.floor(prior * 1e9 + 0.5).toLong) <= 1L,
        s"$et: uniform precision should be the test prior")
      if (posTe > 0) assert(math.abs(r1Q - 500000000L) <= 1L,
        s"$et: uniform recall")
    }
  }

  test("stratified: recall equals the train prior (1-ulp tolerance)") {
    for ((et, _, nTr, posTr, _, posTe, _, _, r1Q, _) <-
         out.filter(_._2 == "stratified") if posTe > 0) {
      val p = posTr.toDouble / nTr
      assert(math.abs(r1Q - math.floor(p * 1e9 + 0.5).toLong) <= 1L,
        s"$et: stratified recall $r1Q vs train prior $p")
    }
  }
}
