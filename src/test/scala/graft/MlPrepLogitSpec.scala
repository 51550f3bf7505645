package graft

import org.apache.spark.sql.functions._

/** Distributed IRLS logistic regression (mlprep_logit): the fitted
  * coefficients must be a true optimum of the logistic likelihood —
  * checked INDEPENDENTLY of the query's own arithmetic by evaluating the
  * exact-link gradient (real math.exp, not the query's deterministic
  * rational link) at the returned β on a driver-side copy of the grid —
  * and the whole pipeline must be bit-deterministic across runs.
  */
class MlPrepLogitSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val logit =
    graft.queries.MlPrepQueries.all.find(_.name == "mlprep_logit").get.fn

  test("returned coefficients zero the true logistic gradient") {
    val rows = logit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2) / 1e9, r.getLong(3) / 1e9,
        r.getLong(4) / 1e9)).toMap
    // independent grid (tiny at sf0.001 — driver-side in a TEST only)
    val grid = Tables.events(spark, dir).select(col("event_type"),
        hour(col("ts")).cast("long").as("x1"),
        dayofweek(col("ts")).cast("long").as("x2"),
        when(col("value") >= 100.0, 1L).otherwise(0L).as("y"))
      .groupBy("event_type", "x1", "x2")
      .agg(count(lit(1)).as("n"), sum("y").as("yc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(grid.nonEmpty && rows.size == grid.map(_._1).distinct.size)
    for ((et, (b0, b1, b2)) <- rows) {
      val cells = grid.filter(_._1 == et)
      val nTot = cells.map(_._4).sum.toDouble
      var g0 = 0.0; var g1 = 0.0; var g2 = 0.0
      for ((_, x1, x2, n, yc) <- cells) {
        val p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x1 + b2 * x2)))
        val r = yc - n * p
        g0 += r; g1 += x1 * r; g2 += x2 * r
      }
      // residual sources: 1e-9 coefficient quantization and the query's
      // rational link vs true exp (≤ ~2e-4 relative mid-range) — both
      // orders below this bound on real data
      assert(math.abs(g0) / nTot < 2e-3, s"$et: d/db0 = $g0 not ~0")
      assert(math.abs(g1) / (nTot * 23) < 2e-3, s"$et: d/db1 = $g1")
      assert(math.abs(g2) / (nTot * 7) < 2e-3, s"$et: d/db2 = $g2")
    }
  }

  test("training is bit-deterministic and AUC is a valid probability") {
    val a = logit(spark, dir).orderBy("event_type").collect().toSeq
    val b = logit(spark, dir).orderBy("event_type").collect().toSeq
    assert(a == b, "re-running training changed the fitted model")
    for (r <- a) {
      val auc = r.getDouble(5)
      assert(auc > 0.0 && auc < 1.0 && !auc.isNaN)
      assert(r.getLong(1) > 0)
    }
  }
}
