package graft

import org.apache.spark.sql.functions._

/** Categorical naive Bayes (mlprep_naive_bayes): the query decides each
  * grid cell with a fixed IEEE double-product tree; this spec re-derives
  * every decision in EXACT rational arithmetic (BigInt cross-
  * multiplication — no floats anywhere), so any double-tree mistake that
  * flips a cell fails loudly. It also pins the confusion-matrix
  * bookkeeping (counts conserve, accuracy matches the quantized ratio).
  */
class MlPrepNaiveBayesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val nb = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_naive_bayes").get.fn

  test("decisions match an exact-rational replay; counts conserve") {
    val out = nb(spark, dir).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val grid = Tables.events(spark, dir).select(col("event_type"),
        hour(col("ts")).cast("long").as("x1"),
        dayofweek(col("ts")).cast("long").as("x2"),
        when(col("value") >= 100.0, 1L).otherwise(0L).as("y"))
      .groupBy("event_type", "x1", "x2")
      .agg(count(lit(1)).as("n"), sum("y").as("yc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty && out.keySet == grid.map(_._1).toSet)
    for ((et, (n, nPos, tp, fp, fn, tn, accQ)) <- out) {
      val cells = grid.filter(_._1 == et)
      val nt = cells.map(_._4).sum
      val npos = cells.map(_._5).sum
      assert(n == nt && nPos == npos, s"$et: prior counts")
      val cp1 = cells.groupBy(_._2).map { case (v, cs) =>
        v -> (cs.map(_._5).sum, cs.map(_._4).sum) }
      val cp2 = cells.groupBy(_._3).map { case (v, cs) =>
        v -> (cs.map(_._5).sum, cs.map(_._4).sum) }
      val nneg = nt - npos
      var (etp, efp, efn, etn) = (0L, 0L, 0L, 0L)
      for ((_, x1, x2, cn, cyc) <- cells) {
        val (p1x1, t1) = cp1(x1); val (p1x2, t2) = cp2(x2)
        // exact: p1 > p0 ⟺ cross-multiplied BigInt products compare
        val lhs = BigInt(npos) * BigInt(p1x1 + 1) * BigInt(p1x2 + 1) *
          BigInt(nneg + 24) * BigInt(nneg + 7)
        val rhs = BigInt(nneg) * BigInt(t1 - p1x1 + 1) *
          BigInt(t2 - p1x2 + 1) * BigInt(npos + 24) * BigInt(npos + 7)
        if (lhs > rhs) { etp += cyc; efp += cn - cyc }
        else { efn += cyc; etn += cn - cyc }
      }
      assert((tp, fp, fn, tn) == ((etp, efp, efn, etn)),
        s"$et: confusion ($tp,$fp,$fn,$tn) vs exact ($etp,$efp,$efn,$etn)")
      assert(tp + fp + fn + tn == nt, s"$et: counts don't conserve")
      assert(accQ == math.floor((tp + tn).toDouble / nt * 1e9 + 0.5).toLong,
        s"$et: accuracy quantization")
    }
  }
}
