package graft

/** Feature importance (mlprep_importance): must reconstruct from the
  * mlprep_tree STRUCTURE independently — each split's gini decrease
  * recomputed from the tree's own node/leaf counts — and normalize to 1.
  */
class MlPrepImportanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(n: String) =
    graft.queries.MlPrepQueries.all.find(_.name == n).get.fn

  test("importances are tree-consistent and normalized") {
    val imp = q("mlprep_importance")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tree = q("mlprep_tree")(spark, dir).collect().map(r => (
      r.getString(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(5),
      r.getLong(6)))
    def gini(n: Long, p: Long): Double =
      n.toDouble - ((p * p).toDouble + ((n - p) * (n - p)).toDouble) /
        n.toDouble
    for ((et, grp) <- imp.groupBy(_._1)) {
      // normalization: quantized shares sum to 1e9 within rounding
      assert(math.abs(grp.map(_._4).sum - 1000000000L) <= grp.length,
        s"$et: importances don't sum to 1")
      // independent reconstruction from the tree's structure: child
      // counts come from the subtree's leaf rows (conservation-proven)
      val ts = tree.filter(_._1 == et)
      val dec = scala.collection.mutable.Map.empty[Long, Double]
      for ((_, lvl, node, Some(feat), n, pos) <- ts if lvl <= 2) {
        val span = 1L << (3 - lvl).toInt
        def side(offset: Long, width: Long): (Long, Long) = {
          val leaves = ts.filter(x => x._2 == 3L &&
            x._3 >= node * span + offset && x._3 < node * span + offset + width)
          (leaves.map(_._5).sum, leaves.map(_._6).sum)
        }
        val (nl, pl) = side(0, span / 2)
        val (nr, pr) = side(span / 2, span / 2)
        assert(nl + nr == n && pl + pr == pos)
        dec(feat) = dec.getOrElse(feat, 0.0) +
          (gini(n, pos) - gini(nl, pl) - gini(nr, pr))
      }
      val tot = dec.values.sum
      for ((_, feat, nSplits, impQ) <- grp) {
        assert(dec.contains(feat), s"$et: importance for unsplit feature")
        assert(math.abs(impQ / 1e9 - dec(feat) / tot) < 1e-4,
          s"$et feat $feat: query ${impQ / 1e9} vs tree ${dec(feat) / tot}")
      }
      assert(imp.filter(_._1 == et).map(_._3).sum ==
        tree.count(x => x._1 == et && x._2 <= 2 && x._4.isDefined),
        s"$et: split count mismatch vs the tree")
    }
  }
}
