package graft

import org.apache.spark.sql.functions._

/** Random forest over the histogram grid (mlprep_forest): one tree's
  * weighted split search must match a driver-side brute force on the same
  * deterministic bootstrap weights, the bootstrap must actually look like
  * Poisson(1), and the per-tree randomness must follow the declared hash
  * functions exactly (reproducibility is the point of hash-derived
  * randomness).
  */
class MlPrepForestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val forest =
    graft.queries.MlPrepQueries.all.find(_.name == "mlprep_forest").get.fn

  private lazy val out = forest(spark, dir).collect().map(r => (
    r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
    r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8),
    r.getDouble(9)))

  /** Driver-side copy of one tree's bootstrap-weighted cells. */
  private def weighted(tree: Long) = {
    import graft.operators.TextOps.hash32
    val h = hash32(concat(lit(s"rf:w:$tree:"),
      col("event_id").cast("string"))) % 1000
    Tables.events(spark, dir).select(col("event_type"),
        hour(col("ts")).cast("long").as("x1"),
        dayofweek(col("ts")).cast("long").as("x2"),
        when(col("value") >= 100.0, 1L).otherwise(0L).as("y"),
        when(h < 368, 0L).when(h < 736, 1L).when(h < 920, 2L)
          .otherwise(3L).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
  }

  test("one tree's stump matches a brute-force weighted gini search") {
    import graft.operators.TextOps.hash32
    val tree = 0L
    val feat = spark.range(1).select(
      (hash32(lit(s"rf:f:$tree")) % 2 + 1)).collect().head.getLong(0)
    val rows = weighted(tree)
    for ((et, grp) <- out.filter(_._2 == tree).groupBy(_._1)) {
      val row = grp.head
      assert(row._3 == feat, s"$et tree $tree: feature restriction broken")
      val cells = rows.filter(_._1 == et)
        .groupBy(c => if (feat == 1L) c._2 else c._3)
        .map { case (v, cs) =>
          (v, cs.map(_._5).sum, cs.map(c => c._5 * c._4).sum) }
        .toSeq.sortBy(_._1)
      def gini(n: Long, p: Long): Double =
        n.toDouble - ((p * p).toDouble + ((n - p) * (n - p)).toDouble) /
          n.toDouble
      val best = cells.map(_._1).dropRight(1).flatMap { t =>
        val (l, r) = cells.partition(_._1 <= t)
        val (nl, pl) = (l.map(_._2).sum, l.map(_._3).sum)
        val (nr, pr) = (r.map(_._2).sum, r.map(_._3).sum)
        if (nl > 0 && nr > 0) Some((gini(nl, pl) + gini(nr, pr), t)) else None
      }.minBy(x => (x._1, x._2))
      assert(row._4 == best._2,
        s"$et tree $tree: query thr ${row._4}, brute ${best._2}")
    }
  }

  test("bootstrap is Poisson(1)-shaped and ensemble columns are coherent") {
    val rows = weighted(0L)
    val n = rows.length.toDouble
    val freq = rows.groupBy(_._5).map { case (w, g) => w -> g.length / n }
    // generous bounds for a 1k-row fixture; the thresholds are exact per
    // mille so expected mass is .368/.368/.184/.080
    assert(math.abs(freq.getOrElse(0L, 0.0) - 0.368) < 0.06)
    assert(math.abs(freq.getOrElse(1L, 0.0) - 0.368) < 0.06)
    assert(math.abs(freq.getOrElse(2L, 0.0) - 0.184) < 0.05)
    for ((et, grp) <- out.groupBy(_._1)) {
      assert(grp.map(_._2).distinct.length == grp.length,
        s"$et: duplicate tree rows")
      assert(grp.map(_._10).distinct.length == 1,
        s"$et: ensemble AUC must be one value per group")
      for (r <- grp) {
        assert(r._7 >= 0L && r._7 <= 1000000000L)
        assert(r._8 >= 0L && r._8 <= 1000000000L)
        assert(r._9 > 0.0 && r._9 < 1.0, s"$et tree ${r._2}: oob auc ${r._9}")
      }
      // bagging must actually vary something across trees: thresholds,
      // features, or predictions
      assert(grp.map(r => (r._3, r._4, r._7, r._8)).distinct.length > 1,
        s"$et: all trees identical — bootstrap had no effect")
    }
  }
}
