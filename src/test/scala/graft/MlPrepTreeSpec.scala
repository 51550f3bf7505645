package graft

import org.apache.spark.sql.functions._

/** Histogram-split decision tree (mlprep_tree): the root split must equal
  * an independent driver-side brute force over every (feature, threshold)
  * candidate, and the emitted structure must satisfy the conservation
  * invariants (children partition the parent; leaves partition the data).
  */
class MlPrepTreeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val tree =
    graft.queries.MlPrepQueries.all.find(_.name == "mlprep_tree").get.fn

  private def cells(): Array[(String, Long, Long, Long, Long)] =
    Tables.events(spark, dir).select(col("event_type"),
        hour(col("ts")).cast("long").as("x1"),
        dayofweek(col("ts")).cast("long").as("x2"),
        when(col("value") >= 100.0, 1L).otherwise(0L).as("y"))
      .groupBy("event_type", "x1", "x2")
      .agg(count(lit(1)).as("n"), sum("y").as("yc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("root split matches a brute-force gini search") {
    val out = tree(spark, dir).collect()
    val roots = out.filter(r => r.getLong(1) == 0L)
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    val grid = cells()
    def weighted(n: Long, p: Long): Double =
      n.toDouble - ((p * p).toDouble + ((n - p) * (n - p)).toDouble) /
        n.toDouble
    for ((et, (feat, thr)) <- roots) {
      val cs = grid.filter(_._1 == et)
      // every candidate: (feature f, threshold t) with nonempty sides
      val best = (for {
        f <- Seq(1L, 2L)
        t <- cs.map(c => if (f == 1L) c._2 else c._3).distinct.sorted.dropRight(1)
      } yield {
        val (l, r) = cs.partition(c => (if (f == 1L) c._2 else c._3) <= t)
        val score = weighted(l.map(_._4).sum, l.map(_._5).sum) +
          weighted(r.map(_._4).sum, r.map(_._5).sum)
        (score, f, t)
      }).minBy(x => (x._1, x._2, x._3))
      assert((feat, thr) == (best._2, best._3),
        s"$et: query chose ($feat, $thr), brute force (${best._2}, ${best._3})")
    }
  }

  test("structure invariants: conservation and id consistency") {
    val out = tree(spark, dir).collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(5),
      r.getLong(6), r.getDouble(7)))
    val total = Tables.events(spark, dir).count()
    // leaves partition the data exactly
    assert(out.filter(x => x._2 == 3L).map(_._5).sum == total)
    // every split node's LEAF DESCENDANTS conserve its counts (robust to
    // nodes that stop splitting early — those surface only at leaf level
    // with doubled ids, never as intermediate split rows)
    for (lvl <- 0L to 2L; (et, _, node, feat, n, pos, _) <-
           out.filter(x => x._2 == lvl)) {
      assert(feat.isDefined, s"level-$lvl row missing split feature")
      val span = 1L << (3 - lvl).toInt
      val leaves = out.filter(x => x._1 == et && x._2 == 3L &&
        x._3 >= node * span && x._3 < (node + 1) * span)
      assert(leaves.map(_._5).sum == n && leaves.map(_._6).sum == pos,
        s"$et node $node at level $lvl: leaf descendants don't conserve")
      assert(leaves.size >= 2,
        s"$et node $node at level $lvl: a split must separate rows")
    }
    assert(out.forall(x => x._7 >= 0.0 && x._7 <= 1.0))
  }
}
