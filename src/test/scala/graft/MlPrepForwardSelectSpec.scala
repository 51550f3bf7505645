package graft

import org.apache.spark.sql.functions._

/** One-scan forward feature selection (mlprep_forward_select): the greedy
  * path and every step's SSE must match a driver-side brute force that
  * refits each candidate subset from raw rows, and train SSE must be
  * non-increasing along the path (adding a regressor cannot hurt an
  * exact least-squares fit).
  */
class MlPrepForwardSelectSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val fsel = graft.queries.MlPrepQueries.all
    .find(_.name == "mlprep_forward_select").get.fn

  private lazy val out = fsel(spark, dir).collect().map(r => (
    r.getString(0), r.getLong(1),
    if (r.isNullAt(2)) None else Some(r.getLong(2)),
    r.getLong(3), r.getLong(4)))

  /** Least-squares SSE for the given feature subset, from raw rows. */
  private def bruteSse(rows: Array[(Double, Double, Double, Double)],
                       feats: Seq[Int]): Double = {
    val dim = feats.length + 1
    val a = Array.ofDim[Double](dim, dim + 1)
    for ((x1, x2, x3, y) <- rows) {
      val xs = 1.0 +: feats.map {
        case 1 => x1; case 2 => x2; case 3 => x3
      }.toArray
      for (i <- 0 until dim; j <- 0 until dim) a(i)(j) += xs(i) * xs(j)
      for (i <- 0 until dim) a(i)(dim) += xs(i) * y
    }
    for (p <- 0 until dim) {
      val piv = (p until dim).maxBy(r => math.abs(a(r)(p)))
      val t = a(p); a(p) = a(piv); a(piv) = t
      for (r <- 0 until dim if r != p) {
        val fc = a(r)(p) / a(p)(p)
        for (c <- p to dim) a(r)(c) -= fc * a(p)(c)
      }
    }
    val beta = (0 until dim).map(i => a(i)(dim) / a(i)(i))
    rows.map { case (x1, x2, x3, y) =>
      val xs = 1.0 +: feats.map {
        case 1 => x1; case 2 => x2; case 3 => x3
      }.toArray
      val e = y - xs.zip(beta).map { case (x, b) => x * b }.sum
      e * e
    }.sum
  }

  test("greedy path and SSEs match brute-force subset refits") {
    val data = Tables.events(spark, dir).select(col("event_type"),
        hour(col("ts")).cast("double"), dayofweek(col("ts")).cast("double"),
        dayofmonth(col("ts")).cast("double"),
        graft.Parity.lq(col("value")).cast("double"))
      .collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))))
    for ((et, grp) <- out.groupBy(_._1)) {
      val rows = data.filter(_._1 == et).map(_._2)
      val rel = 1e-6 * rows.length * 1e8 // quantization + float headroom
      val s0 = grp.find(_._2 == 0L).get
      assert(math.abs(s0._4 - bruteSse(rows, Seq.empty)) <= rel)
      val j1 = (1 to 3).minBy(j => (bruteSse(rows, Seq(j)), j))
      val s1 = grp.find(_._2 == 1L).get
      assert(s1._3.contains(j1.toLong), s"$et step1: ${s1._3} vs $j1")
      assert(math.abs(s1._4 - bruteSse(rows, Seq(j1))) <= rel)
      val j2 = (1 to 3).filter(_ != j1)
        .minBy(j => (bruteSse(rows, Seq(j1, j).sorted), j))
      val s2 = grp.find(_._2 == 2L).get
      assert(s2._3.contains(j2.toLong), s"$et step2: ${s2._3} vs $j2")
      assert(math.abs(s2._4 - bruteSse(rows, Seq(j1, j2).sorted)) <= rel)
    }
  }

  test("SSE is non-increasing along the greedy path") {
    for ((et, grp) <- out.groupBy(_._1)) {
      val byStep = grp.sortBy(_._2).map(_._4)
      for (i <- 1 until byStep.length)
        assert(byStep(i) <= byStep(i - 1) + 1,
          s"$et: SSE grew at step $i")
      assert(grp.filter(_._2 > 0L).forall(_._5 >= -1),
        s"$et: negative selection gain")
    }
  }
}
