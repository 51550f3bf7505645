package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer mechanics: partition property + planted-near-dup
  * recall through the probed candidate join (the sim4 shape). */
class IvfSpec extends SparkSpec {

  private val Dim = 64

  private def planted(n: Int, dups: Int, noise: Double) = {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(Dim)(rnd.nextGaussian())
    val base = (0 until n).map(i => (i.toLong, vec()))
    val nearDups = (0 until dups).map { i =>
      val (_, v) = base(i)
      ((n + i).toLong, v.map(x => x + noise * rnd.nextGaussian()))
    }
    import spark.implicits._
    ((base ++ nearDups).map { case (id, v) =>
      (id, v.toSeq.map(x => math.floor(x * 1e6 + 0.5).toLong))
    }.toDF("vec_id", "qv"),
     (0 until dups).map(i => (i.toLong, (n + i).toLong)))
  }

  private def withDots(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), col("qv"),
      IvfIndex.dots(col("qv"), Dim).as("dl"))

  test("assignment partitions the corpus: exactly one list per vector") {
    val (df, _) = planted(100, 0, 0.0)
    val asg = withDots(df).select(col("vec_id"),
      IvfIndex.assign(col("dl")).as("cid"))
    assert(asg.count() == 100)
    assert(asg.select("vec_id").distinct().count() == 100)
    val cids = asg.select("cid").distinct()
      .collect().map(_.getInt(0))
    assert(cids.forall(c => c >= 0 && c < IvfIndex.C))
  }

  test("cellsFor pins list density: floor at the oracle SFs, ∝n above") {
    // every oracle fixture sits on the C floor — the bit-exact DuckDB
    // replay of assignment depends on this
    for (n <- Seq(0L, 500L, 2000L, 4095L))
      assert(IvfIndex.cellsFor(n) == IvfIndex.C, s"n=$n")
    // above the floor the cell count tracks n/target (linear pair space)
    assert(IvfIndex.cellsFor(20000L) == 78)  // 10× sf0.1 replica
    assert(IvfIndex.cellsFor(40000L) == 156) // 20× sf0.1 replica
    assert(IvfIndex.cellsFor(1000000L) == 1000000L / IvfIndex.TargetCellSize)
  }

  test("the centroid family is a prefix: growing cells keeps old rows") {
    val small = IvfIndex.matrix(Dim)
    val big = IvfIndex.matrix(Dim, 64)
    assert(big.take(IvfIndex.C) == small)
    assert(big.length == 64)
    // all axis values stay on the quantization grid's range
    assert(big.flatten.forall(v => v >= -1000000L && v <= 1000000L))
  }

  test("a grown quantizer still partitions, with cids beyond the floor") {
    val (df, _) = planted(600, 0, 0.0)
    val cells = 32
    val asg = df.select(col("vec_id"),
        IvfIndex.dots(col("qv"), Dim, cells).as("dl"))
      .select(col("vec_id"), IvfIndex.assign(col("dl")).as("cid"))
    assert(asg.count() == 600)
    val cids = asg.select("cid").distinct().collect().map(_.getInt(0))
    assert(cids.forall(c => c >= 0 && c < cells))
    // the extra centroids genuinely attract mass (the LCG family isn't
    // degenerate beyond the fixture prefix)
    assert(cids.exists(_ >= IvfIndex.C),
      "no vector assigned beyond the C floor with a grown quantizer")
  }

  test("P-probe candidate join recovers planted near-duplicates") {
    val (df, pairs) = planted(n = 200, dups = 50, noise = 0.02)
    val dots = withDots(df)
    val corpus = dots.select(col("vec_id").as("cand_id"),
      IvfIndex.assign(col("dl")).as("cid"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("col").desc, col("pos").asc)
    val probes = dots.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), posexplode(col("dl")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= IvfIndex.P)
      .select(col("query_id"), col("pos").as("cid"))
    val cand = corpus.join(probes, "cid")
      .filter(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recovered = pairs.count(cand.contains)
    // a near-dup's argmax centroid is almost always the original's; when
    // noise flips a tight argmax race, the dup still lands in one of the
    // query's P=4 probed lists with high probability
    assert(recovered >= 45, s"IVF recovered only $recovered/50 planted pairs")
  }
}
