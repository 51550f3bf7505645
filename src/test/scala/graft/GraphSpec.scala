package graft

import graft.operators.PassageGraph
import org.apache.spark.sql.DataFrame

/** Closed-form checks for [[PassageGraph]] — the semantics the parity
  * oracle can't pin (it replays the same algorithm): edge generation rules
  * on hand corpora, PageRank invariants on graphs with known answers, and
  * triangle counts on cliques/paths.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgeSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val p8 = (1 to PassageGraph.P).map(i => s"tok$i").mkString(" ")

  test("edgesOf: a shared 8-token passage forms one symmetric edge") {
    val docs = Seq(
      (1L, s"$p8 alpha beta"),
      (2L, s"$p8 gamma delta"),
      (3L, "unrelated words only here nothing shared at all")
    ).toDF("doc_id", "text")
    assert(edgeSet(PassageGraph.edgesOf(docs)) === Set((1L, 2L), (2L, 1L)))
  }

  test("edgesOf: df-capped passages and df=1 passages form no edges") {
    // MaxDf+1 docs all sharing one passage: boilerplate, dropped entirely
    val boiler = (1L to (PassageGraph.MaxDf + 1L)).map(i => (i, p8))
    val docs = boiler.toDF("doc_id", "text")
    assert(PassageGraph.edgesOf(docs).count() === 0)
    // exactly MaxDf docs: kept (BETWEEN 2 AND MaxDf is inclusive)
    val atCap = (1L to PassageGraph.MaxDf.toLong).map(i => (i, p8))
      .toDF("doc_id", "text")
    assert(PassageGraph.edgesOf(atCap).count() ===
      PassageGraph.MaxDf.toLong * (PassageGraph.MaxDf - 1))
  }

  test("pagerank: symmetric complete graph K3 keeps all ranks equal") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (3L, 2L)).toDF("src", "dst")
    val deg = PassageGraph.degrees(edges)
    val out = PassageGraph.pagerank(edges, deg, 8, 85).collect()
    assert(out.length === 3)
    val ranks = out.map(_.getAs[Long]("r")).toSet
    assert(ranks.size === 1, s"K3 ranks diverged: $ranks")
    // mass conservation on the 1e-12 grid, modulo truncation dust: each
    // round loses < 3 units per node to the three integer divisions
    val mass = out.map(_.getAs[Long]("r")).sum
    assert(math.abs(mass - PassageGraph.Scale) < 1000L,
      s"mass drifted: $mass")
  }

  test("pagerank: path a-b-c ranks the middle node highest, ends equal") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val deg = PassageGraph.degrees(edges)
    val m = PassageGraph.pagerank(edges, deg, 8, 85).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("r")).toMap
    assert(m(1L) === m(3L), "symmetric ends must tie bit-for-bit")
    assert(m(2L) > m(1L), "the middle node dominates a path")
  }

  test("triangleCounts: K4 is all-clustering-1, a path has none") {
    val k4 = (for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)).toDF("src", "dst")
    val out = PassageGraph.triangleCounts(k4, PassageGraph.degrees(k4))
      .collect()
    assert(out.length === 4)
    // each node of K4 sits on C(3,2)=3 triangles at deg 3 → clustering 1
    out.foreach { r =>
      assert(r.getAs[Long]("triangles") === 3L)
      assert(r.getAs[Double]("clustering") === 1.0)
    }
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val pout = PassageGraph
      .triangleCounts(path, PassageGraph.degrees(path)).collect()
    pout.foreach { r =>
      assert(r.getAs[Long]("triangles") === 0L)
      assert(r.getAs[Double]("clustering") === 0.0)
    }
  }

  test("bfs: hop distances on a path graph, min over multiple seeds") {
    // symmetric path 1-2-3-4-5
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    def dists(seeds: Seq[Long], iters: Int): Map[Long, Long] =
      PassageGraph.bfs(path, seeds.toDF("doc_id"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // single seed at one end: exact hop counts
    assert(dists(Seq(1L), 4) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // iteration cap bounds the reach: 2 rounds from node 1 stop at 3
    assert(dists(Seq(1L), 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // two seeds: every node takes the nearer one
    assert(dists(Seq(1L, 5L), 4) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }
}
