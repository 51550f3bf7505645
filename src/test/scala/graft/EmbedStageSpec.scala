package graft

import graft.operators.{EmbedStage, IvfIndex, PqIndex, SignLsh, VectorOps}
import org.apache.spark.sql.functions._

/** The materialized vector-index stage must equal the inline derivation
  * bit-for-bit — the contract that keeps the DuckDB oracles (which replay
  * everything from raw embeddings) valid for the stage-reading sim
  * queries. Runs against the sf0.001 fixture corpus.
  */
class EmbedStageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val stage = EmbedStage(spark, dir)

  private lazy val inline = {
    import VectorOps._
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), quant(col("embedding")).as("qv"))
      .select(col("vec_id"), col("qv"), normSq(col("qv")).as("nsq"),
        IvfIndex.dots(col("qv"), Dim).as("dl"),
        PqIndex.encode(PqIndex.dls(col("qv"), Dim)).as("codes"))
      .select(col("vec_id"), col("qv"), col("nsq"), col("dl"),
        IvfIndex.assign(col("dl")).as("cid"), col("codes"))
  }

  test("every oracle fixture corpus sits on the C-floor quantizer") {
    // the inline derivation above uses the default (floor) cell count;
    // it only equals the stage if the stage built with the same one
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1"))
      assert(EmbedStage.cells(spark, s"/root/testdata/$d") == IvfIndex.C, d)
  }

  test("vectors table equals the inline index derivation") {
    val cols = Seq("vec_id", "qv", "nsq", "dl", "cid", "codes").map(col)
    val a = stage.vectors.select(cols: _*)
    val b = inline.select(cols: _*)
    assert(a.count() == b.count() && a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("buckets table equals inline SignLsh at both operating widths") {
    import VectorOps.Dim
    val qv = inline.select(col("vec_id"), col("qv"))
    def inlineBk(bits: Int, name: String) =
      SignLsh.bucketize(qv, "vec_id", "qv", EmbedStage.LshTables, bits, Dim,
          persist = false)
        .withColumnRenamed("bucket", name)
    val expected = inlineBk(EmbedStage.BitsPair, "bucket_pair")
      .join(inlineBk(EmbedStage.BitsQuery, "bucket_query"),
        Seq("vec_id", "table_id"))
    val got = stage.buckets
      .select("vec_id", "table_id", "bucket_pair", "bucket_query")
    assert(got.count() == expected.count() && got.count() > 0)
    assert(got.exceptAll(expected).isEmpty &&
      expected.exceptAll(got).isEmpty)
  }

  test("stage is served from cache on the second call (no rebuild)") {
    stage.vectors.count() // force first build
    val before = EmbedStage.buildSeconds
    EmbedStage(spark, dir).vectors.count()
    assert(EmbedStage.buildSeconds == before)
  }

  test("forced two-level stage: parent-dot dl, assignHier cids, its own " +
    "cache identity, and a working probed search") {
    stage.vectors.count() // flat stage built first
    IvfIndex.withForceHier() {
      val nc = EmbedStage.cells(spark, dir) // fixture floor (C)
      val (g, b) = IvfIndex.hierGeometry(nc)
      val hv = EmbedStage(spark, dir).vectors
      // dl stores the G parent dots, not the flat cell array
      assert(hv.select(size(col("dl"))).distinct().head().getInt(0) == g)
      // cid is the two-level assignment, in range, matching a recompute
      val expect = Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          IvfIndex.assignHier(VectorOps.quant(col("embedding")), VectorOps.Dim, nc)
            .as("ecid"))
      val joined = hv.select(col("vec_id"), col("cid")).join(expect, "vec_id")
      assert(joined.filter(col("cid") =!= col("ecid")).isEmpty)
      assert(hv.filter(col("cid") < 0 || col("cid") >= nc).isEmpty)
      // the probed search end-to-end: every query gets candidates from
      // its expanded child cells (regime-aware probeCells)
      val probes = EmbedStage.probeCells(spark, dir,
        hv.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("qv"), col("dl")),
        "query_id")
      // budgeted expansion: bP blocks × keepC cells per block (the floor
      // geometry has no truncated block, so the count is exact)
      val (bP, keepC) = IvfIndex.hierBudget(nc)
      assert(probes.groupBy("query_id").count()
        .filter(col("count") =!= bP * keepC).isEmpty)
      val cand = hv.select(col("vec_id").as("cand_id"), col("cid"))
        .join(probes.select("query_id", "cid"), "cid")
        .filter(col("cand_id") =!= col("query_id"))
      assert(cand.select("query_id").distinct().count() == 5)
    }
    // the flat stage was not poisoned: same call serves the flat layout
    assert(stage.vectors.select(size(col("dl"))).distinct()
      .head().getInt(0) == IvfIndex.C)
  }
}
