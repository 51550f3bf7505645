package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps.hash32

/** The native register aggregate ([[graft.functions.HllSketchAgg]],
  * TypedImperativeAggregate) against the declarative register pipeline
  * it replaces (a33's bucket/rho/max-rho build): bit-identical registers
  * per group, partitioning-invariant (the serialize/merge partial path),
  * null inputs skipped, empty-bucket registers zero.
  */
class HllAggSpec extends SparkSpec {
  import spark.implicits._

  private def hllRho(v: org.apache.spark.sql.Column) =
    lit(25) - (0 until 24)
      .map(k => when(v >= (1L << k), 1).otherwise(0)).reduce(_ + _)

  /** Declarative registers for one group: full 256-bucket grid. */
  private def declarativeRegs(ids: Seq[String]): Seq[Long] = {
    val h = ids.toDF("id").select(hash32(col("id")).as("h"))
      .select((col("h") % 256).cast("int").as("bucket"),
        hllRho(shiftright(col("h"), 8)).cast("long").as("rho"))
      .groupBy("bucket").agg(max("rho").as("mj"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 256).map(b => h.getOrElse(b, 0L))
  }

  private def nativeRegs(ids: Seq[String], parts: Int): Seq[Long] =
    ids.toDF("id").repartition(parts)
      .select(hash32(col("id")).as("h"))
      .agg(expr("hll_sketch_agg(h)").as("regs"))
      .head().getSeq[Long](0)

  test("registers are bit-identical to the declarative pipeline") {
    val ids = (1 to 5000).map(i => s"user_$i")
    assert(nativeRegs(ids, 4) == declarativeRegs(ids))
  }

  test("partitioning-invariant (serialize/merge partial path)") {
    val ids = (1 to 2000).map(i => s"k$i")
    val expected = nativeRegs(ids, 1)
    for (p <- Seq(3, 16, 32))
      assert(nativeRegs(ids, p) == expected, s"diverged at $p partitions")
  }

  test("null inputs are skipped, empty input is all-zero registers") {
    val withNulls = Seq(Some(7L), None, Some(13L), None).toDF("h")
      .agg(expr("hll_sketch_agg(h)")).head().getSeq[Long](0)
    val noNulls = Seq(7L, 13L).toDF("h")
      .agg(expr("hll_sketch_agg(h)")).head().getSeq[Long](0)
    assert(withNulls == noNulls)
    val empty = Seq.empty[Long].toDF("h")
      .agg(expr("hll_sketch_agg(h)")).head().getSeq[Long](0)
    assert(empty == Seq.fill(256)(0L))
  }

  test("grouped aggregation matches per-group declarative registers") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", s"id_$i"))
    val native = rows.toDF("g", "id").repartition(8)
      .select(col("g"), hash32(col("id")).as("h"))
      .groupBy("g").agg(expr("hll_sketch_agg(h)").as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val ids = rows.filter(_._1 == g).map(_._2)
      assert(native(g) == declarativeRegs(ids), s"group $g diverged")
    }
  }
}
