package graft

import org.apache.spark.sql.functions._

/** The HLL merge law behind a33b: because every register is a max and max
  * is associative/commutative, merging per-day sketches register-wise
  * must reproduce the direct global sketch EXACTLY — not approximately.
  * a33b's merged_estimate therefore has to equal a33's hll_estimate
  * bit-for-bit on the same corpus; if partitioning the stream by day (or
  * by anything) could shift the estimate, the persisted-sketch-table
  * architecture would be unsound. The oracle can't check this law (each
  * query is compared only against its own replay), so it's pinned here.
  */
class HllMergeSpec extends SparkSpec {

  test("day-partitioned sketch merge equals the direct global sketch") {
    val d = "/root/testdata/sf0.001"
    val direct = SparkEntry.queries("a33_hll_distinct")(spark, d)
      .select(col("event_type"), col("hll_estimate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val merged = SparkEntry.queries("a33b_hll_merge")(spark, d)
      .select(col("event_type"), col("merged_estimate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(direct.keySet == merged.keySet)
    direct.foreach { case (et, est) =>
      assert(merged(et) == est, // bit-exact, not a tolerance compare
        s"merge law violated for $et: merged=${merged(et)} direct=$est")
    }
    // the repeat ratio is a positive finite price of cross-day
    // repetition (NOT asserted ≥ 1: each daily estimate carries its own
    // ±6.5% sketch error, so the daily sum can undershoot the merged
    // estimate on nearly-disjoint days)
    val ratios = SparkEntry.queries("a33b_hll_merge")(spark, d)
      .select("repeat_ratio").collect().map(_.getDouble(0))
    assert(ratios.forall(r => r > 0.0 && !r.isInfinite && !r.isNaN),
      s"repeat_ratio must be positive finite: " + ratios.mkString(","))
  }
}
