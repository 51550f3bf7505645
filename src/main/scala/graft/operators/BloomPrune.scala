package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the standard 100 TB shuffle reducer: before
  * a fact⋈dim join whose dim side is selective, build an m-bit Bloom
  * filter over the dim's join keys and drop fact rows whose key cannot be
  * in the dim BEFORE the join's exchange. Blooms have no false negatives,
  * so the join result is IDENTICAL to the un-pruned join (that identity is
  * the j11 oracle and the `BloomPruneSpec` property); false positives only
  * cost a little wasted shuffle.
  *
  * Why this beats the plain semi-join when the dim is large: a broadcast
  * semi-join ships every distinct key; the Bloom ships a FIXED m/8 bytes
  * no matter how many keys the dim has (here m=4096 bits = 512 B — a
  * billion-key dim still ships 512 MB at m=2^32, tunable by target fpp).
  * Spark's own runtime row-level filtering (InjectRuntimeFilter) is this
  * same move done by the optimizer; the explicit operator makes the
  * mechanics testable and works where the optimizer's thresholds or
  * join shapes don't trigger.
  *
  * Hash choice: the j11 oracle replays the PLAIN join — the
  * no-false-negative contract makes the Bloom's internals invisible to
  * the result — so the bit positions are free to use the native codegen'd
  * `xxhash64` (seeded per probe) instead of a cross-engine-portable md5
  * construction. That matters: the probe runs K times per FACT row, and
  * an interpreted md5-of-string there measured ~6× slower end-to-end.
  *
  * The filter is built as a (word → 64-bit mask) map in ONE aggregation
  * pass over the dim keys (explode k bits per key → bit_or per word →
  * map), then rides a 1-row broadcast onto the fact scan where the k
  * probes are pure codegen-able projections.
  */
object BloomPrune {

  /** Filter bits (power of two so `hash % M` is uniform-ish) and probes
    * per key. fpp ≈ (1 - e^(-K·n/M))^K — at n=1000 keys, ≈0.6%. */
  val M = 4096
  val K = 3

  private def bitOf(key: Column, i: Int): Column =
    pmod(xxhash64(lit(i), key), lit(M.toLong))

  /** One-row frame `bloom: map<int, bigint>` over the dim's keys. */
  def build(dimKeys: DataFrame, keyCol: String): DataFrame = {
    val bits = dimKeys.select(explode(array(
      (0 until K).map(i => bitOf(col(keyCol), i)): _*)).as("bit"))
    bits
      .select((col("bit") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          (col("bit") % 64).cast("int")).as("mask"))
      .groupBy("w").agg(expr("bit_or(mask)").as("bits"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("__bloom"))
  }

  /** All K probe bits set in the (map-typed) filter column. A word absent
    * from the map is all-zeros. */
  def mightContain(key: Column, bloom: Column): Column =
    (0 until K).map { i =>
      val bit = bitOf(key, i)
      val mask = call_function("shiftleft", lit(1L),
        (bit % 64).cast("int"))
      coalesce(element_at(bloom, (bit / 64).cast("int")), lit(0L))
        .bitwiseAND(mask) === mask
    }.reduce(_ && _)

  /** The fact side filtered by the dim's Bloom filter: every true match
    * survives; most non-matching rows never reach the join exchange. */
  def prune(fact: DataFrame, factKey: String,
            dimKeys: DataFrame, dimKey: String): DataFrame =
    fact.crossJoin(broadcast(build(dimKeys, dimKey)))
      .filter(mightContain(col(factKey), col("__bloom")))
      .drop("__bloom")
}
