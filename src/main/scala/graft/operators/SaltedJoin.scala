package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-robust equi-join: salt the (possibly skewed) left side, replicate
  * the right side across the salt domain, join on (keys ++ salt).
  *
  * Semantics are EXACTLY those of `left.join(right, keys, joinType)` for
  * the accepted join types (inner and left-flavored — see [[join]]); the
  * salt is an internal partitioning device and never escapes the operator.
  * What changes is the physical layout: a hot key that would land its
  * entire row set on one shuffle partition is spread across `saltBuckets`
  * partitions, at the cost of writing the (small) right side `saltBuckets`
  * times. This is the manual analog of AQE's skew-join split — but it also
  * covers the case AQE cannot: skew INTO an aggregation or a shuffled hash
  * join whose hot key exceeds a single task's memory in the first place.
  *
  * Usage rules at 100 TB:
  *  - right side must be the smaller side (it is replicated ×saltBuckets);
  *  - the left salt is derived from a per-row column (uniform spread needs
  *    a distinct-ish column — a row id, event id, or the values themselves);
  *  - pick saltBuckets ≈ (hot-key rows / target rows-per-task), not huge:
  *    replication cost is linear in it.
  *
  * Reference semantics anchor: the groupby/merge joins of
  * Procesamiento_fase_1.ipynb (single-node pandas has no skew problem; a
  * 1000-executor shuffle does — this operator is the scale adaptation).
  */
object SaltedJoin {

  /** `left ⋈ right` on `keys`, left salted by `hash(spreadCol) mod n`.
    *
    * Join-type restriction: the right side is replicated ×saltBuckets, so
    * any join type that EMITS unmatched right rows (right/full outer)
    * would emit each such row once per replica — the identity with the
    * plain join only holds for inner and left-flavored joins, and the
    * require enforces that. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           spreadCol: Column, joinType: String = "inner",
           saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val jt = joinType.toLowerCase.replace("_", "").replace("outer", "")
    require(Set("inner", "left", "leftsemi", "semi", "leftanti", "anti")
      .contains(jt),
      s"SaltedJoin: joinType '$joinType' would emit unmatched right rows " +
      "once per salt replica; only inner/left/left_semi/left_anti " +
      "preserve plain-join semantics")
    val salted = left.withColumn("__salt",
      pmod(hash(spreadCol), lit(saltBuckets)))
    // replicate right across the salt domain (distributed explode of a
    // literal range — never a driver loop)
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
