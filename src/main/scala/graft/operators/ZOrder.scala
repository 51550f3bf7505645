package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering — the data-layout
  * optimization for tables queried by MORE THAN ONE column (Delta's
  * OPTIMIZE ZORDER BY; Iceberg's sort-order z-curve). A linear sort on x
  * gives perfect x-locality and ZERO y-locality: every file spans the full
  * y domain, so parquet min/max skipping only prunes on x. Interleaving
  * the bits of (scaled) x and y orders the rows along a space-filling
  * curve whose file-sized segments are (approximate) SQUARES in (x, y) —
  * both columns get bounded per-file ranges, and a two-predicate query
  * prunes on both (`ZOrderSpec` measures exactly this on the written
  * layout).
  *
  * Mechanics: each clustering column is affinely scaled to [0, 2^bits)
  * from its (broadcast 1-row) min/max bounds — a production system uses
  * sketch quantiles for rank scaling under skew; the affine form keeps the
  * operator deterministic — then the bit-interleave is a pure integer
  * expression (codegen'd, no UDF), and the write is
  * `repartitionByRange(zvalue)` + an in-partition sort: one range
  * exchange, same cost shape as a global sort.
  */
object ZOrder {

  /** Bits per dimension (2 dims × 21 bits = 42-bit z-values, long-safe). */
  val Bits = 21

  /** Morton interleave of two pre-scaled non-negative ints in
    * [0, 2^Bits): bit i of `a` lands at 2i, of `b` at 2i+1. Pure integer
    * arithmetic (divide/mod/multiply by constants — no column shifts
    * needed). */
  def interleave(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      val pa = lit(1L << i)
      ((a / pa).cast("long") % 2) * lit(1L << (2 * i)) +
        ((b / pa).cast("long") % 2) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  private def scaled(c: Column, lo: Column, hi: Column): Column = {
    val span = hi - lo
    val unit = when(span > 0, (c - lo).cast("double") / span.cast("double"))
      .otherwise(lit(0.0))
    // clamp the top edge: unit == 1.0 must land in the last cell
    least(floor(unit * (1L << Bits)).cast("long"), lit((1L << Bits) - 1))
  }

  /** `df` ordered along the z-curve of two numeric columns, distributed
    * into `nFiles` range partitions (→ files on write), each internally
    * sorted. */
  def cluster(df: DataFrame, colA: String, colB: String,
              nFiles: Int): DataFrame = {
    val bounds = df.agg(
      min(colA).as("lo_a"), max(colA).as("hi_a"),
      min(colB).as("lo_b"), max(colB).as("hi_b"))
    val z = interleave(
      scaled(col(colA), col("lo_a"), col("hi_a")),
      scaled(col(colB), col("lo_b"), col("hi_b"))).as("__z")
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "lo_a", "hi_a", "lo_b", "hi_b")
  }
}
