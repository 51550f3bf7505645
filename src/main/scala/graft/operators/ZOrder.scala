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

  /** Exact partition-by-bucket: every row lands in partition `pid`
    * (must be in [0, n)), with NO sampling. `repartitionByRange` would
    * be the idiomatic call, but Spark's RangePartitioner draws its
    * reservoir sample with an RDD-id-derived seed, so the resulting
    * file BOUNDARIES depend on how many RDDs the session created
    * before — poison for a layout operator whose whole product is the
    * boundaries (the same table written twice in different sessions
    * gets different files, and layout comparisons go flaky). A
    * deterministic layout must be a pure function of the data, so the
    * partition id is computed as a column and honored exactly by an
    * explicit partitioner. Balance under skew is the bucket
    * expression's responsibility (production: rank-scale via sketch
    * quantiles; here: affine — same doctrine as [[interleave]]
    * scaling).
    *
    * COST, measured not assumed: the RDD round-trip deserializes every
    * row out of Tungsten for the exchange (the write-side encoder then
    * re-encodes), so this path is slower than `repartitionByRange` on
    * wide tables — the price of exact boundaries, paid once per layout
    * write (a maintenance operation, not a query). The columnar
    * alternative — a Catalyst `Partitioning` that hashes a precomputed
    * pid column with an identity hash so `RepartitionByExpression`
    * lands rows exactly — needs a custom physical rule for a
    * maintenance-only win, so the simple exact path stays until a
    * profile shows the layout write on the critical path. */
  def byBucket(df: DataFrame, pid: Column, n: Int): DataFrame = {
    val spark = df.sparkSession
    val withPid = df.withColumn("__pid",
      greatest(least(pid.cast("int"), lit(n - 1)), lit(0)))
    val shuffled = withPid.rdd
      .map(r => (r.getAs[Int]("__pid"), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    spark.createDataFrame(shuffled, withPid.schema).drop("__pid")
  }

  /** `df` ordered along the z-curve of two numeric columns, distributed
    * into `nFiles` deterministic z-range partitions (→ files on write),
    * each internally sorted. */
  def cluster(df: DataFrame, colA: String, colB: String,
              nFiles: Int): DataFrame = {
    val bounds = df.agg(
      min(colA).as("lo_a"), max(colA).as("hi_a"),
      min(colB).as("lo_b"), max(colB).as("hi_b"))
    val z = interleave(
      scaled(col(colA), col("lo_a"), col("hi_a")),
      scaled(col(colB), col("lo_b"), col("hi_b"))).as("__z")
    val zed = df.crossJoin(broadcast(bounds))
      .withColumn("__z", z)
      .drop("lo_a", "hi_a", "lo_b", "hi_b")
    // affine z bucket (z domain is [0, 2^(2·Bits))) — exact, no sampling
    val width = (1L << (2 * Bits)) / nFiles
    byBucket(zed, (col("__z") / lit(width)).cast("int"), nFiles)
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
