package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance of the Gold feature table — the lakehouse
  * pattern that makes a 100 TB daily pipeline affordable: when a batch of
  * new bars lands, do NOT recompute history; recompute ONLY the new
  * (user, day) rows, from a BOUNDED per-user lookback slice, and merge.
  *
  * Why this is sound (and spec-proven, `IncrementalGoldSpec`):
  * every window in the Gold battery ([[GoldFeatures]]) is backward-looking
  * with a trailing frame of at most 21 day-rows (`rowsBetween(-20, -1)`
  * stacked on a `lag(1)`) — so
  *  1. existing gold rows are INVARIANT under appended data (no
  *     forward-looking frame can see the new days), and
  *  2. a new day's row depends on at most the [[LookbackRows]] most
  *     recent prior day-rows of that user — the recompute slice is
  *     O(affected users × lookback), independent of history depth.
  *
  * Reference semantics anchor: the daily Gold refresh of
  * Procesamiento_fase_2.ipynb, which recomputes the full frame per run —
  * correct single-node, ruinous at cluster scale.
  */
object IncrementalGold {

  /** Trailing day-rows any Gold feature can reference: the deepest frame
    * is rowsBetween(-20, -1) evaluated at a lag(1) offset → 21 prior
    * rows; +1 for the row itself. */
  val LookbackRows = 22

  /** Recompute gold rows for exactly the (user, day) pairs at or after
    * each user's first NEW day in `batch`, reading only affected users'
    * bounded history from `bronze` (which must already include the batch
    * rows).
    *
    * Scale shape: the affected-user and kept-day dims are batch-sized
    * (broadcast; the day ranking runs over the distinct-DAY dim, never
    * event rows); the history scan is partition-prunable on user/day; the
    * Gold battery then runs on O(users × lookback) day-rows.
    */
  def refresh(spark: SparkSession, bronze: DataFrame,
              batch: DataFrame,
              goldKeys: Option[DataFrame] = None): DataFrame = {
    val firstNew = batch
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("first_new_day"))
    // If bronze carries a `day` column, USE it instead of deriving one
    // from ts: on a day-partitioned bronze table the derived expression
    // severs the link to the partition column and no scan below can ever
    // prune — the round-11 probe measured refresh ≈ full-recompute cost
    // (0.7–0.95×) on exactly that shape, because the slice bound then
    // only shrinks the (cheap) window battery, never the (dominant)
    // history scan. With the partition column intact, the day-range
    // filter below reaches the file listing.
    val withDay =
      if (bronze.columns.contains("day")) bronze
      else bronze.withColumn("day", to_date(col("ts")))
    val hist = withDay.join(broadcast(firstNew), "user_id")
    // The (user, day) universe the lookback ranks over. With `goldKeys`
    // (the EXISTING gold table's key columns — incremental-MV
    // maintenance: gold is the battery over all bronze, so its key set
    // IS bronze's distinct (user, day); the caller owns that invariant),
    // the pass costs O(gold keys ∪ batch) — day-row-sized, ~1/events-
    // per-day of bronze — and bronze is never scanned for it. Without
    // it, fall back to the bronze distinct (first batch, or a caller
    // with no materialized gold): correct on any input, O(history).
    // This was the round-11 probe's last data-sized refresh term — with
    // the bronze-scan days dim, refresh measured ≈ full-build cost even
    // on a 480-day partitioned history, because the dim pass re-read
    // what the slice bound was built to skip.
    val days = goldKeys match {
      case Some(gk) =>
        // affected-user join BEFORE the distinct: the broadcast join cuts
        // the key set to the batch's users (measured 4M → 460k on the
        // 40×-replica probe), so the distinct shuffles the affected
        // slice, never the whole key universe
        gk.select("user_id", "day")
          .join(broadcast(firstNew), "user_id")
          .unionByName(batch.select(col("user_id"),
              to_date(col("ts")).as("day")).distinct()
            .join(broadcast(firstNew), "user_id"))
          .select("user_id", "day", "first_new_day")
          .distinct()
      case None =>
        hist.select("user_id", "day", "first_new_day").distinct()
    }
    // bounded lookback: of each user's days BEFORE the first new day,
    // keep the most recent LookbackRows-1; every day >= it stays
    val wDays = Window.partitionBy("user_id").orderBy(col("day").desc)
    val keptDays = days.filter(col("day") < col("first_new_day"))
      .withColumn("rk", row_number().over(wDays))
      .filter(col("rk") < LookbackRows)
      .select("user_id", "day")
      .unionByName(days.filter(col("day") >= col("first_new_day"))
        .select("user_id", "day"))
    // Partition-pruning floor: every kept (user, day) is at or after the
    // GLOBAL earliest kept day, so the slice scan may skip everything
    // older via a plain predicate on the (partition) day column — the
    // scan bound that makes the refresh O(lookback window), not
    // O(history). The one-row collect is control-plane (a scalar date,
    // like the batched-ingest key universe); the per-user semi join
    // below refines the superset exactly as before, so results are
    // unchanged on any bronze shape. The days-DIM pass above still scans
    // all partitions, but column-pruned to (user_id, day) — on parquet a
    // thin-column listing, not a data read.
    val minKept = keptDays.agg(min("day")).head()
    val bounded =
      if (minKept.isNullAt(0)) hist
      else hist.filter(col("day") >= lit(minKept.getDate(0)))
    val slice = bounded
      .join(broadcast(keptDays), Seq("user_id", "day"), "left_semi")
      .drop("day", "first_new_day")
    GoldFeatures.goldTableFused(slice)
      .join(broadcast(firstNew), "user_id")
      .filter(col("day") >= col("first_new_day"))
      .drop("first_new_day")
  }
}
