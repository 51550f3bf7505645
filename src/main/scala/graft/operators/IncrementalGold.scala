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
              batch: DataFrame): DataFrame = {
    val firstNew = batch
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("first_new_day"))
    val hist = bronze
      .join(broadcast(firstNew), "user_id")
      .withColumn("day", to_date(col("ts")))
    val days = hist.select("user_id", "day", "first_new_day").distinct()
    // bounded lookback: of each user's days BEFORE the first new day,
    // keep the most recent LookbackRows-1; every day >= it stays
    val wDays = Window.partitionBy("user_id").orderBy(col("day").desc)
    val keptDays = days.filter(col("day") < col("first_new_day"))
      .withColumn("rk", row_number().over(wDays))
      .filter(col("rk") < LookbackRows)
      .select("user_id", "day")
      .unionByName(days.filter(col("day") >= col("first_new_day"))
        .select("user_id", "day"))
    val slice = hist
      .join(broadcast(keptDays), Seq("user_id", "day"), "left_semi")
      .drop("day", "first_new_day")
    GoldFeatures.goldTableFused(slice)
      .join(broadcast(firstNew), "user_id")
      .filter(col("day") >= col("first_new_day"))
      .drop("first_new_day")
  }
}
