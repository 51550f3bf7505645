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

  /** Sentinel "scan everything for this user" lookback floor, used when
    * a user's claimed window is shorter than the full lookback (see the
    * orphan union below). */
  private val FloorMin = java.sql.Date.valueOf("0001-01-01")

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
    // IS bronze's distinct (user, day)), the pass costs O(gold keys ∪
    // batch) — day-row-sized, ~1/events-per-day of bronze — and bronze
    // is never dim-scanned for it. That invariant is SELF-HEALED, not
    // assumed (round 12, closing the r11 ADVICE): the universe is the
    // claimed key set UNION the bronze days inside each affected user's
    // ranking-relevant window that the claim lacks (see [[orphanDays]]'
    // soundness bound) — so a bronze backfill, wiped gold partition, or
    // unretried failed merge converges to the bronze-scan answer instead
    // of silently ranking wrong slices, while a fresh gold table costs
    // only one bounded thin-column scan (the same partition-pruned
    // region the slice scan reads anyway). The reverse direction —
    // PHANTOM gold keys for days bronze lost — remains the caller's
    // invariant, as it always was: gold is defined as the battery over
    // bronze, and bronze histories only grow.
    // Without goldKeys (first batch): the bronze distinct — correct on
    // any input, O(history) but column-pruned.
    val days = goldKeys match {
      case Some(gk) =>
        // affected-user join BEFORE the distinct: the broadcast join
        // cuts the key set to the batch's users (measured 4M → 460k on
        // the 40×-replica probe), so the distinct shuffles the affected
        // slice, never the whole key universe
        // checkpointed so the floors pass, the orphan anti-join, and the
        // dim materialization below read the gold-keys parquet ONCE, not
        // once per consuming action
        val fast = gk.select("user_id", "day")
          .join(broadcast(firstNew), "user_id")
          .unionByName(batch.select(col("user_id"),
              to_date(col("ts")).as("day")).distinct()
            .join(broadcast(firstNew), "user_id"))
          .select("user_id", "day", "first_new_day")
          .distinct()
          .localCheckpoint()
        orphanDays(hist, firstNew, fast) match {
          case Some(orphans) => fast.unionByName(orphans)
          case None => fast
        }
      case None =>
        hist.select("user_id", "day", "first_new_day").distinct()
    }
    // ONE materialization of the day dim serves every downstream action
    // (the lookback ranking feeds the minKept collect, the slice
    // semi-join, AND the output filter — without this, each of those
    // actions re-derives the whole universe chain; the r12 stage tally
    // measured ~half of refresh's stages as exactly that recompute).
    // localCheckpoint is day-row-sized and cleaned by the ContextCleaner
    // when unreferenced; a long-lived cluster deployment would swap in a
    // reliable checkpoint dir (the ConnectedComponents pattern) to
    // survive executor loss.
    val dim = days.localCheckpoint()
    // bounded lookback: of each user's days BEFORE the first new day,
    // keep the most recent LookbackRows-1; every day >= it stays
    val wDays = Window.partitionBy("user_id").orderBy(col("day").desc)
    val keptDays = dim.filter(col("day") < col("first_new_day"))
      .withColumn("rk", row_number().over(wDays))
      .filter(col("rk") < LookbackRows)
      .select("user_id", "day")
      .unionByName(dim.filter(col("day") >= col("first_new_day"))
        .select("user_id", "day"))
    // Partition-pruning floor: every kept (user, day) is at or after the
    // GLOBAL earliest kept day, so the slice scan may skip everything
    // older via a plain predicate on the (partition) day column — the
    // scan bound that makes the refresh O(lookback window), not
    // O(history). The one-row collect is control-plane (a scalar date,
    // like the batched-ingest key universe); the per-user semi join
    // below refines the superset exactly as before, so results are
    // unchanged on any bronze shape.
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

  /** Bronze (user, day) pairs inside each affected user's
    * RANKING-RELEVANT window that the claimed universe `fast` is
    * missing, as rows unionable onto it — or None when there are no
    * affected users.
    *
    * Soundness bound: an orphan day can only change the kept-day slices
    * (or silently lose its own gold row) if it outranks the user's
    * LookbackRows−1-th claimed prior day, or sits at/after the first new
    * day — i.e. is at or above the user's claimed lookback floor. So the
    * scan covers bronze only from each user's claimed floor forward; for
    * a user whose claimed window is SHORT (fewer than the full lookback
    * of prior days — a genuinely young user, or a wiped / half-merged
    * gold table, indistinguishable without looking) the floor drops to
    * day zero and that user's full (thin, column-pruned,
    * distinct-reduced) bronze day set is swept. Steady-state cost: one
    * thin pass over the same partition-pruned lookback region the slice
    * scan reads; the global floor (a one-row control-plane collect)
    * keeps the scan's day predicate on the partition column. */
  private def orphanDays(hist: DataFrame, firstNew: DataFrame,
                         fast: DataFrame): Option[DataFrame] = {
    val wDays = Window.partitionBy("user_id").orderBy(col("day").desc)
    val floors = fast.filter(col("day") < col("first_new_day"))
      .withColumn("rk", row_number().over(wDays))
      .filter(col("rk") < LookbackRows)
      .groupBy("user_id")
      .agg(min("day").as("__floor"), count(lit(1)).as("__n"))
      .select(col("user_id"),
        when(col("__n") === LookbackRows - 1, col("__floor"))
          .otherwise(lit(FloorMin)).as("__floor"))
    // users with NO claimed prior days at all also get the zero floor
    val userFloor = firstNew.select("user_id")
      .join(floors, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("__floor"), lit(FloorMin)).as("__floor"))
    val gf = userFloor.agg(min("__floor")).head()
    if (gf.isNullAt(0)) return None // empty batch: nothing to refresh
    Some(hist
      .filter(col("day") >= lit(gf.getDate(0))) // partition-prunable
      .select("user_id", "day").distinct()
      .join(broadcast(userFloor), "user_id")
      .filter(col("day") >= col("__floor"))
      .drop("__floor")
      .join(fast.select("user_id", "day"), Seq("user_id", "day"),
        "left_anti")
      .join(broadcast(firstNew), "user_id")
      .select("user_id", "day", "first_new_day"))
  }
}
