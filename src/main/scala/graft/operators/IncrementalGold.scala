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

  /** Sentinel "check everything" lookback floor for users whose universe
    * window is shorter than the full lookback (see the staleness guard). */
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
    // is never scanned for it. The invariant is GUARDED, not assumed
    // (round-12, closing the r11 ADVICE): a bounded staleness probe
    // (below) anti-joins the affected users' bronze days inside their
    // lookback windows against the claimed universe; any orphan (bronze
    // backfill, gold wipe, unretried failed merge) falls the refresh
    // back to the bronze-scan universe — correct on any input,
    // O(history). The bronze-scan path is also the first-batch fallback.
    // This was the round-11 probe's last data-sized refresh term — with
    // the bronze-scan days dim, refresh measured ≈ full-build cost even
    // on a 480-day partitioned history, because the dim pass re-read
    // what the slice bound was built to skip.
    val bronzeUniverse = () =>
      hist.select("user_id", "day", "first_new_day").distinct()
    goldKeys match {
      case Some(gk) =>
        val fast = gk.select("user_id", "day")
          // affected-user join BEFORE the distinct: the broadcast join
          // cuts the key set to the batch's users (measured 4M → 460k on
          // the 40×-replica probe), so the distinct shuffles the affected
          // slice, never the whole key universe
          .join(broadcast(firstNew), "user_id")
          .unionByName(batch.select(col("user_id"),
              to_date(col("ts")).as("day")).distinct()
            .join(broadcast(firstNew), "user_id"))
          .select("user_id", "day", "first_new_day")
          .distinct()
        if (universeFresh(hist, firstNew, fast)) assemble(hist, firstNew, fast)
        else {
          System.err.println("[IncrementalGold] gold key set is stale for " +
            "affected users (bronze backfill / wiped or half-merged gold?)" +
            " — falling back to the bronze-scan day universe")
          assemble(hist, firstNew, bronzeUniverse())
        }
      case None => assemble(hist, firstNew, bronzeUniverse())
    }
  }

  /** Lookback-ranked day slices + the Gold battery over them, for a
    * given (user, day, first_new_day) universe. */
  private def assemble(hist: DataFrame, firstNew: DataFrame,
                       days: DataFrame): DataFrame = {
    val (keptDays, minKept) = keptAndFloor(days)
    val bounded =
      if (minKept.isEmpty) hist
      else hist.filter(col("day") >= lit(minKept.get))
    val slice = bounded
      .join(broadcast(keptDays.select("user_id", "day")),
        Seq("user_id", "day"), "left_semi")
      .drop("day", "first_new_day")
    GoldFeatures.goldTableFused(slice)
      .join(broadcast(firstNew), "user_id")
      .filter(col("day") >= col("first_new_day"))
      .drop("first_new_day")
  }

  /** The kept (user, day) set for a universe — each user's most recent
    * LookbackRows−1 days before their first new day, plus every day at
    * or after it — and the GLOBAL pruning floor (min kept day; every
    * kept pair is at or after it, so the slice scan may skip everything
    * older via a plain predicate on the (partition) day column — the
    * scan bound that makes the refresh O(lookback window), not
    * O(history); the one-row collect is control-plane, a scalar date). */
  private def keptAndFloor(days: DataFrame)
      : (DataFrame, Option[java.sql.Date]) = {
    val wDays = Window.partitionBy("user_id").orderBy(col("day").desc)
    val keptDays = days.filter(col("day") < col("first_new_day"))
      .withColumn("rk", row_number().over(wDays))
      .filter(col("rk") < LookbackRows)
      .select("user_id", "day")
      .unionByName(days.filter(col("day") >= col("first_new_day"))
        .select("user_id", "day"))
    val minKept = keptDays.agg(min("day")).head()
    (keptDays,
      if (minKept.isNullAt(0)) None else Some(minKept.getDate(0)))
  }

  /** Staleness guard for the gold-key fast path: TRUE iff, for every
    * affected user, bronze holds no (user, day) inside that user's
    * ranking-relevant window that the claimed universe is missing.
    *
    * Soundness bound: an orphan day can only change the kept-day slices
    * (or silently lose its own gold row) if it ranks INSIDE the user's
    * lookback window — i.e. is strictly more recent than the user's
    * LookbackRows−1-th claimed prior day, or at/after the first new day.
    * So the check scans bronze only from each user's claimed floor
    * forward; for a user whose claimed window is SHORT (fewer than the
    * full lookback of prior days — a genuinely young user, or a wiped /
    * half-merged gold table, indistinguishable without looking) the
    * floor drops to day zero and that user's full (thin, column-pruned,
    * distinct-reduced) bronze day set is checked. Steady state cost: one
    * extra pass over the same partition-pruned lookback slice the
    * refresh reads anyway. */
  private def universeFresh(hist: DataFrame, firstNew: DataFrame,
                            days: DataFrame): Boolean = {
    val wDays = Window.partitionBy("user_id").orderBy(col("day").desc)
    val floors = days.filter(col("day") < col("first_new_day"))
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
    if (gf.isNullAt(0)) return true // empty batch: nothing to refresh
    val globalFloor = gf.getDate(0)
    hist.filter(col("day") >= lit(globalFloor)) // partition-prunable
      .select("user_id", "day").distinct()
      .join(broadcast(userFloor), "user_id")
      .filter(col("day") >= col("__floor"))
      .join(days.select("user_id", "day"), Seq("user_id", "day"),
        "left_anti")
      .isEmpty
  }
}
