package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's 32-slot New-York trading-day grid
  * (Procesamiento_fase_2.ipynb:113): per key, one row per (day, slot) with
  * slot s = NY wall-clock 04:00 + 30min·s, s ∈ [0, 32). The band
  * 04:00–19:30 never touches the 2–3am DST skip/repeat window, so every
  * wall time maps to exactly one UTC instant year-round and a lag of
  * k·32 rows is exactly the same wall-clock slot k grid-days back —
  * DST-correct by construction.
  *
  * Generated distributed: `sequence` + `explode` per key; the driver never
  * materializes the grid.
  */
object TradingGrid {

  val SlotsPerDay = 32

  /** (user_id, day, slot, wall, utc) for every key in `users` over
    * [start, end] inclusive. */
  def nyGrid(users: DataFrame, start: java.time.LocalDate,
             end: java.time.LocalDate): DataFrame =
    users
      .select(col("user_id"),
        explode(sequence(
          lit(java.sql.Date.valueOf(start)),
          lit(java.sql.Date.valueOf(end)),
          expr("INTERVAL 1 DAY"))).as("day"))
      .select(col("user_id"), col("day"),
        explode(sequence(lit(0), lit(SlotsPerDay - 1))).as("slot"))
      .withColumn("wall", col("day").cast("timestamp") +
        expr("make_dt_interval(0, 4, slot * 30, 0)"))
      .withColumn("utc", to_utc_timestamp(col("wall"), "America/New_York"))
}
