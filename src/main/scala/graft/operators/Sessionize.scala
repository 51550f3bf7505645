package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the time since the
  * key's previous event exceeds `gapSeconds`. Pure window algebra (lag +
  * running sum of session starts) — one shuffle on the key, linear work,
  * no state beyond the frame; the batch twin of the streaming
  * `flatMapGroupsWithState` sessionizer in `graft.streaming`.
  */
object Sessionize {

  def withSessionIds(df: DataFrame, keyCol: String, tsCol: String,
                     gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // MICROSECOND-exact gap: unix_timestamp() floors to whole seconds, so
    // a true gap of (gap, gap+1s) reads as exactly `gap` and fails the
    // strict >. One such boundary gap exists at sf0.1 — the off-by-one
    // session the sf0.01 gate never sees. Exact integer micros make the
    // strict > unambiguous on both engines (oracle: epoch_us).
    val gap = unix_micros(col(tsCol)) -
      unix_micros(lag(col(tsCol), 1).over(w))
    df.withColumn("is_new_session",
        when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new_session").over(run))
      .drop("is_new_session")
  }
}
