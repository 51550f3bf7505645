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
    val gap = unix_timestamp(col(tsCol)) -
      unix_timestamp(lag(col(tsCol), 1).over(w))
    df.withColumn("is_new_session",
        when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new_session").over(run))
      .drop("is_new_session")
  }
}
