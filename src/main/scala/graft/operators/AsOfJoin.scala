package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the most recent right row
  * with the same key whose timestamp is <= the left timestamp.
  *
  * Implemented with the union + forward-fill trick rather than a non-equi
  * join: both sides are tagged, unioned, and hash-partitioned by key once;
  * a single ordered window forward-fills the latest right-side payload onto
  * the left rows. Cost is one shuffle + one sort — O(n log n) per key and
  * no O(left × right) candidate explosion, so it survives 100 TB where a
  * range-condition SMJ would degenerate on dense right sides. (DuckDB's
  * native `ASOF JOIN` is the oracle equivalent.)
  *
  * Ordering within a (key, ts) collision: right rows sort BEFORE left rows
  * (`side` 0 < 1), so a right row at exactly ts is visible to a left row at
  * ts — standard asof `<=` semantics.
  *
  * `toleranceSeconds` (pandas `merge_asof(tolerance=...)`): when set, a
  * match older than the bound is discarded — the payload is NULLed when
  * `leftTs − matchedRightTs > tolerance`. Staleness is compared on exact
  * epoch microseconds (no truncation surprises at boundaries); the match
  * itself still comes from the same single forward-fill pass, so the
  * tolerance costs one projection, not a second window.
  */
object AsOfJoin {
  def backward(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      payload: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
    val payloadNulls = payload.foldLeft(l) { (df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }.withColumn("__rts", lit(null).cast("timestamp"))
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__ts", col(rightTs))
      .withColumn("__rts", col(rightTs))
      .select((key +: "__side" +: "__ts" +: "__rts" +: payload).map(col): _*)
    val lCols = payloadNulls.columns
    val unioned = payloadNulls
      .select(lCols.map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (payload :+ "__rts").foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    val leftRows = filled.filter(col("__side") === 1)
    val bounded = toleranceSeconds.fold(leftRows) { tol =>
      val stale = col("__rts").isNull ||
        unix_micros(col(leftTs)) - unix_micros(col("__rts")) > tol * 1000000L
      payload.foldLeft(leftRows) { (df, p) =>
        df.withColumn(p, when(stale, lit(null)).otherwise(col(p)))
      }
    }
    bounded.drop("__side", "__ts", "__rts")
  }
}
