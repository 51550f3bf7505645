package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key high-watermark incremental sync — the reference's `bars.py`
  * pattern (S12: find `max(session_date)` per symbol, fetch/append only
  * newer rows; S10: idempotent `ON CONFLICT DO NOTHING` upsert), expressed
  * as a Delta-style MERGE-WHEN-NOT-MATCHED over plain parquet.
  *
  * Scale notes: the watermark table is one groupBy over the sink's key
  * column (column-pruned scan: key + ts only) and is broadcast to filter
  * the source — the source is never shuffled. Appends are partitioned
  * writes; re-running with the same source is a no-op (idempotence test in
  * the spec).
  */
object IncrementalSync {

  /** Append source rows strictly newer than the sink's per-key watermark.
    * Returns the number of rows appended. */
  def appendNewer(spark: SparkSession, source: DataFrame, sinkPath: String,
                  keyCol: String, tsCol: String): Long = {
    val sinkExists = new java.io.File(sinkPath).exists()
    val fresh = if (!sinkExists) source else {
      val wm = spark.read.parquet(sinkPath)
        .select(col(keyCol), col(tsCol))
        .groupBy(keyCol)
        .agg(max(tsCol).as("__wm"))
      source
        .join(broadcast(wm), Seq(keyCol), "left")
        .filter(col("__wm").isNull || col(tsCol) > col("__wm"))
        .drop("__wm")
    }
    val n = fresh.count()
    if (n > 0) fresh.write.mode(SaveMode.Append).parquet(sinkPath)
    n
  }
}
