package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key high-watermark incremental sync — the reference's `bars.py`
  * pattern (S12: find `max(session_date)` per symbol, fetch/append only
  * newer rows; S10: idempotent `ON CONFLICT DO NOTHING` upsert on
  * (symbol, time_utc), `bars.py:196-198`).
  *
  * Two-stage design:
  *  1. watermark PRUNE (performance): per-key max(ts) from a column-pruned
  *    scan of the sink, broadcast against the source — at 100 TB this
  *    drops the already-synced bulk before any wide operation. `>=` keeps
  *    boundary rows: the watermark row itself must survive to stage 2 so
  *    exactness never depends on the prune.
  *  2. keyed anti-join MERGE (correctness): [[MergeUpsert.insertIfAbsent]]
  *    on (key, ts) — same-key-same-timestamp conflicts are dropped, not
  *    duplicated, and a re-run appends nothing (idempotent).
  *
  * The appended row count comes from an `Observation` on the write — the
  * source pipeline executes exactly once. All filesystem access goes
  * through the Hadoop FileSystem API (works on HDFS/S3A, not just local).
  */
object IncrementalSync {

  /** Merge source rows newer than the sink's per-key watermark (plus any
    * rows for unseen keys) into the sink, ON CONFLICT (key, ts) DO
    * NOTHING. Returns the number of rows appended. */
  def appendNewer(spark: SparkSession, source: DataFrame, sinkPath: String,
                  keyCol: String, tsCol: String, orderCol: String): Long = {
    if (!MergeUpsert.tableExists(spark, sinkPath)) {
      val obs = new Observation()
      source.observe(obs, count(lit(1)).as("n"))
        .write.mode(SaveMode.Append).parquet(sinkPath)
      obs.get("n").asInstanceOf[Long]
    } else {
      val wm = spark.read.parquet(sinkPath)
        .select(col(keyCol), col(tsCol))
        .groupBy(keyCol)
        .agg(max(tsCol).as("__wm"))
      val pruned = source
        .join(broadcast(wm), Seq(keyCol), "left")
        .filter(col("__wm").isNull || col(tsCol) >= col("__wm"))
        .drop("__wm")
      MergeUpsert.insertIfAbsent(spark, pruned, sinkPath,
        Seq(keyCol, tsCol), orderCol)
    }
  }
}
