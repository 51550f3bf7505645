package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway a V1 streaming source needs: a batch
  * DataFrame re-tagged as streaming. `MicroBatchExecution` asserts that
  * `Source.getBatch` returns a STREAMING frame, and the only constructor
  * for one is `SparkSession.internalCreateDataFrame(..., isStreaming =
  * true)` — exactly how Spark's own `FileStreamSource` wraps the parquet
  * batch it builds per micro-batch (FileStreamSource.getBatch). Scoped to
  * this single call; no other internals are touched.
  */
object StreamingShim {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = true)
}
