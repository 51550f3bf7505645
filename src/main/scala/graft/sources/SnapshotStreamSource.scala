package graft.sources

import graft.operators.SnapshotTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The snapshot table as a STREAMING SOURCE — tail a
  * [[graft.operators.SnapshotTable]]'s commits as micro-batches, the
  * Delta/Iceberg streaming-source pattern and the streaming completion of
  * `readAppendsSince` (u8):
  *
  *  - **offset = committed version number.** The checkpoint stores the
  *    last version delivered; a restarted query resumes from it exactly
  *    (no re-read, no gap) — table-format commits are already exactly the
  *    replayable, totally-ordered log a streaming source needs, so no
  *    extra bookkeeping exists.
  *  - **one batch = the files added in (startV, endV].** The manifest
  *    set-difference names the data files BEFORE any I/O, so each batch
  *    costs the appended bytes, never the table — a 100 TB table tails
  *    for the price of its new data.
  *  - **rewrites fail loudly.** If a compaction/replace/upsert rewrote
  *    history between offsets, file-level increments are undefined;
  *    `readAppendsSince` refuses and the stream surfaces the error
  *    instead of silently re-delivering rewritten rows (Delta's
  *    ignoreChanges footgun, made impossible rather than opt-out).
  *  - schema = the table's RECORDED schema at stream start (evolution
  *    between restarts is fine; mid-stream evolution surfaces on restart,
  *    the standard streaming-source contract).
  *
  * Registered as a V1 `StreamSourceProvider` (the DataFrame-returning
  * streaming API): `spark.readStream.format("snapshot-table")
  * .option("path", tablePath).load()`. V1 fits exactly because a batch IS
  * a DataFrame here — a parquet read of the added files with the recorded
  * schema applied.
  */
class SnapshotStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "snapshot-table"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "snapshot-table source requires .option(\"path\", <tablePath>)"))

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) = {
    val t = path(parameters)
    val s = schema.orElse(
      SnapshotTable.tableSchema(sqlContext.sparkSession, t)).getOrElse(
      SnapshotTable.read(sqlContext.sparkSession, t).schema)
    (shortName(), s)
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val t = path(parameters)
    new SnapshotStreamSource(sqlContext, t,
      sourceSchema(sqlContext, schema, providerName, parameters)._2)
  }
}

class SnapshotStreamSource(sqlContext: SQLContext, tablePath: String,
                           override val schema: StructType) extends Source {

  private def spark = sqlContext.sparkSession

  /** Version encoded in a checkpointed offset. Live, the engine hands
    * back our own [[LongOffset]]; on restart it hands a SerializedOffset
    * wrapping the checkpointed json — every V1 offset round-trips through
    * `json`, so the fallback decodes both. */
  private def version(o: V1Offset): Int = o match {
    case LongOffset(v) => v.toInt
    case other => other.json.trim.toInt
  }

  override def getOffset: Option[V1Offset] =
    SnapshotTable.versions(spark, tablePath).lastOption
      .map(v => LongOffset(v.toLong))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(version).getOrElse(0)
    val to = version(end)
    val batch =
      if (from == 0)
        // first-ever batch: the table head at `to` IS the initial load
        SnapshotTable.read(spark, tablePath, Some(to))
      else
        SnapshotTable.readAppendsSince(spark, tablePath, from, Some(to))
    org.apache.spark.sql.graft.StreamingShim.asStreaming(spark, batch)
  }

  override def stop(): Unit = ()
}
