package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.MergeUpsert

/** S9 — batched-source ingestion: the reference pulls bars for a large
  * symbol universe in fixed-size key batches (`alpa.py:68-79`,
  * `self._chunks(symbols, self.batch_size)` with batch_size 200, one
  * upstream request per chunk) and loads the concatenation.
  *
  * Spark-native shape: the per-batch fetch returns a DataFrame (from any
  * source — REST adapter, JDBC, files); each batch is MERGEd into the sink
  * with ON CONFLICT (key, ts) DO NOTHING semantics, so
  *  - a failed run resumes by simply re-running (already-loaded batches
  *    merge to zero inserts — per-batch idempotence, no bookkeeping table);
  *  - overlapping batches or an upstream that returns duplicates cannot
  *    double-load a row.
  *
  * The driver-side loop is over the KEY LIST (symbols), not data — the key
  * universe (thousands of symbols) is driver-sized by nature; all row data
  * stays distributed.
  */
object BatchedIngest {

  final case class BatchResult(batchIndex: Int, keys: Seq[String],
                               rowsInserted: Long)

  /** Ingest `keys` in batches of `batchSize`: fetch(batchKeys) → MERGE
    * into `sinkPath` keyed by (keyCol, tsCol). Returns one result per
    * batch, in batch order. */
  def run(spark: SparkSession, keys: Seq[String], batchSize: Int,
          fetch: Seq[String] => DataFrame, sinkPath: String,
          keyCol: String, tsCol: String, orderCol: String): Seq[BatchResult] =
    keys.grouped(batchSize).zipWithIndex.map { case (batchKeys, i) =>
      val df = fetch(batchKeys)
      val n = MergeUpsert.insertIfAbsent(spark, df, sinkPath,
        Seq(keyCol, tsCol), orderCol)
      BatchResult(i, batchKeys, n)
    }.toSeq
}
