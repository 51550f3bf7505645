package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Keyed MERGE over parquet tables — the reference's `ON CONFLICT DO
  * NOTHING` upsert (`bars.py:196-198`,
  * `stmt.on_conflict_do_nothing(index_elements=["symbol","time_utc"])`)
  * and the lakehouse `MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`
  * (`Procesamiento_fase_1.ipynb:305` overwritePartitions), re-expressed
  * Spark-native.
  *
  * Delta/Iceberg are not on the classpath in this environment, so MERGE is
  * built from the two primitives a lakehouse engine itself uses:
  *
  *  - [[insertIfAbsent]] — WHEN NOT MATCHED THEN INSERT is append-only:
  *    anti-join the (deduplicated) source against the target's keys and
  *    append exactly the new rows. No rewrite, no swap; idempotent because
  *    a re-run's anti-join removes everything. The target side of the
  *    anti-join projects ONLY the key columns (column-pruned scan), so at
  *    100 TB the join's build side is keys-not-rows and broadcastable per
  *    partition.
  *
  *  - [[upsertPartitioned]] — WHEN MATCHED UPDATE needs copy-on-write.
  *    File-level COW needs a table format; the Spark-native equivalent is
  *    PARTITION-level COW: rewrite only the partitions the source touches
  *    (dynamic partition overwrite), keeping target rows that lose no
  *    conflict and taking source rows for new/conflicting keys
  *    (source-wins). Untouched partitions are never read or written.
  *
  * Row counts come from `Observation` metrics attached to the write — the
  * merge pipeline executes exactly once (no count()-then-write double
  * evaluation).
  *
  * All paths go through the Hadoop FileSystem API, not java.io.File — the
  * same code runs against HDFS/S3A at cluster scale.
  */
object MergeUpsert {

  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** Deduplicate the source on the merge keys (first row per key by
    * `orderCol` wins — Postgres ON CONFLICT within one statement keeps the
    * first arriving row; we make "first" deterministic instead of
    * insertion-ordered). */
  private def dedupSource(source: DataFrame, keyCols: Seq[String],
                          orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    source.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MERGE ... WHEN NOT MATCHED THEN INSERT (ON CONFLICT DO NOTHING).
    *
    * Appends source rows whose key is absent from the target table;
    * re-running with the same source appends nothing (idempotent), and
    * same-key rows — including same-key-same-timestamp conflicts — are
    * never duplicated. Returns the number of rows inserted.
    */
  def insertIfAbsent(spark: SparkSession, source: DataFrame,
                     tablePath: String, keyCols: Seq[String],
                     orderCol: String,
                     sourceKeyUnique: Boolean = false): Long = {
    val fresh = newRows(spark, source, tablePath, keyCols, orderCol,
      sourceKeyUnique)
    val obs = new Observation()
    fresh.observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).parquet(tablePath)
    obs.get("n").asInstanceOf[Long]
  }

  /** The WHEN-NOT-MATCHED row set [[insertIfAbsent]] appends. Public so
    * plan audits (graft.Plans) can assert the scale-critical property:
    * the target side of the anti-join scans ONLY the key columns.
    *
    * `sourceKeyUnique = true` (r13): the caller asserts the source is
    * already key-unique — a windowed-aggregate or joined-pair
    * micro-batch, unique by construction — so the first-row-per-key
    * dedup window (one keyed shuffle of the source PER CALL; the
    * streaming merge sink pays it per micro-batch) is provably the
    * identity and is skipped. */
  def newRows(spark: SparkSession, source: DataFrame, tablePath: String,
              keyCols: Seq[String], orderCol: String,
              sourceKeyUnique: Boolean = false): DataFrame = {
    val deduped =
      if (sourceKeyUnique) source
      else dedupSource(source, keyCols, orderCol)
    if (!tableExists(spark, tablePath)) deduped
    else {
      // keys-only target scan: the anti-join build side carries the key
      // columns, never full rows.
      val targetKeys = spark.read.parquet(tablePath)
        .select(keyCols.map(col): _*).distinct()
      deduped.join(targetKeys, keyCols, "left_anti")
    }
  }

  /** MERGE ... WHEN MATCHED THEN UPDATE (source-wins) WHEN NOT MATCHED
    * THEN INSERT, restricted to the partitions the source touches.
    *
    * The table must be written partitioned by `partitionCol`. Only
    * partitions present in the source are rewritten (dynamic partition
    * overwrite); within them, target rows keep their data unless the
    * source carries the same key. Returns (rowsWritten) for the rewritten
    * partitions.
    */
  def upsertPartitioned(spark: SparkSession, source: DataFrame,
                        tablePath: String, keyCols: Seq[String],
                        partitionCol: String, orderCol: String): Long = {
    val deduped = dedupSource(source, keyCols, orderCol)
    val merged =
      if (!tableExists(spark, tablePath)) deduped
      else {
        val target = spark.read.parquet(tablePath)
        // partition pruning: only target partitions the source touches are
        // read (semi join on the partition column pushes into the scan as
        // a dynamic filter; at fixture scale it is a broadcast).
        val touched = deduped.select(partitionCol).distinct()
        val affected = target.join(broadcast(touched), Seq(partitionCol),
          "left_semi")
        val kept = affected.join(deduped.select(keyCols.map(col): _*),
          keyCols, "left_anti")
        kept.unionByName(deduped)
      }
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val obs = new Observation()
      // align the shuffle with the write partitioning: one file per
      // rewritten partition instead of a sliver from every task (the
      // small-file blowup a real table's OPTIMIZE would have to undo)
      merged.repartition(col(partitionCol))
        .observe(obs, count(lit(1)).as("n"))
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol)
        .parquet(tablePath)
      obs.get("n").asInstanceOf[Long]
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
