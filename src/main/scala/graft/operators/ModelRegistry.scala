package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned model registry AS A TABLE — the reference's model-export
  * surface (`data_apis/my_model.py:515-565` `export_best_models_to_mlflow`:
  * best-model artifacts persisted with versions and reloaded to score)
  * re-expressed on the repo's transactional table format. A registry IS a
  * [[SnapshotTable]] whose rows are `(model_name, version, <payload>)`:
  * registration inherits the format's atomic-rename commit (a crashed
  * registration leaves no torn row), and version assignment reads
  * COMMITTED state — monotonic across process restarts by construction,
  * never an in-memory counter. Writer contract: one registrar per
  * model_name at a time (MLflow's registry sequencing); concurrent
  * registrations of DIFFERENT names are safe (table commits serialize
  * at the manifest). st15
  * (StreamingQueries) proves the dir-shaped half of this contract
  * (mid-stream reload); this operator adds the queryable half: list
  * versions, latest-per-model, reload-latest-and-score.
  *
  * Scale shape: a model row is coefficients + metrics (KBs per version);
  * every registry read is metadata-sized and every scoring join of a
  * registry against a corpus is a broadcast join — the registry never
  * shuffles the corpus.
  */
object ModelRegistry {

  /** Append `model` (any payload schema, constant per registry) under
    * `modelName` with the next version for that name; returns the version
    * assigned. The max-version read scans only the registry table (model
    * metadata, KBs — the same driver-side contract as
    * [[SnapshotTable.versions]]), never corpus data. */
  def register(spark: SparkSession, path: String, modelName: String,
               model: DataFrame): Long = {
    require(!model.columns.contains("model_name") &&
      !model.columns.contains("version"),
      "model payload must not shadow registry columns")
    val next: Long =
      if (SnapshotTable.versions(spark, path).isEmpty) 1L
      else SnapshotTable.read(spark, path)
        .filter(col("model_name") === modelName)
        .agg(coalesce(max("version"), lit(0L)).as("v"))
        .head().getLong(0) + 1L
    SnapshotTable.commit(spark,
      model.withColumn("model_name", lit(modelName))
        .withColumn("version", lit(next)),
      path, replace = false)
    next
  }

  /** Full registry listing with an `is_latest` flag per model_name. */
  def list(spark: SparkSession, path: String): DataFrame = {
    val w = Window.partitionBy("model_name")
    SnapshotTable.read(spark, path).withColumn("is_latest",
      (col("version") === max("version").over(w)).cast("long"))
  }

  /** The latest version's rows for `modelName` — the reload-to-score
    * path; callers broadcast-join this against the corpus. */
  def latest(spark: SparkSession, path: String,
             modelName: String): DataFrame =
    list(spark, path)
      .filter(col("model_name") === modelName && col("is_latest") === 1L)
      .drop("is_latest")

  /** A PINNED version's rows — unlike [[latest]], a missing version is an
    * ERROR: a pin that silently re-resolved (to latest, or to whatever
    * survived [[retain]]) would score with a model the caller did not
    * choose. Empty-check is a driver read of the metadata-sized registry. */
  def pinned(spark: SparkSession, path: String, modelName: String,
             version: Long): DataFrame = {
    val rows = SnapshotTable.read(spark, path)
      .filter(col("model_name") === modelName &&
        col("version") === version)
    if (rows.isEmpty) throw new NoSuchElementException(
      s"registry $path has no version $version of '$modelName' " +
        "(GC'd by retain or never registered) — refusing to re-resolve")
    rows
  }

  /** Retention GC: keep the newest `keep` versions per model_name, drop
    * everything older in ONE replace commit. The registry grows a version
    * per registration forever without this; with it the table stays
    * KB-sized regardless of training cadence.
    *
    * Crash-safety rides the snapshot format's atomic manifest commit:
    * readers see the pre-GC or post-GC registry, never a half-vacuumed
    * one, and time travel to pre-GC versions still works until the
    * format's own vacuum drops the unreferenced files. `is_latest` is
    * rank-derived, so it survives by construction (the newest version is
    * always in the kept suffix). Returns (rows kept, rows dropped).
    *
    * Concurrency: the GC's replace commit is derived from a snapshot
    * read, so it is published CONDITIONALLY (`expectedHead` — the
    * format's compare-and-swap): a registration of ANY model landing
    * between the read and the commit fails the CAS instead of being
    * silently erased, and retain re-reads the new head and retries.
    * Registrations therefore never lose; only the GC repeats its
    * metadata-sized work. */
  def retain(spark: SparkSession, path: String, keep: Int): (Long, Long) = {
    require(keep >= 1, s"retain keeps at least the latest version, got $keep")
    val w = Window.partitionBy("model_name").orderBy(col("version").desc)
    // the format's shared CAS-retry policy (bounded attempts, randomized
    // 50-200ms backoff so a steady registrar stream doesn't burn every
    // attempt back-to-back; a genuine storm is surfaced, not absorbed)
    SnapshotTable.retryCas() {
      val head = SnapshotTable.versions(spark, path).lastOption.getOrElse(0)
      if (head == 0) (0L, 0L) // empty registry: nothing to GC
      else {
        val ranked = SnapshotTable.read(spark, path, Some(head))
          .withColumn("__vrank", dense_rank().over(w))
        val counts = ranked.agg(
          sum(when(col("__vrank") <= keep, 1L).otherwise(0L)),
          sum(when(col("__vrank") > keep, 1L).otherwise(0L))).head()
        val kept = if (counts.isNullAt(0)) 0L else counts.getLong(0)
        val dropped = if (counts.isNullAt(1)) 0L else counts.getLong(1)
        if (dropped == 0L) (kept, 0L)
        else {
          SnapshotTable.commit(spark,
            ranked.filter(col("__vrank") <= keep).drop("__vrank"),
            path, replace = true, expectedHead = Some(head))
          (kept, dropped)
        }
      }
    }
  }
}
