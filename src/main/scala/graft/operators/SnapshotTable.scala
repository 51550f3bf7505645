package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pinned snapshot tables — the table-format core (Iceberg/Delta
  * style) built from primitives, since the format jars are absent in this
  * environment: readers never list directories; they read an immutable
  * MANIFEST (the exact data-file set of one committed version), so
  *
  *  - a reader holding version N is isolated from every later commit,
  *    compaction, or overwrite (no torn reads mid-rewrite — the failure
  *    mode `Compaction`'s directory swap documents);
  *  - time travel is "read an older manifest";
  *  - concurrent writers serialize on an exclusive-create COMMIT LOCK
  *    (`java.nio` O_CREAT|O_EXCL on local filesystems — Hadoop's local
  *    `rename`/`create(overwrite=false)` are check-then-act and CAN both
  *    succeed under a race, a TOCTOU this module's own concurrency spec
  *    caught; namenode-atomic `create(overwrite=false)` on HDFS; a
  *    conditional PUT on S3). The version number is assigned under the
  *    lock, the manifest becomes visible via rename, and a crashed
  *    holder's lock is stolen after a staleness horizon — nobody ever
  *    observes a half-committed file set or a clobbered version;
  *  - vacuum deletes data files no surviving manifest references —
  *    storage GC decoupled from readers by the retention horizon.
  *
  * Layout under `tablePath/`:
  * {{{
  *   data/<commit-uuid>/part-*.parquet   -- immutable once written
  *   _manifests/v<N>.manifest            -- one relative path per line
  * }}}
  *
  * All paths go through the Hadoop FileSystem API (HDFS/S3A-ready; on S3
  * the atomic-rename CAS would move to a conditional PUT, the same
  * mechanism table formats use there). This is also what replaces
  * `StageCache`'s dir+mtime freshness key at cluster scale: a stage built
  * FROM snapshot version N is valid exactly while N is the table head —
  * pin the manifest, not the mtime.
  *
  * Ref semantics: Procesamiento_fase_1.ipynb:137,305 (MERGE/OVERWRITE on
  * a managed table — the snapshot/commit half; the MERGE row math lives
  * in [[MergeUpsert]]).
  */
object SnapshotTable {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(tablePath: String) =
    new Path(tablePath, "_manifests")

  private def manifestPath(tablePath: String, v: Int) =
    new Path(manifestDir(tablePath), s"v$v.manifest")

  /** Committed versions, ascending (empty for a fresh table). */
  def versions(spark: SparkSession, tablePath: String): Seq[Int] = {
    val dir = manifestDir(tablePath)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .sorted
  }

  private def readManifest(spark: SparkSession, tablePath: String,
                           v: Int): Seq[String] = {
    val p = manifestPath(tablePath, v)
    val f = fs(spark, p)
    require(f.exists(p), s"snapshot v$v does not exist (vacuumed or never " +
      s"committed) at $tablePath")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** How long a commit lock may sit before another writer may presume
    * its holder dead and steal it. Lock holders only do manifest-sized
    * I/O (the data files are written before acquiring), so a healthy
    * holder releases in milliseconds. */
  private val LockStaleMs = 60000L

  /** Atomically claim `lock`. Local filesystems go through
    * `java.nio.Files.createFile` (O_CREAT|O_EXCL — actually atomic;
    * Hadoop's local create/rename are check-then-act and lose updates
    * under contention); everything else uses `create(overwrite=false)`,
    * which HDFS enforces atomically at the namenode. */
  private def tryLock(f: org.apache.hadoop.fs.FileSystem,
                      lock: Path): Boolean =
    if (f.getScheme == "file") {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(lock.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => false
      }
    } else {
      try { f.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
    }

  /** Commit `df` as the next version. `replace = true` makes the new
    * manifest exactly this commit's files (overwrite semantics);
    * `replace = false` appends them to the current head's file set.
    * Returns the committed version. Data files are written ONCE, outside
    * the lock; only the version assignment and manifest publish — pure
    * metadata — are serialized. */
  def commit(spark: SparkSession, df: DataFrame, tablePath: String,
             replace: Boolean = true): Int = {
    val commitId = java.util.UUID.randomUUID().toString
    val dataDir = new Path(new Path(tablePath, "data"), commitId)
    df.write.parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val newFiles = f.listStatus(dataDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => s"data/$commitId/${p.getName}")
    f.mkdirs(manifestDir(tablePath))
    val lock = new Path(manifestDir(tablePath), "_commit.lock")
    var attempts = 0
    while (attempts < 500) {
      attempts += 1
      if (tryLock(f, lock)) {
        try {
          val head = versions(spark, tablePath).lastOption
          val base =
            if (replace) Seq.empty
            else head.map(readManifest(spark, tablePath, _))
              .getOrElse(Seq.empty)
          val v = head.getOrElse(0) + 1
          val tmp = new Path(manifestDir(tablePath), s".tmp-$commitId-$v")
          val out = f.create(tmp, false)
          try out.write((base ++ newFiles).mkString("\n").getBytes("UTF-8"))
          finally out.close()
          // under the lock the destination cannot exist; rename gives
          // readers atomic manifest visibility
          require(f.rename(tmp, manifestPath(tablePath, v)),
            s"manifest publish failed for v$v at $tablePath")
          return v
        } finally f.delete(lock, false)
      } else {
        // crashed-holder recovery: a lock past the staleness horizon is
        // deleted; the delete+create pair then races through the atomic
        // create above, so at most one stealer wins
        try {
          val age = System.currentTimeMillis() -
            f.getFileStatus(lock).getModificationTime
          if (age > LockStaleMs) f.delete(lock, false)
        } catch { case _: java.io.FileNotFoundException => () }
        Thread.sleep(10)
      }
    }
    throw new IllegalStateException(
      s"commit contention: lock not acquired after 500 attempts at " +
        tablePath)
  }

  /** Read a pinned snapshot (`version = None` → current head). The
    * returned frame holds the version's exact file list — later commits,
    * compactions, or vacuums of OTHER versions cannot change or tear it. */
  def read(spark: SparkSession, tablePath: String,
           version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse {
      val vs = versions(spark, tablePath)
      require(vs.nonEmpty, s"no committed snapshots at $tablePath")
      vs.last
    }
    val files = readManifest(spark, tablePath, v)
      .map(rel => new Path(tablePath, rel).toString)
    spark.read.parquet(files: _*)
  }

  /** Compaction as a COMMIT: rewrite the head's rows into
    * ~`targetBytes`-sized files and publish them as the next version.
    * Because readers pin manifests, there is NO swap window at all — the
    * structural fix for the rename-pair hazard the directory-based
    * [[Compaction]] has to roll back from: old readers keep the old
    * manifest's files (still on disk until vacuum), new readers get the
    * compacted set, and a crash mid-rewrite leaves an orphan data dir
    * that no manifest references (vacuum-able garbage, never a broken
    * table). Returns the committed version. */
  def compactSnapshot(spark: SparkSession, tablePath: String,
                      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val head = versions(spark, tablePath).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"no committed snapshots at $tablePath"))
    val f = fs(spark, new Path(tablePath))
    val totalBytes = readManifest(spark, tablePath, head)
      .map(rel => f.getFileStatus(new Path(tablePath, rel)).getLen).sum
    val nFiles = math.max(1, math.ceil(
      totalBytes.toDouble / targetBytes).toInt)
    commit(spark, read(spark, tablePath, Some(head)).repartition(nFiles),
      tablePath, replace = true)
  }

  /** Source-wins MERGE as a commit (the SCD-1 upsert of
    * [[MergeUpsert.upsertPartitioned]], snapshot flavor): target rows
    * losing a key conflict are replaced by source rows, everything else
    * survives, and the result is the next version — readers see the old
    * or the new table, never a mix. Duplicate source keys collapse to the
    * first row by `orderCol` (deterministic, like the partitioned path).
    * At scale the rewrite would keep manifest entries for files whose
    * min/max key stats prove them untouched (file-level COW); here every
    * file is rewritten — the manifest mechanics are identical. */
  def upsertSnapshot(spark: SparkSession, source: DataFrame,
                     tablePath: String, keyCols: Seq[String],
                     orderCol: String): Int = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val deduped = source.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val merged = versions(spark, tablePath).lastOption match {
      case None => deduped
      case Some(v) =>
        read(spark, tablePath, Some(v))
          .join(deduped.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(deduped)
    }
    commit(spark, merged, tablePath, replace = true)
  }

  /** Drop manifests older than `keepFrom` and delete every data file no
    * surviving manifest references. Readers pinned at ≥ keepFrom are
    * unaffected; reads of expired versions fail loudly (the retention
    * contract every table format has). Returns deleted data-file count. */
  def vacuum(spark: SparkSession, tablePath: String, keepFrom: Int): Int = {
    val all = versions(spark, tablePath)
    val (expired, kept) = all.partition(_ < keepFrom)
    require(kept.nonEmpty, s"vacuum would delete every snapshot " +
      s"(keepFrom=$keepFrom, versions=${all.mkString(",")})")
    val keepFiles = kept.flatMap(readManifest(spark, tablePath, _)).toSet
    val f = fs(spark, new Path(tablePath))
    var deleted = 0
    expired.foreach { v =>
      readManifest(spark, tablePath, v).foreach { rel =>
        if (!keepFiles.contains(rel) &&
            f.delete(new Path(tablePath, rel), false)) deleted += 1
      }
      f.delete(manifestPath(tablePath, v), false)
    }
    deleted
  }
}
