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

  private def schemaPath(tablePath: String, v: Int) =
    new Path(manifestDir(tablePath), s"v$v.schema.json")

  private def dvPath(tablePath: String, v: Int) =
    new Path(manifestDir(tablePath), s"v$v.deletes")

  private def timePath(tablePath: String, v: Int) =
    new Path(manifestDir(tablePath), s"v$v.time")

  /** The TABLE schema recorded at commit time for `version` (head when
    * `None`) — the Delta/Iceberg design: schema lives in table metadata,
    * not in data-file footers, so a 100 TB read never footer-merges a
    * million files to discover one added column. `None` for tables
    * committed before schema tracking (readers then fall back to footer
    * inference, the legacy behavior). */
  def tableSchema(spark: SparkSession, tablePath: String,
                  version: Option[Int] = None)
      : Option[org.apache.spark.sql.types.StructType] = {
    val v = version.getOrElse {
      val vs = versions(spark, tablePath)
      require(vs.nonEmpty, s"no committed snapshots at $tablePath")
      vs.last
    }
    val p = schemaPath(tablePath, v)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  private def asNullable(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(s.fields.map(_.copy(nullable = true)))

  /** Append-commit schema evolution (Iceberg `union_by_name` semantics):
    * columns present in both keep their exact type (a type CHANGE is
    * refused loudly — silent widening corrupts downstream readers), new
    * columns append after the existing ones, dropped-in-source columns
    * survive (old files still carry them; new files read them as null). */
  private def evolve(old: org.apache.spark.sql.types.StructType,
                     nw: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    old.fields.foreach { f =>
      nw.fields.find(_.name == f.name).foreach { g =>
        require(g.dataType == f.dataType,
          s"schema evolution cannot change the type of column '${f.name}' " +
            s"(${f.dataType.simpleString} -> ${g.dataType.simpleString}); " +
            "write the cast explicitly into a new column instead")
      }
    }
    val oldNames = old.fieldNames.toSet
    org.apache.spark.sql.types.StructType(
      old.fields ++ nw.fields.filterNot(g => oldNames.contains(g.name)))
  }

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

  /** One manifest entry: a data file plus optional per-column min/max
    * stats (the Iceberg file-stats idea — the metadata that lets a reader
    * skip files BEFORE any scan task is scheduled). Values are exact
    * decimal strings in the manifest; absence of stats for a column means
    * the file can never be pruned on it (conservative by construction). */
  final case class FileEntry(path: String,
                             stats: Map[String, (BigDecimal, BigDecimal)])

  /** Manifest line format: `relpath` or
    * `relpath\tcol=min..max\tcol2=min..max`. */
  private def renderEntry(e: FileEntry): String =
    (e.path +: e.stats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
      s"$c=$mn..$mx"
    }).mkString("\t")

  private def parseEntry(line: String): FileEntry = {
    val parts = line.split("\t")
    FileEntry(parts.head, parts.tail.map { s =>
      val Array(c, range) = s.split("=", 2)
      val Array(mn, mx) = range.split("\\.\\.", 2)
      c -> (BigDecimal(mn), BigDecimal(mx))
    }.toMap)
  }

  private def readLines(spark: SparkSession, tablePath: String,
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

  /** Manifest lines can carry `#`-prefixed metadata headers (today:
    * `#txn\tapp\tid` — the per-writer transaction watermark); data-file
    * entries never start with `#` (paths are `data/...`). Parsers of
    * FILE entries must go through this filter; verbatim manifest copies
    * (deleteWhere, restore) keep the headers so the txn map carries
    * forward through maintenance commits. */
  private def dataLines(lines: Seq[String]): Seq[String] =
    lines.filterNot(_.startsWith("#"))

  /** The per-application transaction watermarks recorded in version
    * `v`'s manifest (Delta `txnAppId`/`txnVersion` semantics). */
  private def readTxns(spark: SparkSession, tablePath: String,
                       v: Int): Map[String, Long] =
    readLines(spark, tablePath, v).collect {
      case l if l.startsWith("#txn\t") =>
        val Array(_, app, id) = l.split("\t", 3)
        app -> id.toLong
    }.toMap

  /** The latest transaction id committed by writer `app`, if any — the
    * streaming sink's restart question ("has this batch landed?"). */
  def txnVersion(spark: SparkSession, tablePath: String,
                 app: String): Option[Long] =
    versions(spark, tablePath).lastOption
      .flatMap(v => readTxns(spark, tablePath, v).get(app))

  private def readManifest(spark: SparkSession, tablePath: String,
                           v: Int): Seq[String] =
    dataLines(readLines(spark, tablePath, v)).map(l => parseEntry(l).path)

  /** The version's file entries with their stats (`version = None` →
    * head). */
  def entries(spark: SparkSession, tablePath: String,
              version: Option[Int] = None): Seq[FileEntry] = {
    val v = version.getOrElse {
      val vs = versions(spark, tablePath)
      require(vs.nonEmpty, s"no committed snapshots at $tablePath")
      vs.last
    }
    dataLines(readLines(spark, tablePath, v)).map(parseEntry)
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

  /** Run `body` under the table's commit lock (atomic-create file lock
    * with stale-holder recovery) — the serialization point every commit
    * flavor shares. `body` receives the filesystem and must itself read
    * the CURRENT head (versions may have advanced while waiting). */
  private def withCommitLock[T](spark: SparkSession, tablePath: String)(
      body: org.apache.hadoop.fs.FileSystem => T): T = {
    val f = fs(spark, manifestDir(tablePath))
    f.mkdirs(manifestDir(tablePath))
    val lock = new Path(manifestDir(tablePath), "_commit.lock")
    var attempts = 0
    while (attempts < 500) {
      attempts += 1
      if (tryLock(f, lock)) {
        try return body(f) finally f.delete(lock, false)
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

  /** Render one stats value as an exact decimal for the manifest.
    * Numerics keep full precision; dates become epoch days, timestamps
    * epoch millis. Unsupported types contribute no stats (never pruned —
    * conservative). */
  private def toBig(x: Any): Option[BigDecimal] = x match {
    case null => None
    case b: Byte => Some(BigDecimal(b.toInt))
    case s: Short => Some(BigDecimal(s.toInt))
    case i: Int => Some(BigDecimal(i))
    case l: Long => Some(BigDecimal(l))
    case f: Float => Some(BigDecimal(f.toDouble))
    case d: Double => Some(BigDecimal(d))
    case d: java.math.BigDecimal => Some(BigDecimal(d))
    case d: java.sql.Date => Some(BigDecimal(d.toLocalDate.toEpochDay))
    case d: java.time.LocalDate => Some(BigDecimal(d.toEpochDay))
    case t: java.sql.Timestamp => Some(BigDecimal(t.getTime))
    case t: java.time.Instant => Some(BigDecimal(t.toEpochMilli))
    case _ => None
  }

  /** Per-file min/max stats for `statsCols`, computed with ONE read-back
    * scan of the just-written commit directory grouped by
    * `input_file_name` (a real table format lifts these from the parquet
    * footers the writer already produced; the footer API isn't public in
    * this env, and the read-back touches only THIS commit's files, never
    * the table). Result is metadata-sized: one row per data file. */
  private def fileStats(spark: SparkSession, dataDir: Path,
                        statsCols: Seq[String])
      : Map[String, Map[String, (BigDecimal, BigDecimal)]] = {
    if (statsCols.isEmpty) return Map.empty
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val rows = spark.read.parquet(dataDir.toString)
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .toLocalIterator()
    val out = Map.newBuilder[String, Map[String, (BigDecimal, BigDecimal)]]
    rows.forEachRemaining { r =>
      val name = new Path(r.getString(0)).getName
      val stats = statsCols.zipWithIndex.flatMap { case (c, i) =>
        for {
          mn <- toBig(r.get(1 + 2 * i))
          mx <- toBig(r.get(2 + 2 * i))
        } yield c -> (mn, mx)
      }.toMap
      out += name -> stats
    }
    out.result()
  }

  /** Commit `df` as the next version. `replace = true` makes the new
    * manifest exactly this commit's files (overwrite semantics);
    * `replace = false` appends them to the current head's file set
    * (existing entries keep their stats verbatim). `statsCols` names
    * columns whose per-file min/max land in the manifest for
    * [[readPruned]] file skipping. Returns the committed version. Data
    * files are written ONCE, outside the lock; only the version
    * assignment and manifest publish — pure metadata — are serialized. */
  /** `txn = Some((app, id))` makes the commit IDEMPOTENT per writer
    * (Delta's `txnAppId`/`txnVersion`): if the head manifest already
    * records a transaction ≥ `id` for `app`, the commit is a no-op that
    * returns the head version and reclaims its staged files — the
    * exactly-once contract a restarted streaming foreachBatch needs
    * (the replayed batch must not append twice). The watermark rides IN
    * the manifest line set, so "txn recorded" and "data visible" are
    * one atomic rename — there is no crash window where one exists
    * without the other — and verbatim manifest copies (deleteWhere,
    * restore) carry it through maintenance commits. */
  /** `expectedHead = Some(v)` makes the commit CONDITIONAL (the
    * compare-and-swap every table format's REPLACE/OVERWRITE needs):
    * under the commit lock, if the head version is not exactly `v`
    * (0 = empty table), the staged files are reclaimed and
    * [[java.util.ConcurrentModificationException]] is thrown instead of
    * publishing — a maintenance rewrite derived from a snapshot read can
    * then never erase a commit that landed after that read; the caller
    * re-reads and retries. */
  def commit(spark: SparkSession, df: DataFrame, tablePath: String,
             replace: Boolean = true,
             statsCols: Seq[String] = Seq.empty,
             commitTime: Option[Long] = None,
             txn: Option[(String, Long)] = None,
             expectedHead: Option[Int] = None): Int = {
    require(statsCols.forall(c => !c.contains("\t") && !c.contains("=")),
      "stats column names must not contain tab or '='")
    require(txn.forall { case (app, _) =>
      !app.contains("\t") && !app.contains("\n") },
      "txn app id must not contain tab or newline")
    val commitId = java.util.UUID.randomUUID().toString
    // pre-flight the evolution check BEFORE writing data files so an
    // incompatible append fails without leaving an orphan data dir (the
    // authoritative check re-runs under the commit lock below)
    if (!replace) versions(spark, tablePath).lastOption.foreach { h =>
      tableSchema(spark, tablePath, Some(h))
        .foreach(old => evolve(old, asNullable(df.schema)))
    }
    val dataDir = new Path(new Path(tablePath, "data"), commitId)
    df.write.parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val stats = fileStats(spark, dataDir, statsCols)
    val newFiles = f.listStatus(dataDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => renderEntry(FileEntry(s"data/$commitId/${p.getName}",
        stats.getOrElse(p.getName, Map.empty))))
    withCommitLock(spark, tablePath) { f =>
      val head = versions(spark, tablePath).lastOption
      expectedHead.foreach { e =>
        if (head.getOrElse(0) != e) {
          f.delete(dataDir, true) // reclaim staged files before failing
          throw new java.util.ConcurrentModificationException(
            s"conditional commit at $tablePath expected head v$e but " +
              s"found v${head.getOrElse(0)} — a commit landed after the " +
              "caller's snapshot read; re-read and retry")
        }
      }
      val headTxns = head.map(readTxns(spark, tablePath, _))
        .getOrElse(Map.empty[String, Long])
      val replayed = txn.exists { case (app, id) =>
        headTxns.get(app).exists(_ >= id) }
      if (replayed) {
        // already applied (a restarted writer re-offering an old batch):
        // reclaim the staged files, leave the table untouched
        f.delete(dataDir, true)
        head.get
      } else {
      val base =
        if (replace) Seq.empty
        else head.map(l => dataLines(readLines(spark, tablePath, l)))
          .getOrElse(Seq.empty)
      val txnLines = (headTxns ++ txn).toSeq.sortBy(_._1)
        .map { case (a, i) => s"#txn\t$a\t$i" }
      val v = head.getOrElse(0) + 1
      // version schema: replace takes the frame's schema; append
      // evolves the prior version's recorded schema (falling back to
      // one footer-inferred read for pre-tracking tables)
      val schema =
        if (replace || base.isEmpty) asNullable(df.schema)
        else {
          val old = tableSchema(spark, tablePath, head)
            .getOrElse(asNullable(spark.read.parquet(
              base.map(l => new Path(tablePath,
                parseEntry(l).path).toString): _*).schema))
          evolve(old, asNullable(df.schema))
        }
      // schema sidecar FIRST: a manifest must never be visible
      // without its schema (readers discover versions by manifest)
      val so = f.create(schemaPath(tablePath, v), true)
      try so.write(schema.json.getBytes("UTF-8")) finally so.close()
      val tmp = new Path(manifestDir(tablePath), s".tmp-$commitId-$v")
      val out = f.create(tmp, false)
      try out.write((txnLines ++ base ++ newFiles)
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
      // commit-time sidecar BEFORE the manifest publish: a version must
      // never be visible without its place on the time axis (mirrors the
      // schema-sidecar-first rule above)
      commitTime.foreach { t =>
        val to = f.create(timePath(tablePath, v), true)
        try to.write(t.toString.getBytes("UTF-8")) finally to.close()
      }
      // under the lock the destination cannot exist; rename gives
      // readers atomic manifest visibility
      require(f.rename(tmp, manifestPath(tablePath, v)),
        s"manifest publish failed for v$v at $tablePath")
      v
      }
    }
  }

  /** The logical commit time recorded for `version`, if any. */
  def commitTimeOf(spark: SparkSession, tablePath: String,
                   version: Int): Option[Long] = {
    val p = timePath(tablePath, version)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(
        in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** TIMESTAMP AS OF time travel (Delta `TIMESTAMP AS OF` / Iceberg
    * snapshot-at-timestamp): the latest version whose recorded commit
    * time is ≤ `ts`. Commit times are LOGICAL longs supplied at commit —
    * not wall clock — so replays and tests are deterministic; a real
    * deployment passes its event-time watermark or ingest batch time.
    * Versions committed without a time have no place on the time axis
    * and are skipped (they remain readable by version/ref). Fails
    * loudly when nothing precedes `ts`, and — via [[read]] — when the
    * resolved version has been vacuumed. */
  def readAsOfTime(spark: SparkSession, tablePath: String,
                   ts: Long): DataFrame = {
    val timed = versions(spark, tablePath)
      .flatMap(v => commitTimeOf(spark, tablePath, v).map(v -> _))
    require(timed.nonEmpty,
      s"no time-annotated snapshots at $tablePath")
    val at = timed.filter(_._2 <= ts)
    require(at.nonEmpty,
      s"no snapshot at or before t=$ts at $tablePath " +
        s"(earliest is t=${timed.map(_._2).min})")
    // ties on the logical time resolve to the later version (the
    // deterministic "latest wins" a reader expects)
    read(spark, tablePath, Some(at.maxBy { case (v, t) => (t, v) }._1))
  }

  /** Read a pinned snapshot (`version = None` → current head) at FILE
    * level — delete vectors are NOT applied (use [[readMor]] on tables
    * that take merge-on-read deletes; on DV-free tables the two are
    * identical). The
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
    // apply the version's RECORDED schema (schema evolution: files
    // predating an added column read it as null; no footer merging)
    tableSchema(spark, tablePath, Some(v))
      .fold(spark.read)(spark.read.schema)
      .parquet(files: _*)
  }

  /** Manifest-stats file pruning: read only the files whose recorded
    * [lower, upper] range on `colName` can intersect the requested one —
    * the scan-skipping a 100 TB table lives by (a day-range query over a
    * year of files schedules tasks for the asked-for days only, decided
    * from manifest metadata before any I/O). Files without stats for
    * `colName` are always kept (conservative), so the pruned read +
    * the caller's row-level filter is ALWAYS equivalent to the full
    * read + filter. `None` bounds are open. Date columns compare as
    * epoch days, timestamps as epoch millis (the [[toBig]] encoding). */
  def readPruned(spark: SparkSession, tablePath: String, colName: String,
                 lower: Option[BigDecimal], upper: Option[BigDecimal],
                 version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse {
      val vs = versions(spark, tablePath)
      require(vs.nonEmpty, s"no committed snapshots at $tablePath")
      vs.last
    }
    val kept = entries(spark, tablePath, Some(v)).filter { e =>
      e.stats.get(colName) match {
        case None => true
        case Some((mn, mx)) =>
          lower.forall(lo => mx >= lo) && upper.forall(hi => mn <= hi)
      }
    }
    if (kept.isEmpty) {
      // every file pruned: preserve the schema via an empty frame over
      // the full file set
      read(spark, tablePath, Some(v)).limit(0)
    } else {
      tableSchema(spark, tablePath, Some(v))
        .fold(spark.read)(spark.read.schema)
        .parquet(kept.map(e => new Path(tablePath, e.path).toString): _*)
    }
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
  /** Bounded retry around a conditional (expectedHead) commit: every
    * read-modify-write maintenance writer publishes through this so a
    * commit landing between its snapshot read and its publish is NEVER
    * silently erased — the CAS fails, the body re-reads the new head and
    * re-derives. A short randomized pause between attempts keeps a steady
    * writer stream from burning all attempts back-to-back (the work per
    * attempt is a re-derivation, but the contention window is
    * metadata-sized). After `maxAttempts` CAS failures the contention
    * (a writer storm) is surfaced, not absorbed. Package-visible: every
    * snapshot-derived writer — including [[ModelRegistry]]'s GC — shares
    * this one retry policy instead of growing drift-prone copies. */
  private[operators] def retryCas[A](maxAttempts: Int = 5)(body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          Thread.sleep(50L + scala.util.Random.nextInt(150))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def compactSnapshot(spark: SparkSession, tablePath: String,
                      targetBytes: Long = 128L * 1024 * 1024,
                      onBeforePublish: () => Unit = () => ()): Int =
    // CAS, like every writer whose output is DERIVED from a snapshot
    // read: a replace commit published unconditionally would erase any
    // commit that landed between this compaction's read and its publish.
    // On CAS failure the rewrite re-reads and re-runs (compaction is
    // idempotent maintenance — repeating it is safe and cheap relative
    // to losing a data commit).
    retryCas() {
      val head = versions(spark, tablePath).lastOption
        .getOrElse(throw new IllegalArgumentException(
          s"no committed snapshots at $tablePath"))
      val f = fs(spark, new Path(tablePath))
      val totalBytes = readManifest(spark, tablePath, head)
        .map(rel => f.getFileStatus(new Path(tablePath, rel)).getLen).sum
      val nFiles = math.max(1, math.ceil(
        totalBytes.toDouble / targetBytes).toInt)
      // readMor, not read: compaction must FOLD delete vectors into the
      // rewritten data (a DV-blind rewrite would resurrect deleted rows —
      // the new files are outside every old DV's scope). On a DV-free
      // table readMor ≡ read.
      val rewritten = readMor(spark, tablePath, Some(head))
        .repartition(nFiles)
      onBeforePublish()
      commit(spark, rewritten, tablePath, replace = true,
        expectedHead = Some(head))
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
                     orderCol: String,
                     onBeforePublish: () => Unit = () => ()): Int = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val deduped = source.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // conditional publish (CAS + bounded retry): the merged frame is
    // derived from a snapshot read, so a commit landing between that
    // read and the publish must fail the CAS and force a re-merge —
    // never be silently replaced (the lost-update window the format's
    // expectedHead exists to close). `onBeforePublish` is a test seam:
    // specs inject an interleaved commit there to prove the retry path.
    retryCas() {
      val head = versions(spark, tablePath).lastOption
      val merged = head match {
        case None => deduped
        case Some(v) =>
          // readMor: the merge base must honor delete vectors, or the
          // rewrite would resurrect deleted rows (see compactSnapshot)
          readMor(spark, tablePath, Some(v))
            .join(deduped.select(keyCols.map(col): _*), keyCols,
              "left_anti")
            .unionByName(deduped)
      }
      onBeforePublish()
      commit(spark, merged, tablePath, replace = true,
        expectedHead = Some(head.getOrElse(0)))
    }
  }

  /** The three-clause MERGE (Delta `WHEN MATCHED UPDATE / WHEN NOT
    * MATCHED INSERT / WHEN NOT MATCHED BY SOURCE DELETE`): the source
    * declares itself the complete truth for the rows satisfying `scope`,
    * so target rows IN scope that the source no longer carries are
    * DELETED, matched keys take the source row (anywhere), and new keys
    * insert — one atomic commit.
    *
    * `scope` bounds the delete clause the way every production
    * full-sync does (Delta's `notMatchedBySource.delete(condition)`):
    * an UNSCOPED not-matched-by-source delete turns every incremental
    * sync into a full-table truncate-load — any row the batch didn't
    * mention would vanish. At 100 TB the `!scope` keep-filter and the
    * key anti-join are one scan of the current snapshot; untouched
    * rows are rewritten only at file granularity (the same
    * copy-on-write cost upsertSnapshot pays).
    */
  def fullSync(spark: SparkSession, source: DataFrame, tablePath: String,
               keyCols: Seq[String], orderCol: String,
               scope: org.apache.spark.sql.Column,
               onBeforePublish: () => Unit = () => ()): Int = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val deduped = source.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // same CAS discipline as upsertSnapshot: the merge base is a
    // snapshot read, so publish conditionally and re-merge on contention
    retryCas() {
      val head = versions(spark, tablePath).lastOption
      val merged = head match {
        case None => deduped
        case Some(v) =>
          // in-scope survivors must come from the source alone; out-of-
          // scope rows survive unless the source updates their key
          readMor(spark, tablePath, Some(v))
            .filter(!scope)
            .join(deduped.select(keyCols.map(col): _*), keyCols,
              "left_anti")
            .unionByName(deduped)
      }
      onBeforePublish()
      commit(spark, merged, tablePath, replace = true,
        expectedHead = Some(head.getOrElse(0)))
    }
  }

  /** Drop manifests older than `keepFrom` and delete every data file no
    * surviving manifest references. Readers pinned at ≥ keepFrom are
    * unaffected; reads of expired versions fail loudly (the retention
    * contract every table format has). Returns deleted data-file count. */
  def vacuum(spark: SparkSession, tablePath: String, keepFrom: Int): Int = {
    val all = versions(spark, tablePath)
    // TAG retention (Iceberg tag semantics): a version named by any ref
    // is immune to expiry regardless of the retention horizon — tags
    // exist precisely to pin audited/baseline snapshots past it.
    val pinned = refs(spark, tablePath).values.toSet
    val (expired, kept) = all.partition(v =>
      v < keepFrom && !pinned.contains(v))
    require(kept.nonEmpty, s"vacuum would delete every snapshot " +
      s"(keepFrom=$keepFrom, versions=${all.mkString(",")})")
    val keepFiles = kept.flatMap(readManifest(spark, tablePath, _)).toSet
    val f = fs(spark, new Path(tablePath))
    // ownership guard: a manifest entry may reference a file OUTSIDE
    // this table (a shallow clone borrows the source's files by
    // absolute path) — vacuum only ever reclaims files under its own
    // root; borrowed files belong to their owner's retention
    val root = f.makeQualified(new Path(tablePath)).toString
    def owned(p: Path): Boolean =
      f.makeQualified(p).toString.startsWith(root + "/")
    var deleted = 0
    expired.foreach { v =>
      readManifest(spark, tablePath, v).foreach { rel =>
        val p = new Path(tablePath, rel)
        if (!keepFiles.contains(rel) && owned(p) &&
            f.delete(p, false)) deleted += 1
      }
      f.delete(manifestPath(tablePath, v), false)
      f.delete(schemaPath(tablePath, v), false)
    }
    deleted
  }

  private def refPath(tablePath: String, name: String) = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"invalid ref name: $name")
    new Path(manifestDir(tablePath), s"ref-$name")
  }

  /** Named refs (Iceberg TAGS): name → pinned version. A tag survives
    * later commits AND [[vacuum]] (tagged versions never expire), so
    * "the audited baseline" or "what the Q3 model trained on" stays
    * addressable forever. Stored one tiny file per ref under the
    * manifest dir; moves serialize on the commit lock. */
  def refs(spark: SparkSession, tablePath: String): Map[String, Int] = {
    val dir = manifestDir(tablePath)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Map.empty
    f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("ref-") => n.stripPrefix("ref-") }
      .map { name =>
        val in = f.open(refPath(tablePath, name))
        val v =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        name -> v.toInt
      }.toMap
  }

  /** Create or move a ref to `version` (must be committed). */
  def setRef(spark: SparkSession, tablePath: String, name: String,
             version: Int): Unit =
    withCommitLock(spark, tablePath) { f =>
      require(versions(spark, tablePath).contains(version),
        s"ref '$name' target v$version not committed at $tablePath")
      val out = f.create(refPath(tablePath, name), true)
      try out.write(version.toString.getBytes("UTF-8"))
      finally out.close()
    }

  /** Drop a ref (the version becomes expirable again). */
  def dropRef(spark: SparkSession, tablePath: String, name: String): Unit =
    withCommitLock(spark, tablePath) { f =>
      f.delete(refPath(tablePath, name), false); ()
    }

  /** Merge-on-read view of the version a ref names. */
  def readRef(spark: SparkSession, tablePath: String,
              name: String): DataFrame = {
    val v = refs(spark, tablePath).getOrElse(name,
      throw new IllegalArgumentException(
        s"no ref '$name' at $tablePath"))
    readMor(spark, tablePath, Some(v))
  }

  /** Incremental append scan (the Delta/Iceberg incremental-read that
    * feeds streaming sources and downstream syncs): read ONLY the data
    * files added between `sinceVersion` (exclusive) and `toVersion`
    * (inclusive, head when `None`). Cost is proportional to the NEW data,
    * never the table — the manifest set-difference decides the file list
    * before any I/O, so tailing a 100 TB table costs the appended bytes.
    *
    * Valid only over an append-only chain: if any file of `sinceVersion`
    * is gone from `toVersion` (a replace, upsert rewrite, or compaction
    * intervened), file-level incremental semantics don't exist and the
    * call fails loudly — use [[read]] + a data-level diff (u5) there. */
  def readAppendsSince(spark: SparkSession, tablePath: String,
                       sinceVersion: Int,
                       toVersion: Option[Int] = None): DataFrame = {
    val to = toVersion.getOrElse {
      val vs = versions(spark, tablePath)
      require(vs.nonEmpty, s"no committed snapshots at $tablePath")
      vs.last
    }
    val oldFiles = readManifest(spark, tablePath, sinceVersion).toSet
    val newFiles = readManifest(spark, tablePath, to)
    val missing = oldFiles -- newFiles.toSet
    require(missing.isEmpty,
      s"not an append-only chain: v$sinceVersion file(s) " +
        s"${missing.take(3).mkString(", ")}… were rewritten before v$to; " +
        "file-level incremental read is undefined — use a snapshot diff")
    val added = newFiles.filterNot(oldFiles.contains)
    if (added.isEmpty) read(spark, tablePath, Some(to)).limit(0)
    else tableSchema(spark, tablePath, Some(to))
      .fold(spark.read)(spark.read.schema)
      .parquet(added.map(rel => new Path(tablePath, rel).toString): _*)
  }

  /** Orphan GC (Iceberg `remove_orphan_files`): delete data files under
    * `data/` that NO manifest references and whose commit dir is older
    * than `olderThanMs` — the debris of crashed writers (data written,
    * manifest never published). The age horizon is the safety contract:
    * an in-flight commit's files are always younger than it, so a
    * concurrent writer can never lose data to the GC. Returns deleted
    * file count. Like [[vacuum]], this is manifest-sized metadata work
    * plus deletes — no data bytes are read. */
  def removeOrphans(spark: SparkSession, tablePath: String,
                    olderThanMs: Long = 24L * 3600 * 1000): Int = {
    val f = fs(spark, new Path(tablePath))
    val dataRoot = new Path(tablePath, "data")
    if (!f.exists(dataRoot)) return 0
    val referenced = versions(spark, tablePath)
      .flatMap(readManifest(spark, tablePath, _)).toSet
    val horizon = System.currentTimeMillis() - olderThanMs
    var deleted = 0
    // commit-dir granularity: a writer produces exactly one dir per
    // attempt, so a dir with NO referenced file is crash debris as a unit
    // (markers like _SUCCESS included); a dir with any referenced file is
    // live and left whole
    f.listStatus(dataRoot).foreach { dir =>
      if (dir.isDirectory && dir.getModificationTime < horizon) {
        val files = f.listStatus(dir.getPath).map(_.getPath.getName)
        val anyRef = files.exists(n =>
          referenced.contains(s"data/${dir.getPath.getName}/$n"))
        if (!anyRef) {
          deleted += files.count(_.endsWith(".parquet"))
          f.delete(dir.getPath, true)
        }
      }
    }
    deleted
  }

  /** One committed delete vector: the key column, where its key file
    * lives, and the exact data files it applies to (the files present
    * when the delete committed — Iceberg's sequence-number scoping at
    * file granularity, so a later re-insert of a deleted key is NOT
    * hidden by an older delete). */
  final case class DeleteVector(version: Int, keyCol: String,
                                dir: String, appliesTo: Set[String])

  /** All delete vectors of the table, discovered by sidecar listing —
    * deliberately NOT via [[versions]]: a vacuumed manifest's delete
    * vector must keep applying to files that carried forward into
    * retained versions. */
  def deleteVectors(spark: SparkSession,
                    tablePath: String): Seq[DeleteVector] = {
    val dir = manifestDir(tablePath)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".deletes") =>
        n.stripPrefix("v").stripSuffix(".deletes").toInt }
      .sorted
      .map { v =>
        val p = dvPath(tablePath, v)
        val in = f.open(p)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().filter(_.nonEmpty).toList
          finally in.close()
        val Array(keyCol, rel) = lines.head.split("\t", 2)
        DeleteVector(v, keyCol, rel, lines.tail.toSet)
      }
  }

  /** Equality-delete commit — MERGE-ON-READ row deletion (Iceberg v2
    * delete files / Delta deletion vectors): instead of rewriting every
    * data file containing a matching row (the copy-on-write `pl11` path —
    * proportional to the DATA touched), commit a small KEY FILE plus a
    * metadata pointer; readers subtract it at scan time. Deleting 0.1%
    * of a 100 TB table costs the matched keys' bytes, not a rewrite.
    *
    * The delete is scoped to the data files present at commit time (the
    * sidecar records them), so appends AFTER the delete — including
    * re-inserts of deleted keys — are untouched. Keys are computed from
    * the current merge-on-read view, so deleting an already-deleted key
    * is a no-op. The new version's manifest carries the SAME data-file
    * lines as its base: time travel to the pre-delete version still sees
    * every row, and [[readAppendsSince]] still sees an append-only chain.
    *
    * Retention: DV sidecars and key files survive [[vacuum]] (a carried-
    * forward file may still need an old DV); a compaction rewrite
    * (read-back via [[readMor]], commit replace) folds deletes into data
    * and strands the old DVs against files no manifest references —
    * harmless, and GC-able with the expired manifests. */
  def deleteWhere(spark: SparkSession, tablePath: String, keyCol: String,
                  predicate: org.apache.spark.sql.Column): Int = {
    val vs = versions(spark, tablePath)
    require(vs.nonEmpty, s"no committed snapshots at $tablePath")
    val commitId = java.util.UUID.randomUUID().toString
    val dvDir = new Path(new Path(tablePath, "deletes"), commitId)
    readMor(spark, tablePath, Some(vs.last)).filter(predicate)
      .select(keyCol).distinct().write.parquet(dvDir.toString)
    withCommitLock(spark, tablePath) { f =>
      val head = versions(spark, tablePath).last
      val base = readLines(spark, tablePath, head)
      val v = head + 1
      tableSchema(spark, tablePath, Some(head)).foreach { sch =>
        val so = f.create(schemaPath(tablePath, v), true)
        try so.write(sch.json.getBytes("UTF-8")) finally so.close()
      }
      // DV sidecar BEFORE the manifest: a reader that can see v's
      // manifest must be able to see v's deletes
      val dp = f.create(dvPath(tablePath, v), true)
      try dp.write(
        (s"$keyCol\tdeletes/$commitId" +:
          dataLines(base).map(l => parseEntry(l).path))
          .mkString("\n").getBytes("UTF-8"))
      finally dp.close()
      val tmp = new Path(manifestDir(tablePath), s".tmp-$commitId-$v")
      val out = f.create(tmp, false)
      try out.write(base.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      require(f.rename(tmp, manifestPath(tablePath, v)),
        s"manifest publish failed for v$v at $tablePath")
      v
    }
  }

  /** WRITE–AUDIT–PUBLISH commit (the Iceberg WAP pattern): stage the
    * data files, run the caller's audit on a read-back of EXACTLY the
    * staged files (catching writer bugs, not just bad input frames), and
    * only then publish the manifest. A failing audit deletes the staged
    * files and leaves the table at its prior version — readers can never
    * observe unaudited data because visibility IS the manifest, and a
    * crash between stage and publish leaves only orphan files that
    * [[removeOrphans]] reclaims. Replace semantics (the curated-publish
    * use case). Returns Right(version) or Left(auditError). */
  def commitAudited(spark: SparkSession, df: DataFrame, tablePath: String,
                    audit: DataFrame => Option[String],
                    statsCols: Seq[String] = Seq.empty)
      : Either[String, Int] = {
    require(statsCols.forall(c => !c.contains("\t") && !c.contains("=")),
      "stats column names must not contain tab or '='")
    val commitId = java.util.UUID.randomUUID().toString
    val dataDir = new Path(new Path(tablePath, "data"), commitId)
    df.write.parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val staged = spark.read.schema(asNullable(df.schema))
      .parquet(dataDir.toString)
    audit(staged) match {
      case Some(err) =>
        f.delete(dataDir, true)
        Left(err)
      case None =>
        val stats = fileStats(spark, dataDir, statsCols)
        val newFiles = f.listStatus(dataDir).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
          .map(p => renderEntry(FileEntry(s"data/$commitId/${p.getName}",
            stats.getOrElse(p.getName, Map.empty))))
        Right(withCommitLock(spark, tablePath) { ff =>
          val head = versions(spark, tablePath).lastOption
          val v = head.getOrElse(0) + 1
          // carry the head's per-writer txn watermarks: a WAP publish
          // replaces the DATA, not the writers' exactly-once history —
          // dropping the #txn lines here would let a replayed streaming
          // batch re-apply after any audited publish (commit() and
          // deleteWhere already carry them; this path must too)
          val txnLines = head.map(readTxns(spark, tablePath, _))
            .getOrElse(Map.empty[String, Long]).toSeq.sortBy(_._1)
            .map { case (a, i) => s"#txn\t$a\t$i" }
          val so = ff.create(schemaPath(tablePath, v), true)
          try so.write(asNullable(df.schema).json.getBytes("UTF-8"))
          finally so.close()
          val tmp = new Path(manifestDir(tablePath), s".tmp-$commitId-$v")
          val out = ff.create(tmp, false)
          try out.write((txnLines ++ newFiles).mkString("\n")
            .getBytes("UTF-8"))
          finally out.close()
          require(ff.rename(tmp, manifestPath(tablePath, v)),
            s"manifest publish failed for v$v at $tablePath")
          v
        })
    }
  }

  /** Roll the table back to `toVersion` as a NEW commit (Delta RESTORE /
    * Iceberg rollback-to-snapshot): the restored state is exactly
    * `readMor(toVersion)`, history is PRESERVED (every prior version —
    * including the ones being undone — stays time-travel readable; the
    * restore is itself one more manifest), and the cost is metadata-only
    * unless a post-`toVersion` delete vector touches the target's files.
    *
    * Delete-vector interaction (the subtle part): vectors apply by
    * `dv.version <= readVersion` over recorded file paths, so a DV
    * committed AFTER `toVersion` would wrongly subtract rows from a
    * restored head that re-references the same paths. Files touched by
    * such a vector are therefore REWRITTEN with their as-of-`toVersion`
    * content (raw bytes minus DVs ≤ `toVersion` — folded in, since old
    * vectors reference the old paths and cannot follow); untouched files
    * carry over BY REFERENCE with their manifest stats verbatim. Restore
    * cost is proportional to the post-target-deleted file set, never the
    * table.
    *
    * Deliberately NOT a conditional (CAS) commit, unlike the derived
    * maintenance writers (upsertSnapshot/fullSync/compactSnapshot):
    * restore's contract is "make the head equal v`toVersion`" — a commit
    * that lands mid-restore is post-dated data the operator asked to
    * roll past, and it stays time-travel readable like everything else
    * restore undoes. Only the per-writer txn watermarks merge against
    * the TRUE head (under the lock) so idempotent writers never rewind. */
  def restoreSnapshot(spark: SparkSession, tablePath: String,
                      toVersion: Int): Int = {
    val vs = versions(spark, tablePath)
    require(vs.contains(toVersion),
      s"restore target v$toVersion not committed at $tablePath")
    val tLines = readLines(spark, tablePath, toVersion)
    val allDvs = deleteVectors(spark, tablePath)
    val postDvs = allDvs.filter(_.version > toVersion)
    val affected = dataLines(tLines).map(l => parseEntry(l).path)
      .filter(rel => postDvs.exists(_.appliesTo.contains(rel))).toSet
    val commitId = java.util.UUID.randomUUID().toString
    val f = fs(spark, new Path(tablePath))
    val newFileLines: Seq[String] =
      if (affected.isEmpty) Seq.empty
      else {
        val priorDvs = allDvs.filter(_.version <= toVersion)
        val reader = tableSchema(spark, tablePath, Some(toVersion))
          .fold(spark.read)(spark.read.schema)
        val df = affected.groupBy(rel =>
            priorDvs.filter(_.appliesTo.contains(rel)).map(_.version))
          .map { case (dvVersions, group) =>
            val base = reader.parquet(
              group.map(rel => new Path(tablePath, rel).toString).toSeq: _*)
            priorDvs.filter(dv => dvVersions.contains(dv.version))
              .groupBy(_.keyCol).toSeq.sortBy(_._1)
              .foldLeft(base) { case (acc, (kc, ds)) =>
                val keys = ds.map(dd => spark.read.parquet(
                    new Path(tablePath, dd.dir).toString))
                  .reduce(_ unionByName _).distinct()
                acc.join(keys, Seq(kc), "left_anti")
              }
          }
          .reduce(_ unionByName _)
        val dataDir = new Path(new Path(tablePath, "data"), commitId)
        df.write.parquet(dataDir.toString)
        f.listStatus(dataDir).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
          .map(p => renderEntry(FileEntry(s"data/$commitId/${p.getName}",
            Map.empty)))
      }
    // DATA restores to the as-of state, but per-writer txn watermarks do
    // NOT rewind: Delta RESTORE preserves current SetTransaction state so
    // an in-flight idempotent streaming writer is not double-applied —
    // carrying the as-of values verbatim would let a replayed batch whose
    // id exceeds the rewound watermark re-append. Merge = max(head, as-of)
    // per app, computed under the commit lock against the true head.
    val carriedData = tLines.filter(l =>
      (l.startsWith("#") && !l.startsWith("#txn\t")) ||
      (!l.startsWith("#") && !affected.contains(parseEntry(l).path)))
    val asOfTxns = readTxns(spark, tablePath, toVersion)
    withCommitLock(spark, tablePath) { f =>
      val head = versions(spark, tablePath).last
      val headTxns = readTxns(spark, tablePath, head)
      val mergedTxns = (asOfTxns.keySet ++ headTxns.keySet).toSeq.sorted
        .map(a => s"#txn\t$a\t${math.max(asOfTxns.getOrElse(a, Long.MinValue),
          headTxns.getOrElse(a, Long.MinValue))}")
      val carried = mergedTxns ++ carriedData
      val v = head + 1
      tableSchema(spark, tablePath, Some(toVersion)).foreach { sch =>
        val so = f.create(schemaPath(tablePath, v), true)
        try so.write(sch.json.getBytes("UTF-8")) finally so.close()
      }
      val tmp = new Path(manifestDir(tablePath), s".tmp-$commitId-$v")
      val out = f.create(tmp, false)
      try out.write((carried ++ newFileLines).mkString("\n")
        .getBytes("UTF-8"))
      finally out.close()
      require(f.rename(tmp, manifestPath(tablePath, v)),
        s"manifest publish failed for v$v at $tablePath")
      v
    }
  }

  /** Merge-on-read snapshot read: the pinned file set of `version` minus
    * every applicable delete vector. Files are grouped by WHICH deletes
    * apply to them (group count is bounded by the distinct append/delete
    * interleavings, not by data size), each group anti-joins its keys on
    * the key column, and the groups union back — so the subtraction is
    * one broadcast-able anti-join per key column over each group, never
    * a rewrite. A table with no delete vectors reads identically to
    * [[read]]. */
  def readMor(spark: SparkSession, tablePath: String,
              version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse {
      val vs = versions(spark, tablePath)
      require(vs.nonEmpty, s"no committed snapshots at $tablePath")
      vs.last
    }
    val dvs = deleteVectors(spark, tablePath).filter(_.version <= v)
    if (dvs.isEmpty) return read(spark, tablePath, Some(v))
    val files = readManifest(spark, tablePath, v)
    val reader = tableSchema(spark, tablePath, Some(v))
      .fold(spark.read)(spark.read.schema)
    files.groupBy(rel => dvs.filter(_.appliesTo.contains(rel))
        .map(_.version))
      .map { case (dvVersions, group) =>
        val df = reader.parquet(
          group.map(rel => new Path(tablePath, rel).toString): _*)
        dvs.filter(dv => dvVersions.contains(dv.version))
          .groupBy(_.keyCol).toSeq.sortBy(_._1)
          .foldLeft(df) { case (acc, (kc, ds)) =>
            val keys = ds.map(dd => spark.read.parquet(
                new Path(tablePath, dd.dir).toString))
              .reduce(_ unionByName _).distinct()
            acc.join(keys, Seq(kc), "left_anti")
          }
      }
      .reduce(_ unionByName _)
  }

  /** The `table$history` metadata table (Iceberg/Delta introspection
    * surface): one row per committed version — version, data-file
    * count, whether merge-on-read deletes apply, and the min/max of
    * `statsCol` aggregated over the version's FILE STATS. Built purely
    * from manifests and sidecars: no data file is ever opened, which is
    * the entire point at 100 TB (a table's operational audit — growth,
    * delete debt, value domain — costs manifest bytes). Note the
    * deliberately honest semantics the file stats carry: they are upper
    * bounds over the PHYSICAL rows, so a MOR delete never tightens
    * them — has_deletes tells the reader the live domain may be
    * narrower. */
  def history(spark: SparkSession, tablePath: String,
              statsCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType, LongType, StructField,
      StructType}
    val dvs = deleteVectors(spark, tablePath)
    val rows = versions(spark, tablePath).map { v =>
      val es = entries(spark, tablePath, Some(v))
      val rels = es.map(_.path).toSet
      val hasDel = dvs.exists(dv =>
        dv.version <= v && dv.appliesTo.exists(rels.contains))
      val bounds = es.flatMap(_.stats.get(statsCol))
      def side(f: Seq[BigDecimal] => BigDecimal, sel: ((BigDecimal,
          BigDecimal)) => BigDecimal): Any =
        if (bounds.isEmpty) null
        else java.lang.Long.valueOf(f(bounds.map(sel)).toLong)
      Row(v.toLong, es.size.toLong, hasDel,
        side(_.min, _._1), side(_.max, _._2))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false),
        StructField("has_deletes", BooleanType, nullable = false),
        StructField(s"${statsCol}_min", LongType, nullable = true),
        StructField(s"${statsCol}_max", LongType, nullable = true))))
  }

  /** SHALLOW CLONE (Delta `CLONE`, Iceberg snapshot-ref tables): a new
    * table whose v1 manifest references the SOURCE's data files by
    * absolute path — zero data copied, metadata-only cost — after which
    * the clone commits, deletes, and compacts independently (its new
    * data lands under its own path; the shared files are immutable by
    * the format's own contract). The clone's vacuum can never delete
    * source files (it only reclaims files under the clone's path), but
    * the SOURCE's vacuum does not know about clones — the documented
    * Delta shallow-clone caveat, so clone from versions the source's
    * retention keeps.
    *
    * Requires a head free of outstanding delete vectors (run
    * [[compactSnapshot]] first to fold them) — a DV sidecar is keyed to
    * one version's file set and cannot be renumbered into the clone's
    * history safely. */
  def cloneSnapshot(spark: SparkSession, srcPath: String,
                    dstPath: String): Int = {
    val head = versions(spark, srcPath).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshots at $srcPath"))
    val es = entries(spark, srcPath, Some(head))
    val rels = es.map(_.path).toSet
    require(!deleteVectors(spark, srcPath).exists(dv =>
        dv.version <= head && dv.appliesTo.exists(rels.contains)),
      s"cloneSnapshot: $srcPath head carries merge-on-read deletes — " +
        "compactSnapshot first")
    val abs = es.map(e =>
      e.copy(path = new Path(srcPath, e.path).toString))
    val f = fs(spark, new Path(dstPath))
    f.mkdirs(manifestDir(dstPath))
    tableSchema(spark, srcPath, Some(head)).foreach { sch =>
      val so = f.create(schemaPath(dstPath, 1), true)
      try so.write(sch.json.getBytes("UTF-8")) finally so.close()
    }
    val out = f.create(manifestPath(dstPath, 1), false)
    try out.write(abs.map(renderEntry).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    1
  }
}
