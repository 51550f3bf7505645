package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the OPTIMIZE/bin-packing maintenance pass every
  * lakehouse table needs (reference analog: the notebook pipelines rewrite
  * whole tables each run; a production lakehouse compacts instead).
  * Streaming sinks and incremental MERGEs (S9/S10/§2.9) accrete many small
  * files; scan cost then goes per-FILE (open + footer + seek), not
  * per-byte — the classic silent killer of a 100 TB table's read path.
  *
  * Mechanics: size the output by BYTES (ceil(totalBytes / targetBytes)
  * output files — never a guessed constant), rewrite via round-robin
  * repartition (even file sizes, no skew from the existing layout), then
  * atomically swap directories. Content is byte-preserved (spec-proven
  * set-equal); only the file layout changes. On a real object store the
  * swap is a transaction-log commit (Delta/Iceberg rewrite-files action)
  * instead of a directory rename — jars for those formats are absent in
  * this environment (round-2 finding), so the parquet-directory form is
  * the honest local equivalent.
  *
  * Partitioned tables compact per partition directory (pass each
  * partition's path) — compaction must never move rows across partition
  * boundaries or it breaks pruning.
  */
object Compaction {

  final case class Report(filesBefore: Int, filesAfter: Int,
                          bytes: Long, targetBytes: Long)

  private def dataFiles(dir: java.io.File): Array[java.io.File] = {
    val fs = dir.listFiles()
    require(fs != null, s"Compaction: cannot list ${dir.getPath}")
    fs.filter(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  /** Rewrite the parquet directory at `path` into ceil(bytes/targetBytes)
    * files. Returns the before/after accounting. */
  def compact(s: SparkSession, path: String, targetBytes: Long): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dir = new java.io.File(path)
    val before = dataFiles(dir)
    val bytes = before.map(_.length()).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new java.io.File(path + ".compact.tmp")
    val old = new java.io.File(path + ".compact.old")
    s.read.parquet(path)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.getPath)
    // swap: current → .old, tmp → current, drop .old. Readers between the
    // two renames would miss the table — the window a real table format
    // closes with its commit log; acceptable for a maintenance op on a
    // directory-backed local table. If the SECOND rename fails, roll the
    // first back (old → current) so the table is never left missing with
    // its data stranded in .compact.old; should even the rollback fail
    // (process death between renames), .compact.old still holds the intact
    // original — the documented manual-recovery location.
    org.apache.commons.io.FileUtils.deleteQuietly(old)
    require(dir.renameTo(old), s"Compaction: cannot stage $path aside")
    if (!tmp.renameTo(dir)) {
      val rolledBack = old.renameTo(dir)
      throw new IllegalStateException(
        s"Compaction: swap-in of compacted data failed for $path; " +
        (if (rolledBack) "original directory restored"
         else s"ROLLBACK ALSO FAILED — recover manually from ${old.getPath}"))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(old)
    Report(before.length, dataFiles(dir).length, bytes, targetBytes)
  }
}
