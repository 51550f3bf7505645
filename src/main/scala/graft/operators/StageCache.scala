package graft.operators

/** Build-once cache mechanics shared by the materialized stages
  * ([[DedupStage]], [[EmbedStage]]): key → scratch dir, atomic publish so
  * concurrent JVMs racing on the same stage never read a half-written
  * directory, and build-time accounting (the stages surface their build
  * seconds through Bench so steady-state operator timings can't hide the
  * one-off price).
  *
  * At cluster scale these stages are ordinary silver-layer tables and this
  * object disappears; the mtime in each stage's cache key is the local
  * stand-in for snapshot/version pinning.
  */
private[operators] object StageCache {

  private val built = scala.collection.mutable.Set.empty[String]

  /** Newest mtime under a parquet fixture path (file or directory-style) —
    * fails fast on a missing/empty fixture with a clear message instead of
    * surfacing later inside the build. */
  def parquetMtime(path: String): Long = {
    val f = new java.io.File(path)
    require(f.exists(), s"StageCache: fixture not found at ${f.getPath}")
    if (f.isDirectory) {
      val files = f.listFiles()
      require(files != null && files.nonEmpty,
        s"StageCache: ${f.getPath} is an empty directory")
      files.map(_.lastModified()).max
    } else f.lastModified()
  }

  /** Scratch dir for a cache key (md5-tagged under `root`). */
  def dir(root: String, key: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$root/$tag"
  }

  /** Build `dir` if absent (in this JVM and on disk) and return the
    * wall-clock seconds this call spent building (0 on a cache hit).
    *
    * The build lands in a process-private dir, then publishes with an
    * atomic rename: concurrent JVMs (driver's Verify and Bench, say) may
    * race on the same stage key, and a half-written shared dir must never
    * be readable. The loser of the rename discards its (equivalent,
    * deterministic) build.
    *
    * Crash/corruption recovery: a PUBLISHED dir always contains `_DONE`
    * (created inside the private dir before the atomic move), so a
    * stage dir WITHOUT the marker is garbage by invariant — a killed
    * non-atomic copy, manual tampering, a partial delete — and is
    * cleared and rebuilt rather than served (spec-proven in
    * StageCacheChaosSpec). The one staleness this cannot catch: an
    * in-place fixture overwrite that preserves BOTH path and mtime
    * (sub-mtime-resolution rewrite) keeps the old cache key — the cache
    * key's mtime is a local stand-in for real snapshot pinning, which a
    * cluster deployment gets from its table format's version/snapshot id.
    */
  def getOrBuild(stageDir: String)(build: String => Unit): Double =
    synchronized {
      val target = new java.io.File(stageDir)
      def done = new java.io.File(s"$stageDir/_DONE")
      if (target.exists() && !done.exists()) {
        // garbage by the publish invariant — never serve it
        built.remove(stageDir)
        org.apache.commons.io.FileUtils.deleteQuietly(target)
      }
      if (built.contains(stageDir) || done.exists()) {
        built.add(stageDir); 0.0
      } else {
        val t0 = System.nanoTime()
        val tmp = new java.io.File(
          stageDir + ".build." + java.lang.ProcessHandle.current().pid())
        build(tmp.getPath)
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(tmp.getPath, "_DONE"))
        // Lose-the-race shapes only (target already exists / non-empty);
        // any other move failure is a real error and must propagate — a
        // broad catch here would silently delete the build and surface
        // later as a confusing missing-path read.
        try java.nio.file.Files.move(tmp.toPath, target.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.DirectoryNotEmptyException =>
          if (done.exists()) {
            // another process published first — its stage is equivalent
            // (deterministic build); drop ours
            org.apache.commons.io.FileUtils.deleteQuietly(tmp)
          } else {
            // the occupant is garbage (no marker): replace it with ours
            org.apache.commons.io.FileUtils.deleteQuietly(target)
            java.nio.file.Files.move(tmp.toPath, target.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
        }
        built.add(stageDir)
        (System.nanoTime() - t0) / 1e9
      }
    }
}
