package graft

import org.apache.spark.sql.SparkSession

/** Per-application scratch sinks for queries that exercise real file I/O
  * (partitioned sinks, MERGE targets, CSV round-trips, snapshot tables).
  *
  * Paths are suffixed with the Spark applicationId: two concurrent runs
  * against the same sf dir (e.g. a bench while a preverify is still up)
  * previously shared one fixed path and interleaved delete/merge cycles on
  * the same sink, corrupting both nondeterministically. Within one
  * application the path is stable, so a query invoked repeatedly (bench
  * iterations) keeps its overwrite-then-read-back semantics.
  *
  * Every handed-out path is registered once and deleted recursively by a
  * JVM shutdown hook — scratch must not accumulate across runs.
  */
object Sinks {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  @volatile private var hooked = false

  /** `/tmp/graft_<name>_<key>_<appId>`, registered for cleanup at exit. */
  def dir(s: SparkSession, name: String, key: String = ""): String = {
    val k = if (key.isEmpty) "" else "_" + key.replaceAll("[^A-Za-z0-9]", "_")
    val p = s"/tmp/graft_${name}${k}_${s.sparkContext.applicationId}"
    if (registered.add(p)) ensureHook()
    p
  }

  private def ensureHook(): Unit = synchronized {
    if (!hooked) {
      hooked = true
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import scala.jdk.CollectionConverters._
        registered.asScala.foreach { p =>
          try {
            val root = java.nio.file.Paths.get(p)
            if (java.nio.file.Files.exists(root)) {
              java.nio.file.Files.walk(root)
                .sorted(java.util.Comparator.reverseOrder())
                .forEach(f => java.nio.file.Files.deleteIfExists(f))
            }
          } catch { case _: Throwable => () } // best-effort cleanup
        }
      }, "graft-sinks-cleanup"))
    }
  }
}
