package graft

import org.apache.spark.sql.SparkSession

/** One place that knows the session configuration every graft entrypoint
  * (Bench / Verify / Smoke / Plans / Scratch / specs) needs. Nothing in the
  * query code mutates session conf at runtime — configs that change how
  * storage is *read* (like parquet NANOS handling) belong at session build,
  * where they apply uniformly to planning AND execution, instead of leaking
  * from one table loader into every later read in the session.
  */
object GraftSession {
  /** Session-build configs graft readers may depend on.
    *
    * `nanosAsLong`: when an `events` fixture generation stores `ts` as
    * parquet TIMESTAMP(NANOS) (which Spark 4 otherwise refuses to scan),
    * this surfaces it as raw nanos for [[Tables.events]] to truncate —
    * matching DuckDB's view of the same file. For micros-encoded fixtures
    * the conf is inert, so it is always safe to set; it is consulted both
    * at schema inference and at physical-scan construction, so it must be
    * set before the first action rather than save/restored around a lazy
    * read.
    */
  val requiredConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // native graft functions (ewm_nr, dot_long) in every session — the
    // standard extensions injection, so query code can call them without
    // per-session registration
    "spark.sql.extensions" -> "graft.functions.GraftExtensions",
    // r13: always use the sort-based shuffle writer. With shuffle
    // partitions sized to the core count (the local default), EVERY SQL
    // shuffle falls under the 200-partition bypass threshold, and the
    // bypass writer opens one file PER REDUCE PARTITION per map task and
    // then NIO-concatenates them — M×R file creates + copies per
    // exchange. jstack sampling of a hot aggregate showed the map tasks
    // spending most of their time in FileOutputStream.open0 /
    // copyFileStreamNIO, and a 30s A/B on that stage ran 2.6× more
    // iterations with the sort writer (one spillable buffer → ONE file +
    // index per map task). At cluster scale (partitions ≫ 200) the
    // bypass never engages, so this also makes local plans exercise the
    // same writer a production shuffle uses.
    "spark.shuffle.sort.bypassMergeThreshold" ->
      sys.env.getOrElse("SPARK_GRAFT_BYPASS", "1")
  )

  def builder(master: String, shufflePartitions: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    requiredConfigs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }
}
