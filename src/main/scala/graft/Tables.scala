package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided deterministic parquet fixtures
  * (`TESTDATA.md`): TPC-H-ish star schema + `events`/`documents`/`embeddings`.
  *
  * All loads are plain parquet scans so Catalyst's vectorized reader,
  * predicate pushdown, and column pruning apply untouched. At cluster scale
  * the same call sites take a Delta/Iceberg path; the query code never
  * assumes a storage layout beyond "columnar with pushdown".
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")

  /** `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark 4 refuses
    * to read as a timestamp. Read it as raw nanos (`nanosAsLong`) and truncate
    * to microseconds — exactly what DuckDB does when scanning the same file,
    * so oracle comparisons see identical instants.
    *
    * The conf must come from session construction ([[GraftSession.builder]]):
    * it is consulted again when the physical scan is built, so setting it
    * here (a global mutation from a table loader) or save/restoring around
    * this lazy read would either leak into unrelated reads or be gone before
    * the scan executes. Fail fast with the fix rather than mutate.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    GraftSession.requiredConfigs.foreach { case (k, v) =>
      require(s.conf.getOption(k).contains(v),
        s"Tables.events needs session conf $k=$v (set at session build, " +
        "e.g. via graft.GraftSession.builder)")
    }
    t(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Fan a narrow scan out to all cores when the source arrives as fewer
    * input splits than the cluster has slots — a single small parquet file
    * is ONE split, which would serialize expensive per-row expressions
    * (md5 shingles, 64-dim dot products) onto one core. At scale the
    * condition is false (real tables have thousands of splits) and this is
    * a no-op; locally it costs one shuffle of a sub-MB frame. Explicit
    * partition count, so AQE cannot coalesce it back down.
    *
    * Gated on `inputFiles` (analysis-only file listing) rather than
    * `df.rdd.getNumPartitions`, which would force a full physical-plan→RDD
    * conversion per call just to count splits. Files under-count splits for
    * large multi-rowgroup files, but that errs the cheap way: many files →
    * no-op (correct at scale), one small fixture file → fan out (the case
    * this exists for). */
  def fanOut(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < par) df.repartition(par) else df
  }
}
