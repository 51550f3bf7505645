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
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    * partition count, so AQE cannot coalesce it back down. */
  def fanOut(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
