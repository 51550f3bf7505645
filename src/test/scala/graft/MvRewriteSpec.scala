package graft

import graft.plans.MvRegistry
import org.apache.spark.sql.functions._

/** The MV rewrite rule's SAFETY boundary — the cases where it must NOT
  * fire (firing wrongly silently corrupts results; the positive path is
  * hash-verified end-to-end by `pl28_mv_rewrite`).
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def base(): (String, String) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mv").toString
    val src = s"$dir/events.parquet"
    (1L to 100L).map(i => (i % 7, i)).toDF("user_id", "event_id")
      .write.parquet(src)
    // a DELIBERATELY WRONG mv (all counts 0) so any firing is visible
    // in the DATA, not just the plan
    val mv = s"$dir/mv"
    spark.read.parquet(src).groupBy("user_id")
      .agg((count(lit(1)) * 0L).as("n"))
      .select(col("user_id"), col("n").as(MvRegistry.CountAlias))
      .write.parquet(mv)
    (src, mv)
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("fires only for the reserved alias over the registered source") {
    val (src, mv) = base()
    try {
      MvRegistry.register(src, mv)
      val hit = spark.read.parquet(src).groupBy("user_id")
        .agg(count(lit(1)).as(MvRegistry.CountAlias))
      assert(plan(hit).contains("/mv"))
      // sum over the DataFrame's own rows (a nested re-aggregation
      // would prune user_id from the inner agg and legitimately skip
      // the rewrite)
      assert(hit.collect().map(_.getLong(1)).sum == 0L)

      // a different alias must NOT fire
      val miss = spark.read.parquet(src).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
      assert(!plan(miss).contains("/mv"))
      assert(miss.collect().map(_.getLong(1)).sum == 100L)
    } finally MvRegistry.clear()
  }

  test("a filter between aggregate and scan disqualifies the rewrite") {
    val (src, mv) = base()
    try {
      MvRegistry.register(src, mv)
      val filtered = spark.read.parquet(src)
        .filter(col("event_id") <= 50L)
        .groupBy("user_id")
        .agg(count(lit(1)).as(MvRegistry.CountAlias))
      assert(!plan(filtered).contains("/mv"))
      assert(filtered.collect().map(_.getLong(1)).sum == 50L)
    } finally MvRegistry.clear()
  }

  test("unregistered sources and distinct counts never rewrite") {
    val (src, mv) = base()
    try {
      // not registered at all
      val cold = spark.read.parquet(src).groupBy("user_id")
        .agg(count(lit(1)).as(MvRegistry.CountAlias))
      assert(!plan(cold).contains("/mv"))

      MvRegistry.register(src, mv)
      // count(DISTINCT …) is a different aggregate — must not fire
      val dist = spark.read.parquet(src).groupBy("user_id")
        .agg(countDistinct(col("event_id")).as(MvRegistry.CountAlias))
      assert(!plan(dist).contains("/mv"))
      assert(dist.collect().map(_.getLong(1)).sum == 100L)
    } finally MvRegistry.clear()
  }
}
