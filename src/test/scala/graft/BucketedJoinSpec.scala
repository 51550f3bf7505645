package graft

import org.apache.spark.sql.functions._

/** Proof of the deployment doctrine's central claim (README "Deployment
  * at scale"): tables BUCKETED on the join key join with NO exchange —
  * the shuffle is paid once at write time and amortized over every
  * subsequent join/aggregation. This is the layout the Silver/Gold
  * tables assume at 100 TB; here it's executed for real through Spark's
  * bucketed-table write path and asserted on the physical plan.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key runs with zero exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS bj_left")
      spark.sql("DROP TABLE IF EXISTS bj_right")
      (1L to 10000L).map(i => (i % 500, i, i * 2.0))
        .toDF("k", "row_id", "v")
        .write.bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("bj_left")
      (1L to 2000L).map(i => (i % 500, s"dim_$i"))
        .toDF("k", "name")
        .write.bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("bj_right")

      val joined = spark.table("bj_left").join(spark.table("bj_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 10000L * 4) // 2000 dim rows over 500 keys

      // the same join WITHOUT bucketing shuffles both sides — the
      // baseline that shows the exchange elimination is real
      val l = (1L to 10000L).map(i => (i % 500, i)).toDF("k", "row_id")
      val r = (1L to 2000L).map(i => (i % 500, s"d$i")).toDF("k", "name")
      val plain = l.join(r, "k").queryExecution.executedPlan.toString
      assert(plain.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bj_left")
      spark.sql("DROP TABLE IF EXISTS bj_right")
    }
  }

  test("aggregation on the bucket key reuses the bucket layout " +
    "(no exchange)") {
    try {
      spark.sql("DROP TABLE IF EXISTS bj_agg")
      (1L to 5000L).map(i => (i % 100, i * 1.5))
        .toDF("k", "v")
        .write.bucketBy(8, "k")
        .mode("overwrite").saveAsTable("bj_agg")
      val agg = spark.table("bj_agg").groupBy("k")
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation still shuffles:\n$plan")
      assert(agg.count() == 100)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_agg")
    }
  }
}
