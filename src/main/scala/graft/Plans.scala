package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints formatted physical plans for scale-critical queries so
  * plan regressions (lost pushdown, missed broadcast, extra exchanges) are
  * visible. Usage: runMain graft.Plans [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_scan_pushdown", "j2_broadcast_dim_join", "pl6_feature_battery",
               "w5_lag_battery", "j7_asof_join")
    val qs = SparkEntry.queries
    names.foreach { n =>
      println(s"\n========== $n ==========")
      qs(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
