package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints formatted physical plans for scale-critical queries so
  * plan regressions (lost pushdown, missed broadcast, extra exchanges) are
  * visible, and runs a small set of hard plan assertions (exit code 1 on
  * regression). Usage: runMain graft.Plans [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_scan_pushdown", "j2_broadcast_dim_join", "pl6_feature_battery",
               "w5_lag_battery", "w5b_lag_battery_dst", "j7_asof_join",
               "pl14_gold_full", "sim2_ann_lsh", "dd3_minhash_lsh")
    val qs = SparkEntry.queries
    names.foreach { n =>
      println(s"\n========== $n ==========")
      qs(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }

    // Hard assertions on scale-critical plan properties.
    def planOf(n: String): String =
      qs(n)(spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString
    var failed = 0
    def check(label: String)(ok: Boolean): Unit = {
      println(s"[plans] ${if (ok) "OK  " else "FAIL"} $label")
      if (!ok) failed += 1
    }
    // predicate pushdown reaches the parquet scan
    check("s1: filters pushed to scan") {
      planOf("s1_scan_pushdown").contains("PushedFilters: [")
    }
    // dimension joins broadcast (no shuffle of the fact side)
    check("j2: broadcast hash join") {
      planOf("j2_broadcast_dim_join").contains("BroadcastHashJoin")
    }
    // the window battery reuses ONE hash exchange (no per-horizon shuffle)
    check("w5: single exchange for the lag battery") {
      "Exchange hashpartitioning".r
        .findAllIn(planOf("w5_lag_battery")).length == 1
    }
    // top-k compiles to TakeOrdered, not global sort
    check("o2: TakeOrderedAndProject") {
      planOf("o2_topk").contains("TakeOrdered")
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
