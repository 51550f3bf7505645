package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "pl14_gold_full")
      .split(",").map(_.trim)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val plan = SparkEntry.queries(n)(spark, d)
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      println(s"[scratch] $n: $exchanges hash exchanges")
      plan.linesIterator.filter(_.contains("Exchange"))
        .foreach(l => println("[scratch]   " + l.trim.take(120)))
    }
    spark.stop()
  }
}
