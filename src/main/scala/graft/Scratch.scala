package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries end-to-end N times in one JVM (exposes
  * first-run codegen/JIT cost vs steady state, separate from Bench's
  * warmed medians). Usage:
  *   SPARK_GRAFT_ONLY=q1,q2 SPARK_GRAFT_REPS=3 runMain graft.Scratch
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "dd3_minhash_lsh")
      .split(",").map(_.trim)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.builder("local[32]", "32")
      .config("spark.sql.codegenCacheMaxEntries", "5000")
      // mirror Bench's split emulation (see Bench.scala) so Scratch
      // timings predict Bench timings
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[scratch] run$r $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
