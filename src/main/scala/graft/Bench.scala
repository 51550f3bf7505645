package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every operator query at
  * SPARK_GRAFT_SF_DIR (sf0.1 per round) and prints ONE JSON line.
  *
  * Queries are forced through the `noop` sink — a bare `count()` would let
  * Catalyst prune the projected expressions and benchmark the scan only.
  * Config mirrors the target environment: local[32], 32 shuffle
  * partitions (not the 200 default — at local scale the extra task
  * scheduling dominates), AQE on (default in Spark 4).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM + executor warmup outside the timed region.
    SparkEntry.queries.get("a1_group_minmax")
      .foreach(f => f(spark, sfDir).write.format("noop").mode("overwrite").save())

    val results = SparkEntry.defs.map { q =>
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
