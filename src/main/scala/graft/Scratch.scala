package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup full dd5 twice
    for (i <- 1 to 2)
      time(s"dd5 full warm$i") {
        SparkEntry.queries("dd5_ngram_jaccard")(spark, d)
          .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
      }
    // stage-by-stage (mirrors the query)
    import graft.operators.TextOps._
    val withTh = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), md5(col("text")).as("th"))
    val par = spark.sparkContext.defaultParallelism
    val reps = withTh.repartition(par, col("th"))
      .groupBy("th")
      .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_copies"),
           min_by(col("text"), col("doc_id")).as("text"))
    val hashed = reps
      .select(col("th"), col("rep_id"), col("n_copies"),
              explode_outer(shingles(col("text"))).as("sg"))
      .select(col("th"), col("rep_id"), col("n_copies"),
              hash32(col("sg")).as("h"))
      .dropDuplicates("th", "h")
    val sets = hashed.persist()
    time("hashed persist")(sets.count())
    val postW = org.apache.spark.sql.expressions.Window.partitionBy("s")
    val posts = sets.filter(col("h").isNotNull)
      .select(col("th"), col("rep_id"), col("h").as("s"))
      .withColumn("df", count(lit(1)).over(postW))
      .filter(col("df") <= 1000)
      .select("th", "rep_id", "s")
    time("posts (window df)")(posts.write.format("noop").mode("overwrite").save())
    val common = posts.as("a")
      .join(posts.as("b"),
        col("a.s") === col("b.s") && col("a.rep_id") < col("b.rep_id"))
      .groupBy(col("a.th").as("th_a"), col("b.th").as("th_b"))
      .agg(count(lit(1)).as("c"))
    time("common pairs")(println("pairs=" + common.count()))
    spark.catalog.clearCache()
    spark.stop()
  }
}
