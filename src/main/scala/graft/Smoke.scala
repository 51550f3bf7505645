package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: runs `SparkEntry.entry` on
  * sf0.001 and asserts rows > 0, mirroring how the driver invokes it.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n (${if (n > 0) "OK" else "FAIL"})")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
