package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Dev tool: measure the Gold INCREMENTAL-refresh win as history grows —
  * the round-10 verdict's open item on st8: the fixture spans fewer days
  * than [[graft.operators.IncrementalGold.LookbackRows]], so each st8
  * micro-batch legitimately costs ≈ a full Gold build there and the
  * incremental claim was asserted, not shown.
  *
  * Method: STRETCH the fixture's event timestamps by k ∈ {1, 4, 16}
  * (same rows, same per-user structure, k× the day span — days get
  * thinner, history gets deeper), take the LAST stretched day as the
  * arriving batch, and time
  *   full    — GoldFeatures.goldTableFused over the whole history
  *             (the reference notebook's recompute-everything refresh), vs
  *   refresh — IncrementalGold.refresh (affected users × bounded
  *             22-day-row lookback slice).
  * Expected shape: full stays ~flat (row count fixed), refresh cost drops
  * toward the lookback slice as span ≫ lookback, so the full/refresh
  * ratio rises from ≈1× (fixture span) to ≫1× — the property that makes
  * a daily 100 TB gold refresh affordable. The probe also equality-checks
  * the refreshed days against the full build's same rows, so the speedup
  * is never quoted on a divergent answer.
  *
  * Round 12 adds the FLOOR COMPOSITION the wall numbers demand: a
  * SparkListener tallies, for each timed run, the Spark STAGE count, the
  * summed task time, and the records read — so the measured ≈constant
  * local refresh wall decomposes into (stages × per-stage scheduling
  * constant) + (a data term that actually shrinks with the slice). The
  * first real-cluster run can then confirm or kill the cluster-scale
  * extrapolation from one table instead of re-deriving it.
  *
  * Usage: runMain graft.GoldRefreshProbe [sfDir]
  * SPARK_GRAFT_PROBE_OUT writes the JSON artifact.
  */
object GoldRefreshProbe {

  /** Stage/task/input tally over a timed region (driver-side listener;
    * local[32] delivers events in-process, and `waitUntilEmpty` drains
    * the bus before reading). */
  private final class StageTally extends
      org.apache.spark.scheduler.SparkListener {
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.LongAdder
    val recordsRead = new java.util.concurrent.atomic.LongAdder
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      taskMs.add(sc.stageInfo.taskMetrics.executorRunTime)
      recordsRead.add(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
    }
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.events(spark, d).select("user_id", "ts", "value")
    val bounds = ev.agg(min("ts"), max("ts")).head()
    val t0 = bounds.getTimestamp(0).getTime
    val t1 = bounds.getTimestamp(1).getTime

    def timed(df: => DataFrame): (Double, StageTally) = {
      val tally = new StageTally
      spark.sparkContext.addSparkListener(tally)
      val s0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - s0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(1000) // drain the (async) listener bus before reading
      spark.sparkContext.removeSparkListener(tally)
      (wall, tally)
    }
    def time(df: => DataFrame): Double = timed(df)._1

    val rows = Seq(1L, 4L, 16L).map { k =>
      val stretched = ev.select(col("user_id"),
        timestamp_millis(lit(t0) + (unix_millis(col("ts")) - t0) * k)
          .as("ts"),
        col("value"))
      // materialize the history DAY-PARTITIONED, the bronze layout a
      // production gold pipeline keeps (and the shape the incremental
      // refresh's scan bound needs — an unpartitioned history makes
      // refresh pay the full scan regardless of the lookback, which is
      // exactly what the first version of this probe measured)
      val dir = s"/tmp/graft_gold_probe/k$k"
      stretched.withColumn("day", to_date(col("ts")))
        .repartition(col("day"))
        .write.mode(SaveMode.Overwrite).partitionBy("day").parquet(dir)
      val hist = spark.read.parquet(dir)
      val nRows = hist.count()
      val spanDays = ((t1 - t0) * k / 86400000L) + 1
      val lastDay = hist.agg(max(col("day"))).head().getDate(0)
      val batch = hist.filter(col("day") === lit(lastDay))
      val nBatch = batch.count()
      // the existing gold table's key set (what a live pipeline has on
      // disk when the batch arrives) — materialized untimed, read back
      // so the timed refresh pays only the key SCAN, as production would
      hist.select("user_id", "day").distinct()
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/_goldkeys")
      val goldKeys = spark.read.parquet(s"$dir/_goldkeys")
      val (fullSec, fullTally) = timed(
        graft.operators.GoldFeatures.goldTableFused(hist.drop("day")))
      val (refrSec, refrTally) = timed(graft.operators.IncrementalGold
        .refresh(spark, hist, batch, Some(goldKeys)))
      // the speedup must not be quoted on a wrong answer: the refreshed
      // days equal the full build's rows for those days, bit-for-bit
      val full = graft.operators.GoldFeatures.goldTableFused(
        hist.drop("day"))
      val refreshed = graft.operators.IncrementalGold
        .refresh(spark, hist, batch, Some(goldKeys))
      val firstNew = batch.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("fnd"))
      val fullSame = full.join(broadcast(firstNew), "user_id")
        .filter(col("day") >= col("fnd")).drop("fnd")
      val diverged = refreshed.exceptAll(fullSame).count() +
        fullSame.exceptAll(refreshed).count()
      require(diverged == 0,
        s"k=$k: refresh diverged from the full build on $diverged rows")
      val ratio = fullSec / refrSec
      println(f"[gold] k=$k%-3d span=$spanDays%4dd rows=$nRows " +
        f"batch=$nBatch full=$fullSec%6.2fs refresh=$refrSec%6.2fs " +
        f"full/refresh=$ratio%5.2fx")
      println(f"[gold]   full:    stages=${fullTally.stages.get}%3d " +
        f"task=${fullTally.taskMs.sum}%6dms " +
        f"input_rows=${fullTally.recordsRead.sum}%9d")
      println(f"[gold]   refresh: stages=${refrTally.stages.get}%3d " +
        f"task=${refrTally.taskMs.sum}%6dms " +
        f"input_rows=${refrTally.recordsRead.sum}%9d " +
        f"(~${refrSec * 1000 / refrTally.stages.get}%.0fms wall/stage)")
      (k, spanDays, nRows, nBatch, fullSec, refrSec, ratio,
        (fullTally.stages.get, fullTally.taskMs.sum,
          fullTally.recordsRead.sum),
        (refrTally.stages.get, refrTally.taskMs.sum,
          refrTally.recordsRead.sum))
    }
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { path =>
      val json = rows.map { case (k, sp, n, nb, f, r, ratio, ft, rt) =>
        f"""  "k$k": {"span_days": $sp, "rows": $n, "batch_rows": $nb, """ +
          f""""full_sec": $f%.2f, "refresh_sec": $r%.2f, """ +
          f""""speedup": $ratio%.2f, """ +
          f""""full_stages": ${ft._1}, "full_task_ms": ${ft._2}, """ +
          f""""full_input_rows": ${ft._3}, """ +
          f""""refresh_stages": ${rt._1}, "refresh_task_ms": ${rt._2}, """ +
          f""""refresh_input_rows": ${rt._3}}"""
      }.mkString("{\n \"points\": {\n", ",\n", "\n }\n}")
      val p = new java.io.PrintWriter(path); p.write(json); p.close()
      println(s"[gold] artifact -> $path")
    }
    spark.stop()
  }
}
