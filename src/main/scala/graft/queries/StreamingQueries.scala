package graft.queries

import graft.{QueryDef, Sinks, Tables}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** SURVEY §2.9 — the streaming flavors driven through REAL micro-batch
  * execution, hash-verified against declarative batch oracles. The batch
  * twins of these patterns (s12 incremental sync, pl13 merge) have oracle
  * rows already; these rows prove the `readStream` path end-to-end: file
  * source discovery order, watermark advancement across micro-batches,
  * append-mode window finalization, and the checkpointed foreachBatch
  * MERGE sink.
  */
object StreamingQueries {

  /** Recursively drop a scratch root (fresh state per invocation — a
    * leftover checkpoint would make the file source see "no new data"). */
  private def reset(s: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Write `df` as exactly one parquet FILE at `target` with a pinned
    * modification time — the file source processes files in mod-time
    * order, so arrival order is data the test controls, not an accident
    * of write latency. */
  private def writeOneFile(s: SparkSession, df: DataFrame, target: String,
                           mtime: Long): Unit = {
    val tgt = new Path(target)
    val fs = tgt.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new Path(target + "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
    fs.mkdirs(tgt.getParent)
    fs.rename(part, tgt)
    fs.delete(tmp, true)
    fs.setTimes(tgt, mtime, -1)
  }

  val all: Seq[QueryDef] = Seq(

    // ST1: streaming tumbling resample → checkpointed MERGE sink, the
    // streaming twin of s12's incremental-sync pattern (bars.py:74-137:
    // fetch window → ON CONFLICT DO NOTHING load, repeated per poll).
    //
    // Execution is genuinely incremental: the events table is split into
    // three TIME-ORDERED single-file chunks discovered one per micro-batch
    // (maxFilesPerTrigger=1), so the 1-hour OHLC windows form across
    // batch boundaries with a 2-hour watermark; a far-future sentinel file
    // arrives last purely to advance the watermark past every real window
    // (append mode emits a window exactly once, when it finalizes — the
    // sentinel's own window never finalizes and is filtered anyway).
    // Each emitted window MERGEs into the parquet sink via the idempotent
    // keyed insert ([[graft.operators.MergeUpsert.insertIfAbsent]] on
    // (user_id, win_start)) under a real checkpoint, Trigger.AvailableNow.
    //
    // The oracle is the BATCH aggregate of the same rows — proving the
    // stream's per-batch emission converges to exactly the declarative
    // answer regardless of how the data was batched.
    //
    // Scale shape: state is one row per OPEN (user, hour) window — bounded
    // by the watermark horizon, not the stream length; the sink MERGE is
    // the same keys-only anti-join the batch rows pin (Plans pl13 check).
    QueryDef(
      "st1_stream_merge",
      Some("""SELECT user_id,
             |  time_bucket(INTERVAL '1 hour', ts) AS win_start,
             |  arg_min(value, ts) AS open, max(value) AS high,
             |  min(value) AS low, arg_max(value, ts) AS close,
             |  count(*) AS n_events
             |FROM events
             |GROUP BY 1, 2""".stripMargin),
      (s, d) => {
        val base = Sinks.dir(s, "stream_merge", d)
        reset(s, base)
        val srcDir = s"$base/src"
        val ev = Tables.events(s, d).select("user_id", "ts", "value")
        val bounds = ev.agg(min("ts"), max("ts")).head()
        val t0 = bounds.getTimestamp(0).getTime
        val t1 = bounds.getTimestamp(1).getTime
        val span = t1 - t0 + 1
        val cuts = (0 to 3).map(k => t0 + span * k / 3)
        // deterministic, widely spaced mod-times (file-source order key)
        val mt0 = 1700000000000L
        for (k <- 0 until 3) {
          val chunk = ev.filter(
            col("ts") >= timestamp_millis(lit(cuts(k))) &&
              col("ts") < timestamp_millis(lit(cuts(k + 1))))
          writeOneFile(s, chunk, s"$srcDir/chunk_$k.parquet",
            mt0 + k * 60000L)
        }
        import s.implicits._
        val sentinel = Seq(
          (-1L, new java.sql.Timestamp(t1 + 30L * 24 * 3600 * 1000), 0.0))
          .toDF("user_id", "ts", "value")
        writeOneFile(s, sentinel, s"$srcDir/chunk_3.parquet",
          mt0 + 3 * 60000L)

        val stream = s.readStream
          .schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
        val q = graft.streaming.StreamingOps.mergeSink(
          graft.streaming.StreamingOps.tumblingResample(stream),
          sinkPath = s"$base/sink",
          keyCols = Seq("user_id", "win_start"), orderCol = "win_start",
          checkpoint = s"$base/ckpt",
          trigger = Some(Trigger.AvailableNow()))
        q.awaitTermination()
        s.read.parquet(s"$base/sink")
          .filter(col("user_id") =!= -1L)
          .select("user_id", "win_start", "open", "high", "low", "close",
            "n_events")
      })
  )
}
