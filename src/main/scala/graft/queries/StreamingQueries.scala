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

  /** Run `body` with the shuffle-partition count the STREAM should use.
    *
    * Stateful streaming cost at fixture scale is dominated by fixed
    * machinery — one state-store instance per shuffle partition per
    * stateful operator per micro-batch (a stream-stream join keeps FOUR
    * stores per partition) — not by rows. The batch default (32 here)
    * exists for batch shuffles; a stream's state partitioning should be
    * sized to stream volume. Structured Streaming pins the count into the
    * checkpoint at first run (fresh per invocation here), so this is also
    * the honest production shape: pick it per stream, scale it with
    * throughput, never inherit the batch default. Restores the session
    * conf afterwards (queries run sequentially in Verify/Bench).
    */
  private def withStreamPartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
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
    // TIME-ORDERED single-file chunks discovered one per micro-batch
    // (maxFilesPerTrigger=1), so the 1-hour OHLC windows form across
    // batch boundaries with a 2-hour watermark; a far-future sentinel file
    // arrives last purely to advance the watermark past every real window
    // (append mode emits a window exactly once, when it finalizes — the
    // sentinel's own window never finalizes and is filtered anyway).
    // Two data chunks: one boundary is enough to prove the cross-batch
    // window/watermark machinery, and each extra micro-batch costs ~1.5s
    // of fixed checkpoint/MERGE machinery in the bench — the row's cost
    // is that machinery, not data volume.
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
        val cuts = (0 to 2).map(k => t0 + span * k / 2)
        // deterministic, widely spaced mod-times (file-source order key)
        val mt0 = 1700000000000L
        for (k <- 0 until 2) {
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
        writeOneFile(s, sentinel, s"$srcDir/chunk_2.parquet",
          mt0 + 2 * 60000L)

        withStreamPartitions(s, 8) {
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
        }
        s.read.parquet(s"$base/sink")
          .filter(col("user_id") =!= -1L)
          .select("user_id", "win_start", "open", "high", "low", "close",
            "n_events")
      }),

    // ST2: watermarked stream-stream interval join (the streaming twin of
    // j6) driven through real micro-batches: view events attributed to
    // the click that followed within 1 hour, both sides read from the
    // same chunked file source (one chunk per trigger), joined with
    // per-side watermarks so impression state expires once no qualifying
    // click can still arrive. Inner join in append mode emits each
    // matched pair exactly once — including CROSS-batch pairs (an
    // impression near a chunk boundary must survive in state until its
    // click arrives in the next micro-batch; the watermark math that
    // makes that safe is the thing this row proves end-to-end). The
    // result set is deterministic regardless of batching, so the oracle
    // is the declarative batch interval join; event ids ride along,
    // making each pair unique — the MERGE key of the idempotent sink.
    //
    // Scale shape: state is bounded by the horizon on both sides (never
    // the stream length) and the join shuffles only the two filtered
    // event streams on user_id.
    QueryDef(
      "st2_stream_interval_join",
      Some("""SELECT v.user_id, v.ts AS imp_ts, v.value AS imp_value,
             |  c.ts AS click_ts,
             |  v.event_id AS imp_id, c.event_id AS click_id
             |FROM events v JOIN events c ON v.user_id = c.user_id
             |WHERE v.event_type = 'view' AND c.event_type = 'click'
             |  AND c.ts >= v.ts
             |  AND c.ts <= v.ts + INTERVAL 1 HOUR""".stripMargin),
      (s, d) => {
        val base = Sinks.dir(s, "stream_ssj", d)
        reset(s, base)
        val srcDir = s"$base/src"
        val ev = Tables.events(s, d)
          .select("event_id", "user_id", "ts", "value", "event_type")
          .filter(col("event_type").isin("view", "click"))
        val bounds = ev.agg(min("ts"), max("ts")).head()
        val t0 = bounds.getTimestamp(0).getTime
        val span = bounds.getTimestamp(1).getTime - t0 + 1
        val cuts = (0 to 2).map(k => t0 + span * k / 2)
        val mt0 = 1700000000000L
        for (k <- 0 until 2) {
          val chunk = ev.filter(
            col("ts") >= timestamp_millis(lit(cuts(k))) &&
              col("ts") < timestamp_millis(lit(cuts(k + 1))))
          writeOneFile(s, chunk, s"$srcDir/chunk_$k.parquet",
            mt0 + k * 60000L)
        }
        withStreamPartitions(s, 8) {
          def side(tpe: String): DataFrame = s.readStream
            .schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(srcDir)
            .filter(col("event_type") === tpe)
            .select("event_id", "user_id", "ts", "value")
          val joined = graft.streaming.StreamingOps.streamingIntervalJoin(
            side("view"), side("click"), horizon = "1 hour")
          val q = graft.streaming.StreamingOps.mergeSink(
            joined, sinkPath = s"$base/sink",
            keyCols = Seq("imp_id", "click_id"), orderCol = "imp_id",
            checkpoint = s"$base/ckpt",
            trigger = Some(Trigger.AvailableNow()))
          q.awaitTermination()
        }
        s.read.parquet(s"$base/sink")
          .select("user_id", "imp_ts", "imp_value", "click_ts",
            "imp_id", "click_id")
      })
  )
}
