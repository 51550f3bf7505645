package graft

import graft.operators.SnapshotTable
import org.apache.spark.sql.streaming.Trigger

/** The snapshot table as a streaming source: version offsets checkpoint
  * and resume, each micro-batch delivers exactly the committed delta, and
  * rewritten history fails loudly instead of re-delivering. */
class SnapshotStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def dir() =
    java.nio.file.Files.createTempDirectory("graft_snapstream").toString

  private def tail(t: String, sink: String, ckpt: String): Unit = {
    val q = spark.readStream.format("snapshot-table")
      .option("path", t).load()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("tailing across restarts delivers each commit exactly once") {
    val d = dir()
    val (t, sink, ckpt) = (s"$d/t", s"$d/sink", s"$d/ckpt")
    SnapshotTable.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "x"), t)
    tail(t, sink, ckpt)
    assert(spark.read.parquet(sink).count() == 2)
    // two more commits before the SECOND lifecycle: one restart must
    // deliver both versions' files, none of v1's
    SnapshotTable.commit(spark, Seq((3L, "c")).toDF("id", "x"), t,
      replace = false)
    SnapshotTable.commit(spark, Seq((4L, "d")).toDF("id", "x"), t,
      replace = false)
    tail(t, sink, ckpt)
    val ids = spark.read.parquet(sink).select("id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L), ids.toString)
    // no new commits: a further restart delivers nothing
    tail(t, sink, ckpt)
    assert(spark.read.parquet(sink).count() == 4)
  }

  test("a rewritten chain fails the stream loudly") {
    val d = dir()
    val (t, sink, ckpt) = (s"$d/t", s"$d/sink", s"$d/ckpt")
    SnapshotTable.commit(spark, Seq((1L, "a")).toDF("id", "x"), t)
    tail(t, sink, ckpt)
    // an upsert rewrites every file: file-level increments are undefined
    SnapshotTable.upsertSnapshot(spark,
      Seq((1L, "a2")).toDF("id", "x"), t,
      keyCols = Seq("id"), orderCol = "id")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      tail(t, sink, ckpt))
    def chain(e: Throwable): List[Throwable] =
      if (e == null) Nil else e :: chain(e.getCause)
    assert(chain(ex).exists(
      _.getMessage.contains("not an append-only chain")), ex.getMessage)
  }

  test("schema comes from the table's recorded metadata") {
    val d = dir()
    val t = s"$d/t"
    SnapshotTable.commit(spark, Seq((1L, 2.5)).toDF("id", "v"), t)
    val stream = spark.readStream.format("snapshot-table")
      .option("path", t).load()
    assert(stream.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(stream.isStreaming)
  }

  private def tailCdc(t: String, sink: String, ckpt: String): Unit = {
    val q = spark.readStream.format("snapshot-table")
      .option("path", t).option("changeFeed", "true").load()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("change feed: initial load is the NET state, later deletes typed") {
    val d = dir()
    val (t, sink, ckpt) = (s"$d/t", s"$d/sink", s"$d/ckpt")
    import org.apache.spark.sql.functions.col
    SnapshotTable.commit(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "x"), t)
    // delete BEFORE the stream ever starts: the initial CDC load must be
    // the merge-on-read net state, not the raw files
    SnapshotTable.deleteWhere(spark, t, "id", col("id") === 2L)
    tailCdc(t, sink, ckpt)
    val initial = spark.read.parquet(sink)
    assert(initial.filter(col("change_op") === "delete").count() == 0)
    assert(initial.select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L))
    // a delete AFTER the stream started surfaces as typed delete rows
    SnapshotTable.deleteWhere(spark, t, "id", col("id") === 3L)
    tailCdc(t, sink, ckpt)
    val rows = spark.read.parquet(sink)
    val dels = rows.filter(col("change_op") === "delete")
    assert(dels.count() == 1 && dels.select("id").head().getLong(0) == 3L)
    // the deleted row's non-key columns are null in the CDC row
    assert(dels.filter(col("x").isNull).count() == 1)
  }
}
