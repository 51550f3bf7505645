package graft

import org.apache.spark.sql.functions._

/** Cross-surface invariant for the streaming HLL sketch: after any
  * sequence of micro-batches, the streaming estimate must equal the BATCH
  * a33 query's estimate over the union of all rows bit-for-bit — the
  * streaming state is a register max-fold, and max-folds are batching-
  * and redelivery-insensitive (the a33b merge law in streaming form).
  * The batch side runs the real `a33_hll_distinct` query over a temp
  * events fixture (ts written as raw nanos longs, the driver fixture's
  * encoding), so this pins streaming code against oracle-verified code,
  * not against a shared helper.
  */
class StreamingHllSpec extends SparkSpec {

  test("streaming sketch equals the batch query after multiple batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // users 0..39 in 'click', 0..19 in 'view'; batch 2 re-delivers some
    // of batch 1 (overlap) plus new users — the sketch must absorb both
    val batch1 = (0 until 25).map(u => ("click", u.toLong)) ++
      (0 until 10).map(u => ("view", u.toLong))
    val batch2 = (15 until 40).map(u => ("click", u.toLong)) ++
      (5 until 20).map(u => ("view", u.toLong))

    // batch expectation: the oracle-verified a33 query over the union
    val dir = java.nio.file.Files.createTempDirectory("graft_shll").toString
    (batch1 ++ batch2).toDF("event_type", "user_id")
      .withColumn("ts", lit(1704103200000000000L)) // nanos, fixture-style
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val expected = SparkEntry.queries("a33_hll_distinct")(spark, dir)
      .select("event_type", "hll_estimate")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = graft.streaming.StreamingOps
      .streamingHll(mem.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("update").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // last emission per group = the row with the highest n_total
      val last = spark.sql(
          """SELECT event_type, estimate FROM (
            |  SELECT *, row_number() OVER (PARTITION BY event_type
            |    ORDER BY n_total DESC) AS rn FROM hll_out) WHERE rn = 1
            |""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(last.keySet == expected.keySet)
      expected.foreach { case (et, est) =>
        assert(last(et) == est, // bit-exact, not a tolerance compare
          s"streaming/batch divergence for $et: " +
            s"streaming=${last(et)} batch=$est")
      }
    } finally q.stop()
  }
}
