package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotTable

/** Idempotent (transactional) commits — the Delta txnAppId/txnVersion
  * contract: a writer re-offering an already-recorded batch id must be a
  * no-op that reclaims its staged files, the watermark must ride the
  * manifest atomically, and maintenance commits (delete, compaction,
  * restore) must carry it forward.
  */
class TxnCommitSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val t = s"/tmp/graft_txn_spec_${spark.sparkContext.applicationId}/$name"
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  private def df(lo: Int, hi: Int) = (lo to hi).map(_.toLong).toDF("id")

  test("replayed and stale txn ids are no-ops; fresh ids apply") {
    val t = fresh("basic")
    SnapshotTable.commit(spark, df(1, 10), t, replace = false,
      txn = Some(("app", 0L)))
    val v1 = SnapshotTable.versions(spark, t).last
    // exact replay: same id — skipped, version unchanged, no new rows
    val r = SnapshotTable.commit(spark, df(1, 10), t, replace = false,
      txn = Some(("app", 0L)))
    assert(r == v1 && SnapshotTable.read(spark, t).count() == 10)
    // stale id (older than the watermark) — also skipped
    SnapshotTable.commit(spark, df(11, 20), t, replace = false,
      txn = Some(("app", 5L)))
    val r2 = SnapshotTable.commit(spark, df(991, 999), t, replace = false,
      txn = Some(("app", 3L)))
    assert(r2 == SnapshotTable.versions(spark, t).last)
    assert(SnapshotTable.read(spark, t).count() == 20)
    assert(SnapshotTable.txnVersion(spark, t, "app").contains(5L))
    // a different writer's ids are independent
    SnapshotTable.commit(spark, df(21, 25), t, replace = false,
      txn = Some(("other", 0L)))
    assert(SnapshotTable.read(spark, t).count() == 25)
    assert(SnapshotTable.txnVersion(spark, t, "app").contains(5L) &&
      SnapshotTable.txnVersion(spark, t, "other").contains(0L))
  }

  test("a skipped commit leaves no orphan staged files") {
    val t = fresh("orphan")
    SnapshotTable.commit(spark, df(1, 5), t, replace = false,
      txn = Some(("app", 1L)))
    val dataDir = new org.apache.hadoop.fs.Path(t, "data")
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.listStatus(dataDir).length
    SnapshotTable.commit(spark, df(1, 5), t, replace = false,
      txn = Some(("app", 1L)))
    assert(fs.listStatus(dataDir).length == before,
      "replayed commit left its staged data dir behind")
  }

  test("the watermark survives delete, compaction, and restore") {
    val t = fresh("carry")
    SnapshotTable.commit(spark, df(1, 100), t, replace = false,
      txn = Some(("app", 7L)))
    SnapshotTable.deleteWhere(spark, t, "id", col("id") % 2 === 0)
    assert(SnapshotTable.txnVersion(spark, t, "app").contains(7L),
      "deleteWhere dropped the txn watermark")
    SnapshotTable.compactSnapshot(spark, t)
    assert(SnapshotTable.txnVersion(spark, t, "app").contains(7L),
      "compaction dropped the txn watermark")
    // a replay after maintenance still skips
    SnapshotTable.commit(spark, df(1, 100), t, replace = false,
      txn = Some(("app", 7L)))
    assert(SnapshotTable.read(spark, t).count() == 50)
    // restore to the first version restores its watermark too
    SnapshotTable.restoreSnapshot(spark, t, 1)
    assert(SnapshotTable.txnVersion(spark, t, "app").contains(7L))
    assert(SnapshotTable.read(spark, t).count() == 100)
  }

  test("an audited publish (WAP) carries the head's txn watermark") {
    val t = fresh("wap")
    SnapshotTable.commit(spark, df(1, 10), t, replace = false,
      txn = Some(("stream", 3L)))
    // curated replace through the audit gate — must NOT erase the
    // streaming writer's exactly-once history
    val r = SnapshotTable.commitAudited(spark, df(1, 50), t,
      audit = d => if (d.count() == 50) None else Some("bad rowcount"))
    assert(r.isRight)
    assert(SnapshotTable.txnVersion(spark, t, "stream").contains(3L),
      "commitAudited dropped the txn watermark — a replayed batch " +
        "would re-apply after a WAP publish")
    // the replay really does no-op post-publish
    SnapshotTable.commit(spark, df(900, 999), t, replace = false,
      txn = Some(("stream", 3L)))
    assert(SnapshotTable.read(spark, t).count() == 50)
  }

  test("restore never rewinds a writer watermark below the head's") {
    val t = fresh("rewind")
    SnapshotTable.commit(spark, df(1, 10), t, replace = false,
      txn = Some(("stream", 1L)))
    SnapshotTable.commit(spark, df(11, 20), t, replace = false,
      txn = Some(("stream", 5L)))
    // undo the second batch's DATA…
    SnapshotTable.restoreSnapshot(spark, t, 1)
    assert(SnapshotTable.read(spark, t).count() == 10)
    // …but the watermark stays at max(head, as-of) = 5: an in-flight
    // at-least-once replay of batch 5 after the restore must not
    // double-apply (Delta RESTORE preserves SetTransaction state)
    assert(SnapshotTable.txnVersion(spark, t, "stream").contains(5L),
      "restore rewound the txn watermark")
    SnapshotTable.commit(spark, df(11, 20), t, replace = false,
      txn = Some(("stream", 5L)))
    assert(SnapshotTable.read(spark, t).count() == 10,
      "replayed batch re-applied after restore")
    // a genuinely fresh batch still lands
    SnapshotTable.commit(spark, df(21, 30), t, replace = false,
      txn = Some(("stream", 6L)))
    assert(SnapshotTable.read(spark, t).count() == 20)
  }
}
