package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotTable

/** Shallow clone + history metadata edge semantics: a clone shares the
  * source's files (no copy), diverges independently, refuses a head
  * carrying merge-on-read deletes, and its vacuum can never reclaim
  * source files; history rows are manifest-only facts.
  */
class CloneHistorySpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val t = s"/tmp/graft_clone_spec_${spark.sparkContext.applicationId}/$name"
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  private def seed = (1 to 100).map(i => (i.toLong, (i % 10).toLong))
    .toDF("id", "k")

  test("clone shares files, diverges independently, source untouched") {
    val src = fresh("src"); val dst = fresh("dst")
    SnapshotTable.commit(spark, seed, src, statsCols = Seq("id"))
    SnapshotTable.cloneSnapshot(spark, src, dst)
    assert(SnapshotTable.read(spark, dst).count() == 100)
    // no data files copied under the clone
    val dp = new org.apache.hadoop.fs.Path(dst, "data")
    val fs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(dp), "clone must not copy data files")
    // stats carried: pruned read works on the clone
    assert(SnapshotTable.readPruned(spark, dst, "id",
      Some(BigDecimal(1)), Some(BigDecimal(5))).count() > 0)
    // clone commits do not touch the source
    SnapshotTable.commit(spark, seed.filter($"id" <= 10), dst)
    assert(SnapshotTable.versions(spark, src) == Seq(1))
    assert(SnapshotTable.read(spark, src).count() == 100)
    assert(SnapshotTable.read(spark, dst).count() == 10)
  }

  test("clone refuses a head with outstanding delete vectors") {
    val src = fresh("src_dv"); val dst = fresh("dst_dv")
    SnapshotTable.commit(spark, seed, src)
    SnapshotTable.deleteWhere(spark, src, "id", $"id" % 2 === 0)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.cloneSnapshot(spark, src, dst)
    }
    assert(e.getMessage.contains("compactSnapshot"))
    // after compaction folds the deletes, the clone is legal and sees
    // the merge-on-read view
    SnapshotTable.compactSnapshot(spark, src)
    SnapshotTable.cloneSnapshot(spark, src, dst)
    assert(SnapshotTable.read(spark, dst).count() == 50)
  }

  test("the clone's vacuum never deletes source files") {
    val src = fresh("src_vac"); val dst = fresh("dst_vac")
    SnapshotTable.commit(spark, seed, src)
    SnapshotTable.cloneSnapshot(spark, src, dst)
    // clone replaces its content, then vacuums its own history
    SnapshotTable.commit(spark, seed.filter($"id" > 90), dst)
    SnapshotTable.vacuum(spark, dst,
      SnapshotTable.versions(spark, dst).last)
    // source files survive and the source still reads
    assert(SnapshotTable.read(spark, src).count() == 100)
  }

  test("history is manifest-only and reflects appends and deletes") {
    val t = fresh("hist")
    SnapshotTable.commit(spark, seed.repartition(2, $"k"), t,
      statsCols = Seq("id"))
    SnapshotTable.commit(spark,
      (101 to 120).map(i => (i.toLong, 0L)).toDF("id", "k").coalesce(1),
      t, replace = false, statsCols = Seq("id"))
    SnapshotTable.deleteWhere(spark, t, "id", $"id" > 100)
    val h = SnapshotTable.history(spark, t, "id")
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(h.map(_.getLong(1)).toSeq == Seq(2L, 3L, 3L))
    assert(h.map(_.getBoolean(2)).toSeq == Seq(false, false, true))
    // file stats are physical upper bounds: the delete does not tighten
    assert(h(2).getLong(4) == 120L)
  }
}
