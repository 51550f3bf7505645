package graft

import org.apache.spark.sql.functions._

import graft.operators.ModelRegistry

/** The registry's core contract: versions are assigned from COMMITTED
  * table state (monotonic across writer restarts, independent per model
  * name), `latest` resolves through the listing, and payloads may not
  * shadow the registry's own columns.
  */
class ModelRegistrySpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val d = Sinks.dir(spark, name)
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    d
  }

  private def model(grp: String, c: Double) =
    spark.range(1).select(lit(grp).as("grp"), lit(c).as("coef"))

  test("versions are monotonic across restarts and per model name") {
    val dir = freshDir("registry_spec")
    assert(ModelRegistry.register(spark, dir, "m", model("A", 0.5)) == 1L)
    assert(ModelRegistry.register(spark, dir, "m", model("A", 0.7)) == 2L)
    // a different model name gets its own version sequence
    assert(ModelRegistry.register(spark, dir, "other", model("B", 1.0)) == 1L)
    // "restart": nothing lives in memory — the next version derives from
    // the committed table alone, so a brand-new writer continues at 3
    assert(ModelRegistry.register(spark, dir, "m", model("A", 0.9)) == 3L)

    val l = ModelRegistry.list(spark, dir).collect()
    assert(l.length == 4)
    assert(l.count(_.getAs[Long]("is_latest") == 1L) == 2,
      "exactly one latest row per model name")

    val latest = ModelRegistry.latest(spark, dir, "m").collect()
    assert(latest.length == 1)
    assert(latest.head.getAs[Long]("version") == 3L)
    assert(latest.head.getAs[Double]("coef") == 0.9)
  }

  test("retain keeps the newest N versions; is_latest survives; a pinned " +
    "reader of a GC'd version fails loudly") {
    val dir = freshDir("registry_spec_retain")
    for (v <- 1 to 4)
      ModelRegistry.register(spark, dir, "m", model("A", v / 10.0))
    ModelRegistry.register(spark, dir, "solo", model("B", 1.0))

    val (kept, dropped) = ModelRegistry.retain(spark, dir, keep = 2)
    assert(kept == 3L && dropped == 2L) // m: v3,v4; solo: v1

    val l = ModelRegistry.list(spark, dir).collect()
    assert(l.map(r => (r.getAs[String]("model_name"),
      r.getAs[Long]("version"))).toSet ==
      Set(("m", 3L), ("m", 4L), ("solo", 1L)))
    // is_latest survives GC: still exactly one latest per model, still
    // the newest version
    val latest = ModelRegistry.latest(spark, dir, "m").collect()
    assert(latest.length == 1 && latest.head.getAs[Long]("version") == 4L)
    // the single-version model is untouched (retain never drops below 1)
    assert(ModelRegistry.latest(spark, dir, "solo").count() == 1)

    // a pin to a surviving version resolves
    assert(ModelRegistry.pinned(spark, dir, "m", 3L).count() == 1)
    // a pin to a GC'd version fails loudly — never silent re-resolution
    val e = intercept[NoSuchElementException] {
      ModelRegistry.pinned(spark, dir, "m", 1L)
    }
    assert(e.getMessage.contains("no version 1"))

    // idempotence: a second retain with nothing to drop commits nothing
    val before = graft.operators.SnapshotTable.versions(spark, dir).last
    val (k2, d2) = ModelRegistry.retain(spark, dir, keep = 2)
    assert(d2 == 0L)
    assert(graft.operators.SnapshotTable.versions(spark, dir).last == before)
    assert(k2 == 3L) // m: v3,v4; solo: v1

    // version assignment still derives from committed state post-GC:
    // the next registration continues the sequence, not a reused number
    assert(ModelRegistry.register(spark, dir, "m", model("A", 0.9)) == 5L)
  }

  test("conditional commit: a stale expectedHead fails loudly, staged " +
    "files are reclaimed, and the interleaved registration survives") {
    import graft.operators.SnapshotTable
    val dir = freshDir("registry_spec_cas")
    ModelRegistry.register(spark, dir, "m", model("A", 0.1)) // v1
    val pinned = SnapshotTable.versions(spark, dir).last     // = 1
    // a registration lands AFTER the maintenance job's snapshot read
    ModelRegistry.register(spark, dir, "late", model("B", 1.0)) // v2
    // the stale rewrite must fail the CAS, not erase 'late'
    val stale = SnapshotTable.read(spark, dir, Some(pinned))
    intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.commit(spark, stale, dir, replace = true,
        expectedHead = Some(pinned))
    }
    assert(ModelRegistry.latest(spark, dir, "late").count() == 1)
    // no torn state: the failed commit left no new version behind
    assert(SnapshotTable.versions(spark, dir).last == 2)
    // a fresh retain (which re-reads the true head) still works and
    // keeps both models
    val (kept, dropped) = ModelRegistry.retain(spark, dir, keep = 1)
    assert(kept == 2L && dropped == 0L)
    // and a CORRECT expectedHead commits fine
    val v = SnapshotTable.commit(spark,
      SnapshotTable.read(spark, dir), dir, replace = true,
      expectedHead = Some(2))
    assert(v == 3)
  }

  test("payloads must not shadow registry columns") {
    val dir = freshDir("registry_spec_shadow")
    intercept[IllegalArgumentException] {
      ModelRegistry.register(spark, dir, "m",
        model("A", 0.5).withColumn("version", lit(9L)))
    }
  }
}
