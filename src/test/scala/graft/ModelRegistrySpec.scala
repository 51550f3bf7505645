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

  test("payloads must not shadow registry columns") {
    val dir = freshDir("registry_spec_shadow")
    intercept[IllegalArgumentException] {
      ModelRegistry.register(spark, dir, "m",
        model("A", 0.5).withColumn("version", lit(9L)))
    }
  }
}
