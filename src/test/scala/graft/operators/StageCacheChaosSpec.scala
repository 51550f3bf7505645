package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Chaos tests for [[StageCache]]'s failure paths: a readable-but-garbage
  * stage directory (partial build crash, manual tampering) must be rebuilt,
  * never served. Pure filesystem — no SparkSession needed.
  */
class StageCacheChaosSpec extends AnyFunSuite {

  private def tempRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_stagecache").toString

  private def payload(dir: String): java.io.File =
    new java.io.File(dir, "part-0.parquet")

  private def goodBuild(marker: String)(dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(payload(dir).toPath, marker)
  }

  test("fresh build publishes payload plus _DONE and reports its cost") {
    val dir = StageCache.dir(tempRoot(), "k1")
    val sec = StageCache.getOrBuild(dir)(goodBuild("v1"))
    assert(sec > 0.0)
    assert(new java.io.File(dir, "_DONE").exists())
    assert(java.nio.file.Files.readString(payload(dir).toPath) == "v1")
  }

  test("cache hit skips the build and reports zero cost") {
    val dir = StageCache.dir(tempRoot(), "k2")
    StageCache.getOrBuild(dir)(goodBuild("v1"))
    var ran = false
    val sec = StageCache.getOrBuild(dir) { d => ran = true; goodBuild("x")(d) }
    assert(sec == 0.0 && !ran)
    assert(java.nio.file.Files.readString(payload(dir).toPath) == "v1")
  }

  test("a readable dir without _DONE (partial publish) is rebuilt") {
    // the crash shape: a stage dir exists and parquet files in it are
    // readable, but the publish invariant (_DONE present) is broken —
    // serving it would return truncated rows
    val dir = StageCache.dir(tempRoot(), "k3")
    goodBuild("half-written")(dir) // no _DONE marker
    var ran = false
    val sec = StageCache.getOrBuild(dir) { d => ran = true; goodBuild("good")(d) }
    assert(ran && sec > 0.0)
    assert(new java.io.File(dir, "_DONE").exists())
    assert(java.nio.file.Files.readString(payload(dir).toPath) == "good")
  }

  test("corruption AFTER a served build is detected on the next lookup") {
    // in-JVM `built` memo must not shadow on-disk garbage: build, then
    // simulate a crash that deletes the marker and truncates the payload
    val dir = StageCache.dir(tempRoot(), "k4")
    StageCache.getOrBuild(dir)(goodBuild("v1"))
    assert(new java.io.File(dir, "_DONE").delete())
    java.nio.file.Files.writeString(payload(dir).toPath, "trunc")
    var ran = false
    StageCache.getOrBuild(dir) { d => ran = true; goodBuild("rebuilt")(d) }
    assert(ran)
    assert(java.nio.file.Files.readString(payload(dir).toPath) == "rebuilt")
    assert(new java.io.File(dir, "_DONE").exists())
  }
}
