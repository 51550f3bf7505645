package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Pins the native shingle_hash32 expression to the composed form it
  * replaces (transform(shingles(text, n), g => hash32(g))) — bit
  * equality on every tokenization shape that exists in the corpus, plus
  * the documented null difference (null vs [], identical under
  * explode). */
class ShingleHashSpec extends SparkSpec {

  private val shapes = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",
    "single",
    "",
    "double  space   runs",
    " leading and trailing ",
    "unicode tök grüß 字符 test",
    "a b c d",
    "repeat repeat repeat repeat")

  private def composed(n: Int) = {
    import TextOps.{hash32, shingles}
    transform(shingles(col("text"), n), g => hash32(g))
  }

  test("native ≡ composed on all shapes, n = 2 and 3") {
    import spark.implicits._
    val df = shapes.toDF("text")
    for (n <- Seq(2, 3)) {
      val rows = df.select(
        composed(n).as("c"),
        TextOps.shingleHashes(col("text"), n).as("h")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
      }
    }
  }

  test("null text: native null, composed empty — identical under explode") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("x y z")).toDF("text")
    val nat = df.select(col("text"),
      explode(TextOps.shingleHashes(col("text"), 2)).as("h")).count()
    val comp = df.select(col("text"),
      explode(composed(2)).as("h")).count()
    assert(nat == comp)
    val natOuter = df.select(col("text"),
      explode_outer(TextOps.shingleHashes(col("text"), 2)).as("h"))
      .collect().map(r => (r.isNullAt(0), r.isNullAt(1))).toSet
    val compOuter = df.select(col("text"),
      explode_outer(composed(2)).as("h"))
      .collect().map(r => (r.isNullAt(0), r.isNullAt(1))).toSet
    assert(natOuter == compOuter)
  }
}
