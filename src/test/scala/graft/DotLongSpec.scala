package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._

class DotLongSpec extends SparkSpec {

  test("dot_long equals the composed lambda form on varied arrays") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = if (i % 7 == 0) 0 else 64
      (Array.fill(n)(rnd.nextLong() % 1000000L),
        Array.fill(n)(rnd.nextLong() % 1000000L))
    }
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      VectorOps.dotL(col("a"), col("b")).as("native"),
      VectorOps.dotLRef(col("a"), col("b")).as("lambda"))
    assert(cmp.filter(col("native") =!= col("lambda")).count() == 0)
    assert(cmp.filter(col("native").isNull).count() == 0)
  }

  test("dot_long null-array input yields null, like the lambda form") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (None: Option[Array[Long]], Some(Array(3L, 4L))),
      (Some(Array(1L, 2L)), Some(Array(3L, 4L))))
      .toDF("a", "b")
    val out = df.select(VectorOps.dotL(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq == Seq(None, None, Some(11L)))
  }

  test("dot_long works in the interpreted (non-codegen) path too") {
    val s = spark
    import s.implicits._
    val prev = s.conf.get("spark.sql.codegen.wholeStage", "true")
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val df = Seq((Array(2L, 3L, 5L), Array(7L, 11L, 13L))).toDF("a", "b")
      assert(df.select(VectorOps.dotL(col("a"), col("b")))
        .head().getLong(0) == 2 * 7 + 3 * 11 + 5 * 13)
    } finally s.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
