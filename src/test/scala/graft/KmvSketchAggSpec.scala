package graft

import graft.functions.{KmvBuffer, KmvSketchAgg}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}

/** Native KMV minima aggregate: buffer semantics (insert/dedup/saturation,
  * merge, serde) plus the distributed contract — partition layout cannot
  * change the sketch, and the aggregate matches a brute-force sort.
  */
class KmvSketchAggSpec extends SparkSpec {

  test("buffer keeps the k smallest distinct values, sorted") {
    val b = new KmvBuffer(4)
    Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 9L).foreach(b.insert)
    assert(b.size == 4)
    assert(b.vals.take(4).toSeq == Seq(1L, 2L, 3L, 7L))
    // a value above the current max of a FULL buffer is rejected
    b.insert(100L)
    assert(b.vals.take(4).toSeq == Seq(1L, 2L, 3L, 7L))
    // a smaller value evicts the max
    b.insert(0L)
    assert(b.vals.take(4).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("merge is the KMV union: k smallest of the parts' union") {
    val a = new KmvBuffer(3)
    Seq(10L, 20L, 30L).foreach(a.insert)
    val b = new KmvBuffer(3)
    Seq(5L, 20L, 40L).foreach(b.insert)
    val agg = KmvSketchAgg(CatLit(0L), 3)
    val m = agg.merge(a, b)
    assert(m.vals.take(m.size).toSeq == Seq(5L, 10L, 20L))
  }

  test("serialize/deserialize round-trips partial state") {
    val agg = KmvSketchAgg(CatLit(0L), 5)
    val b = new KmvBuffer(5)
    Seq(42L, 7L, 99L).foreach(b.insert)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.size == 3)
    assert(back.vals.take(3).toSeq == Seq(7L, 42L, 99L))
  }

  test("aggregate matches brute force and is partition-layout invariant") {
    import spark.implicits._
    // deterministic pseudo-random longs with duplicates, two groups
    val rows = (0 until 5000).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val h = math.abs((i * 2654435761L) % 4096L) // dense → many dupes
      (g, h)
    }
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).distinct.sorted.take(64)
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = rows.toDF("g", "h").repartition(parts)
        .groupBy("g").agg(expr("kmv_sketch_agg(h, 64)").as("mins"))
        .collect().map(r => r.getString(0) ->
          r.getSeq[Long](1).toSeq).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("builder rejects bad arity / non-literal k with a clean error") {
    import spark.implicits._
    val df = Seq(1L).toDF("h")
    // wrong arity
    val e1 = intercept[Exception] {
      df.agg(expr("kmv_sketch_agg(h, 64, 3)")).collect()
    }
    assert(e1.getMessage.contains("kmv_sketch_agg expects"))
    // non-int-literal k (bigint literal)
    val e2 = intercept[Exception] {
      df.agg(expr("kmv_sketch_agg(h, cast(64 as bigint))")).collect()
    }
    assert(e2.getMessage.contains("kmv_sketch_agg expects"))
    // column k
    val e3 = intercept[Exception] {
      df.agg(expr("kmv_sketch_agg(h, h)")).collect()
    }
    assert(e3.getMessage.contains("kmv_sketch_agg expects"))
  }

  test("nulls are skipped; default k is 64") {
    import spark.implicits._
    val df = Seq(Some(5L), None, Some(1L), Some(5L)).toDF("h")
    val out = df.agg(expr("kmv_sketch_agg(h)")).head().getSeq[Long](0)
    assert(out == Seq(1L, 5L))
  }
}
