package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** BloomPrune contracts: no false negatives (pruned join ≡ plain join,
  * the j11 oracle property, here over random key universes), bounded
  * false-positive rate, and fixed filter size.
  */
class BloomPruneSpec extends SparkSpec {

  import spark.implicits._

  private def forAll[A](gen: Gen[A], runs: Int = 5)(body: A => Unit): Unit =
    (1L to runs.toLong).foreach { seed =>
      gen.apply(Gen.Parameters.default, Seed(seed)).foreach(body)
    }

  test("dim members always pass mightContain (no false negatives)") {
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000000L, 1000000L))) { keys =>
      val dim = keys.distinct.toDF("k")
      val kept = dim
        .crossJoin(broadcast(BloomPrune.build(dim, "k")))
        .filter(BloomPrune.mightContain(col("k"), col("__bloom")))
      assert(kept.count() == keys.distinct.size.toLong)
    }
  }

  test("pruned join equals the plain join over random fact/dim keys") {
    val gen = for {
      factKeys <- Gen.listOfN(200, Gen.chooseNum(0L, 400L))
      dimKeys <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 400L)).map(_.take(30))
    } yield (factKeys, dimKeys)
    forAll(gen, runs = 3) { case (factKeys, dimKeys) =>
      val fact = factKeys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "payload")
      val dim = dimKeys.distinct.toDF("dk")
      val plain = fact.join(dim, col("k") === col("dk"))
        .select("k", "payload", "dk")
      val pruned = BloomPrune.prune(fact, "k", dim, "dk")
        .join(dim, col("k") === col("dk"))
        .select("k", "payload", "dk")
      assert(pruned.exceptAll(plain).isEmpty &&
        plain.exceptAll(pruned).isEmpty)
    }
  }

  test("false-positive rate is small at the designed load") {
    // 300 member keys, 10k disjoint probes: fpp ≈ (1-e^(-K n/M))^K ≈ 0.8%
    val dim = (0L until 300L).toDF("k")
    val probes = (1000000L until 1010000L).toDF("k")
    val fp = probes
      .crossJoin(broadcast(BloomPrune.build(dim, "k")))
      .filter(BloomPrune.mightContain(col("k"), col("__bloom")))
      .count()
    assert(fp < 10000 * 0.05, s"false-positive count $fp of 10000")
    assert(fp > 0) // sanity: a filter that never false-positives at this
                   // load would mean the probes aren't hashing
  }

  test("filter size is fixed: at most M/64 map entries regardless of keys") {
    val dim = (0L until 5000L).toDF("k")
    val words = BloomPrune.build(dim, "k")
      .select(size(col("__bloom"))).as[Int].head()
    assert(words <= BloomPrune.M / 64)
  }
}
