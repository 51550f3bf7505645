package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A12 — the true RANDOM sampling surface (`distinct().orderBy(rand())
  * .limit(k)`, Procesamiento_fase_1.ipynb:105), which is deliberately NOT
  * an oracle row: DuckDB cannot replay Spark's XORShiftRandom, so the
  * hash-compare gate would be vacuous (pl7_hash_sample is the
  * deterministic substitute the board verifies). What IS pinnable — and
  * what production reproducibility actually rests on — lives here:
  * seeded determinism, the statistical envelope, and the exactly-k /
  * no-duplicate contracts.
  */
class RandomSampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 10000L).toDF("id")

  test("orderBy(rand(seed)).limit(k): same seed = same rows, k exact") {
    def pick(seed: Long) = ids.orderBy(rand(seed), col("id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val a = pick(75L)
    assert(a == pick(75L)) // reproducible run-to-run, same layout
    assert(a.length == 10 && a.distinct.length == 10)
    assert(a != pick(76L)) // the seed is live, not ignored
  }

  test("sample(fraction, seed) is reproducible and lands in the envelope") {
    def run(seed: Long) =
      ids.sample(withReplacement = false, 0.1, seed)
        .collect().map(_.getLong(0)).toSeq
    val a = run(42L)
    assert(a == run(42L))
    assert(a.distinct.length == a.length) // without replacement
    // n=10000, p=0.1 → σ=30; ±6σ keeps false alarms out of CI forever
    assert(math.abs(a.length - 1000) < 180, s"got ${a.length}")
  }

  test("A13 shape with a live seed: per-group rank over rand(seed)") {
    val df = (1L to 2000L).map(i => (s"g${i % 4}", i)).toDF("g", "id")
    def pick(seed: Long) = df.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy(rand(seed), col("id"))))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val a = pick(75L)
    assert(a == pick(75L))
    assert(a.groupBy(_._1).forall(_._2.size == 5)) // exactly 5 per group
  }
}
