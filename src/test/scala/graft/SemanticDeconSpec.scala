package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{SemanticDecon, SignLsh, VectorOps}

/** Detection semantics of the semantic decontamination audit on PLANTED
  * leaks (the oracle row sim17 proves cross-engine parity on the real
  * fixture; this spec proves the audit actually catches what it exists
  * to catch): an exact copy of a benchmark vector flags at any τ < 1, a
  * slightly perturbed copy (the paraphrase analog) flags at the
  * operating τ, and an unrelated vector keeps.
  */
class SemanticDeconSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = VectorOps.Dim
  private val Tables = 4
  private val Bits = 8

  /** Deterministic pseudo-random unit-scale vector. */
  private def vec(seed: Long): Array[Float] = {
    var h = seed * 0x9E3779B97F4A7C15L + 1
    Array.tabulate(Dim) { _ =>
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      (((h >>> 11).toDouble / (1L << 53).toDouble) - 0.5).toFloat
    }
  }

  private def frame(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("id", "embedding")
      .select(col("id"), VectorOps.quant(col("embedding")).as("qv"))
      .withColumn("nsq",
        aggregate(col("qv"), lit(0L), (acc, x) => acc + x * x))

  test("planted exact and perturbed leaks flag; unrelated vectors keep") {
    // benchmark: 3 vectors; corpus: an exact copy of bench 0, a
    // perturbed copy of bench 1 (every component nudged 0.1% — a
    // paraphrase-grade change), and 50 unrelated vectors
    val bench = frame(Seq(100L, 101L, 102L).map(i => i -> vec(i)))
    val perturbed = vec(101L).map(x => x * 1.001f + 1e-4f)
    val corpus = frame(
      Seq(0L -> vec(100L), 1L -> perturbed) ++
        (2L to 51L).map(i => i -> vec(i + 1000)))
    def buckets(df: DataFrame) = SignLsh.bucketize(
      df.select("id", "qv"), "id", "qv", Tables, Bits, Dim,
      persist = false)
    val out = SemanticDecon.audit(
        buckets(corpus), buckets(bench),
        corpus.select("id", "qv", "nsq"), bench.select("id", "qv", "nsq"),
        tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2),
          r.getBoolean(3))).toMap
    assert(out.size == 52)
    // the exact copy: cosine 1.0 (same quantized vector), flagged
    val (cos0, n0, keep0) = out(0L)
    assert(n0 >= 1 && cos0.exists(_ > 0.9999) && !keep0)
    // the perturbed copy: near-1 cosine, flagged at τ=0.9 (identical
    // sign pattern ⇒ same buckets in every table, so LSH finds it)
    val (cos1, _, keep1) = out(1L)
    assert(cos1.exists(_ > 0.99) && !keep1,
      s"perturbed leak not flagged: $cos1")
    // unrelated vectors keep (random cosines stay far below 0.9)
    assert((2L to 51L).forall(i => out(i)._3),
      "an unrelated vector was flagged")
  }

  test("no bucket collision yields null max_cos, zero candidates, keep") {
    // the bucket bits are coordinate-comparison tests (qv[i] vs qv[j]),
    // so an increasing ramp and a decreasing ramp complement EVERY bit
    // of every table — no bucket can collide (an 8-bit value never
    // equals its complement), forcing the no-candidate path
    val corpus = frame(Seq(0L -> Array.tabulate(Dim)(i =>
      i.toFloat * 0.001f)))
    val bench = frame(Seq(100L -> Array.tabulate(Dim)(i =>
      (Dim - i).toFloat * 0.001f)))
    def buckets(df: DataFrame) = SignLsh.bucketize(
      df.select("id", "qv"), "id", "qv", Tables, Bits, Dim,
      persist = false)
    val r = SemanticDecon.audit(
        buckets(corpus), buckets(bench),
        corpus.select("id", "qv", "nsq"), bench.select("id", "qv", "nsq"),
        tau = 0.9)
      .head()
    assert(r.get(1) == null && r.getLong(2) == 0L && r.getBoolean(3))
  }
}
