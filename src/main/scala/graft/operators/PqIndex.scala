package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search") — the third ANN scale path beside [[SignLsh]]
  * (hash buckets) and [[IvfIndex]] (partition pruning), and the one that
  * buys MEMORY: a 64-dim vector (256 B raw, 512 B quantized long) encodes
  * to M = 8 sub-codes of K = 16 codewords — 8 nibbles — so the scan side
  * of a query touches ~1/64th of the bytes. Composed with the IVF coarse
  * layer this is IVF-ADC, the standard billion-vector layout: coarse
  * partition prune → asymmetric-distance scan over codes → exact rerank
  * of the survivor pool.
  *
  * Asymmetric distance computation (ADC): the QUERY stays unquantized
  * (here: on the exact 1e-6 integer grid); per subspace it precomputes
  * its inner product with each of the K codewords (a lookup table, M×K
  * longs), and a candidate's approximate score is the sum of M table
  * lookups selected by its codes — no per-pair vector math at all.
  *
  * Codebooks are PLAN-TIME integer constants on the same grid as the
  * data (the [[IvfIndex]] doctrine: production trains them with k-means;
  * correctness semantics — deterministic argmin encode with first-index
  * tie-break, exact integer lookups — are identical either way, and
  * fixed constants make every step replayable bit-for-bit by the DuckDB
  * oracle). All arithmetic stays in long range: axes ≤ ~3e5 (data) /
  * 3e5 (codewords), sub-dot ≤ 8·9e10 ≈ 7e11, ADC sum ≤ 6e12 « 2^53 —
  * so even the long→double casts at the end are exact on both engines.
  */
object PqIndex {

  val M = 8   // subspaces
  val K = 16  // codewords per subspace (4-bit codes)

  /** Deterministic codeword axes on the quantized grid, in [-3e5, 3e5]
    * (LCG over the flattened (m, k, axis) index — fixed plan constants,
    * see scaladoc). */
  def codeword(m: Int, k: Int, sub: Int): IndexedSeq[Long] =
    (0 until sub).map { a =>
      val idx = (m * K + k) * sub + a
      ((1103515245L * idx + 54321L) % 600001L) - 300000L
    }

  def books(dim: Int): Seq[Seq[Seq[Long]]] = {
    val sub = dim / M
    (0 until M).map(m => (0 until K).map(k => codeword(m, k, sub): Seq[Long]))
  }

  private def booksLit(dim: Int) = typedLit(books(dim))
  private def oBooks(dim: Int): String =
    books(dim).map(_.map(_.mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** Per-subspace squared distances of `qv` to every codeword:
    * array(M) of array(K) of long. Encode = argmin per subspace. */
  def dls(qv: Column, dim: Int): Column = {
    val sub = dim / M
    transform(sequence(lit(0), lit(M - 1)), m => {
      val sv = slice(qv, m * sub + 1, lit(sub))
      transform(element_at(booksLit(dim), (m + 1).cast("int")), w =>
        aggregate(zip_with(sv, w, (x, c) => (x - c) * (x - c)),
          lit(0L), (a, v) => a + v))
    })
  }

  /** PQ codes from [[dls]]: per-subspace argmin, ties to the first
    * (lowest) codeword index. array(M) of long in [0, K). */
  def encode(dlss: Column): Column =
    transform(dlss, l => array_position(l, array_min(l)) - 1)

  /** ADC lookup tables for a query: per-subspace inner products with
    * every codeword — array(M) of array(K) of long. */
  def luts(qv: Column, dim: Int): Column = {
    val sub = dim / M
    transform(sequence(lit(0), lit(M - 1)), m => {
      val sv = slice(qv, m * sub + 1, lit(sub))
      transform(element_at(booksLit(dim), (m + 1).cast("int")), w =>
        aggregate(zip_with(sv, w, (x, c) => x * c),
          lit(0L), (a, v) => a + v))
    })
  }

  /** Approximate inner product: sum of the M lookups the codes select. */
  def adc(codes: Column, lutsC: Column): Column =
    aggregate(
      zip_with(lutsC, codes, (l, c) => element_at(l, (c + 1).cast("int"))),
      lit(0L), (a, v) => a + v)

  // ---- DuckDB oracle texts (same expression shapes) ----

  def oracleDls(qv: String, dim: Int): String = {
    val sub = dim / M
    s"""list_transform(generate_series(0, ${M - 1}), m ->
       |    list_transform(${oBooks(dim)}[m + 1], w ->
       |      list_sum(list_transform(generate_series(1, $sub), i ->
       |        ($qv[m * $sub + i] - w[i]) * ($qv[m * $sub + i] - w[i])))))"""
      .stripMargin
  }

  def oracleEncode(dlss: String): String =
    s"list_transform($dlss, l -> list_position(l, list_min(l)) - 1)"

  def oracleLuts(qv: String, dim: Int): String = {
    val sub = dim / M
    s"""list_transform(generate_series(0, ${M - 1}), m ->
       |    list_transform(${oBooks(dim)}[m + 1], w ->
       |      list_sum(list_transform(generate_series(1, $sub), i ->
       |        $qv[m * $sub + i] * w[i]))))""".stripMargin
  }

  def oracleAdc(luts: String, codes: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, $M), m -> " +
      s"$luts[m][$codes[m] + 1])) AS BIGINT)"
}
