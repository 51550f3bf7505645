package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the
  * diversification rerank that sits on top of an ANN candidate pool:
  * greedily pick the candidate maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` — relevance traded
  * against redundancy with what is already selected.
  *
  * Scale shape: the greedy loop is inherently sequential PER QUERY but
  * embarrassingly parallel ACROSS queries — so it runs as
  * `groupByKey(query).flatMapGroups` over the candidate pool, one
  * bounded group (≤ pool size R) per query in executor memory, never on
  * the driver. The pool comes from an ANN stage (sim1/sim2/sim4/sim6),
  * so the quadratic-in-R similarity work is bounded by construction
  * (R ~ 50-100), independent of corpus size.
  *
  * Determinism: quantized integer vectors (the SimilarityQueries grid),
  * exact integer dots, ties broken by candidate id — byte-stable across
  * runs and partitionings.
  */
object Mmr {

  final case class Cand(query_id: Long, cand_id: Long, rel: Double,
                        qv: Array[Long])
  final case class Pick(query_id: Long, cand_id: Long, rank: Int,
                        rel: Double, mmr_score: Double)

  private def cosine(a: Array[Long], b: Array[Long]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Greedy MMR over one query's pool. Pure function — unit-testable
    * without Spark. */
  def greedy(pool: Seq[Cand], k: Int, lambda: Double): Seq[Pick] = {
    val remaining = scala.collection.mutable.ArrayBuffer(
      pool.sortBy(c => (-c.rel, c.cand_id)): _*)
    val picks = scala.collection.mutable.ArrayBuffer.empty[Pick]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Cand]
    while (picks.length < k && remaining.nonEmpty) {
      var bestIdx = 0; var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < remaining.length) {
        val c = remaining(i)
        val redundancy =
          if (chosen.isEmpty) 0.0
          else chosen.map(s => cosine(c.qv, s.qv)).max
        val score = lambda * c.rel - (1.0 - lambda) * redundancy
        // strict > with a (score, -cand_id) tiebreak: first index wins on
        // exact ties because remaining is (rel desc, id) ordered
        if (score > bestScore ||
            (score == bestScore && c.cand_id < remaining(bestIdx).cand_id)) {
          bestScore = score; bestIdx = i
        }
        i += 1
      }
      val c = remaining.remove(bestIdx)
      chosen += c
      picks += Pick(c.query_id, c.cand_id, picks.length + 1, c.rel, bestScore)
    }
    picks.toSeq
  }

  /** Distributed MMR: `pool` carries (query_id, cand_id, rel, qv); one
    * greedy pass per query group. */
  def rerank(pool: DataFrame, k: Int, lambda: Double): Dataset[Pick] = {
    val spark = pool.sparkSession
    import spark.implicits._
    pool.select(col("query_id"), col("cand_id"), col("rel"), col("qv"))
      .as[Cand]
      .groupByKey(_.query_id)
      .flatMapGroups((_: Long, it: Iterator[Cand]) =>
        greedy(it.toSeq, k, lambda).iterator)
  }
}
