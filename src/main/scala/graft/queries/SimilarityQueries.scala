package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Cross-engine float parity: float dot products accumulate differently per
  * engine, so embeddings are quantized to a 1e-6 integer grid first
  * (`floor(x*1e6 + 0.5)` — identical IEEE ops both sides) and all inner
  * products/norms are EXACT integer arithmetic (64 dims × (3e5)² ≈ 6e12,
  * far under 2^53). Cosine then derives through one identical expression
  * tree. Semantically this is cosine similarity at 1e-6 precision.
  *
  * Scale design: sim1 is the brute-force baseline — broadcast the (small)
  * query set against the full corpus, per-partition heap via
  * row_number+filter (TakeOrdered shape), no all-pairs shuffle. sim2 is the
  * scale path: sign-LSH buckets (axis hyperplanes on the first 8 dims)
  * restrict candidates to one bucket before scoring — the IVF-style
  * partition-pruned search.
  */
object SimilarityQueries {

  private val NQ = 5   // query vectors: vec_id < NQ
  private val TopK = 10

  /** Quantized embedding as array<long>/list<BIGINT>. */
  private def quant(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 1000000.0 + 0.5).cast("long"))
  private val oQuant =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"

  private def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
  private def normSq(a: Column): Column = dotL(a, a)

  private val oDot =
    "list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * c.qv[i]))"
  private val oNorm = (t: String) =>
    s"list_sum(list_transform($t.qv, v -> v * v))"

  val all: Seq[QueryDef] = Seq(

    // SIM1: brute-force cosine top-k for a query subset.
    QueryDef(
      "sim1_cosine_topk",
      Some(s"""WITH qv AS (
              |  SELECT vec_id, $oQuant AS qv FROM embeddings),
              |scored AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              |    CAST($oDot AS DOUBLE) /
              |      (sqrt(CAST(${oNorm("q")} AS DOUBLE)) *
              |       sqrt(CAST(${oNorm("c")} AS DOUBLE))) AS cosine
              |  FROM qv q JOIN qv c ON c.vec_id <> q.vec_id
              |  WHERE q.vec_id < $NQ)
              |SELECT query_id, cand_id, cosine FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |    ORDER BY cosine DESC, cand_id) AS rn
              |  FROM scored) WHERE rn <= $TopK""".stripMargin),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), quant(col("embedding")).as("qv"))
        val q = emb.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("query_id"), col("qv").as("qv_q"))
        val c = emb.select(col("vec_id").as("cand_id"), col("qv").as("qv_c"))
        val cosine = dotL(col("qv_q"), col("qv_c")).cast("double") /
          (sqrt(normSq(col("qv_q")).cast("double")) *
           sqrt(normSq(col("qv_c")).cast("double")))
        val scored = broadcast(q).crossJoin(c)
          .filter(col("cand_id") =!= col("query_id"))
          .select(col("query_id"), col("cand_id"), cosine.as("cosine"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("cand_id"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= TopK)
          .select("query_id", "cand_id", "cosine")
      }),

    // SIM2: sign-LSH bucketed ANN — candidates restricted to the query's
    // bucket (8 axis-hyperplane bits), then exact scoring inside the bucket.
    QueryDef(
      "sim2_ann_lsh",
      Some {
        val oBucket = (0 until 8).map { i =>
          s"(CASE WHEN qv[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH qv AS (
           |  SELECT vec_id, $oQuant AS qv FROM embeddings),
           |bk AS (
           |  SELECT vec_id, qv, CAST($oBucket AS BIGINT) AS bucket FROM qv),
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.bucket,
           |    CAST($oDot AS DOUBLE) /
           |      (sqrt(CAST(${oNorm("q")} AS DOUBLE)) *
           |       sqrt(CAST(${oNorm("c")} AS DOUBLE))) AS cosine
           |  FROM bk q JOIN bk c
           |    ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < $NQ)
           |SELECT query_id, cand_id, bucket, cosine FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY cosine DESC, cand_id) AS rn
           |  FROM scored) WHERE rn <= $TopK""".stripMargin
      },
      (s, d) => {
        val bucketOf: Column => Column = qv => (0 until 8).map { i =>
          when(element_at(qv, i + 1) >= 0L, lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _).cast("long")
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), quant(col("embedding")).as("qv"))
          .withColumn("bucket", bucketOf(col("qv")))
        val q = emb.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("query_id"), col("qv").as("qv_q"),
                  col("bucket"))
        val c = emb.select(col("vec_id").as("cand_id"), col("qv").as("qv_c"),
                  col("bucket").as("bucket_c"))
        val cosine = dotL(col("qv_q"), col("qv_c")).cast("double") /
          (sqrt(normSq(col("qv_q")).cast("double")) *
           sqrt(normSq(col("qv_c")).cast("double")))
        val scored = broadcast(q)
          .join(c, col("bucket") === col("bucket_c") &&
                   col("cand_id") =!= col("query_id"))
          .select(col("query_id"), col("cand_id"), col("bucket"),
                  cosine.as("cosine"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("cand_id"))
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= TopK)
          .select("query_id", "cand_id", "bucket", "cosine")
      }),

    // SIM3: pairwise high-similarity detection (embedding near-dup dedup) —
    // all pairs above the similarity threshold within sign-LSH buckets, the
    // embedding-based near-duplicate operator. (Threshold 0.4 because the
    // synthetic corpus has no planted embedding near-dups — max pairwise
    // cosine is ~0.6 — and an always-empty result would verify nothing.)
    QueryDef(
      "sim3_embedding_neardup",
      Some {
        val oBucket = (0 until 8).map { i =>
          s"(CASE WHEN qv[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH qv AS (
           |  SELECT vec_id, $oQuant AS qv,
           |    CAST($oBucket AS BIGINT) AS bucket
           |  FROM embeddings)
           |SELECT q.vec_id AS id_a, c.vec_id AS id_b,
           |  CAST($oDot AS DOUBLE) /
           |    (sqrt(CAST(${oNorm("q")} AS DOUBLE)) *
           |     sqrt(CAST(${oNorm("c")} AS DOUBLE))) AS cosine
           |FROM qv q JOIN qv c
           |  ON q.bucket = c.bucket AND q.vec_id < c.vec_id
           |WHERE CAST($oDot AS DOUBLE) /
           |    (sqrt(CAST(${oNorm("q")} AS DOUBLE)) *
           |     sqrt(CAST(${oNorm("c")} AS DOUBLE))) >= 0.4""".stripMargin
      },
      (s, d) => {
        val bucketOf: Column => Column = qv => (0 until 8).map { i =>
          when(element_at(qv, i + 1) >= 0L, lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _).cast("long")
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), quant(col("embedding")).as("qv"))
          .withColumn("bucket", bucketOf(col("qv")))
        val a = emb.select(col("vec_id").as("id_a"), col("qv").as("qv_q"),
          col("bucket"))
        val b = emb.select(col("vec_id").as("id_b"), col("qv").as("qv_c"),
          col("bucket").as("bucket_b"))
        val cosine = dotL(col("qv_q"), col("qv_c")).cast("double") /
          (sqrt(normSq(col("qv_q")).cast("double")) *
           sqrt(normSq(col("qv_c")).cast("double")))
        a.join(b, col("bucket") === col("bucket_b") &&
                  col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), cosine.as("cosine"))
          .filter(col("cosine") >= 0.4)
      }),
  )
}
