package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.TextOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over the corpus duplication graph — the
  * iterative-algorithm family next to [[graft.operators.ConnectedComponents]]
  * (dd7's pointer-jumping clustering).
  *
  * The graph: documents are nodes; an edge connects two documents that share
  * at least one non-overlapping 8-token passage (dd9's passage hashing —
  * reference semantics: Lee et al. 2022 substring duplication; reference
  * corpus curation in `Datos_limpios/` notebooks dedups whole rows only, so
  * this family is beyond-reference training-data tooling). Passages whose
  * document frequency exceeds [[GraphQueries.MaxDf]] are dropped from edge
  * generation (boilerplate guard — a passage in hundreds of docs is a
  * template, not a quotation, and contributes O(df²) edges); df=1 passages
  * cannot form an edge.
  *
  * Scale design:
  *  - The pair space is bounded by Σ df² over passage hashes (df-capped),
  *    never all-pairs; the join keys on the 32-hex md5 passage hash (the
  *    dd9 shuffle shape) and emits 8-byte integer node ids.
  *  - PageRank (g1) runs a fixed-iteration power method: per iteration ONE
  *    co-partitioned equi-join (edges × ranks on src) and ONE hash aggregate
  *    (contributions by dst). Edges are hash-partitioned on src once and
  *    persisted; only the rank table (|V| rows, 3 longs) moves per round.
  *    Lineage is cut per round (the ConnectedComponents doctrine) so 8
  *    rounds never stack 24 joins into one plan.
  *  - Triangle counting (g2) enumerates each triangle exactly once via the
  *    canonical ordering a<b<c (edge list kept only src<dst); at 100 TB the
  *    standard hardening is degree-ordering the edge direction so the join
  *    fan-out is bounded by arboricity, noted at the join site.
  *
  * Cross-engine parity: PageRank mass is integer-quantized on a 1e-12 grid
  * (rank 1.0 ≡ 10^12) and every iteration is PURE integer arithmetic —
  * `r DIV deg` contributions, `(85·Σ) DIV 100` damping, identical truncating
  * division on both engines (all operands positive) — so after any number of
  * iterations the rank longs are bit-identical; the only float is one final
  * de-scale division. The oracle unrolls the 8 iterations as chained CTEs
  * (aggregation over a recursive reference is not portable SQL). Σ headroom:
  * total mass ≤ 10^12, so 85·Σ ≤ 8.5e13 ≪ 2^63.
  */
object GraphQueries {

  /** Passage length in tokens (dd9's unit). */
  private val P = 8
  /** Edge-generation document-frequency cap per passage hash. */
  private val MaxDf = 16
  /** Power-iteration rounds (fixed — the published fixed-K PageRank). */
  private val Iters = 8
  /** Damping on the percent grid: r' = 15%·(1/N) + 85%·Σ contrib. */
  private val DampPct = 85

  /** Oracle CTE preamble: documents → distinct (doc, passage-hash) →
    * df-capped shared-passage edges (both directions) → degrees. */
  private val oGraph =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS lst FROM documents),
       |p AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, CAST(ceil(len(lst) / 8.0) AS INT)),
       |    i -> md5(array_to_string(lst[(i-1)*8+1 : i*8], ' ')))) AS ph
       |  FROM t),
       |pd AS (SELECT DISTINCT doc_id, ph FROM p),
       |okp AS (
       |  SELECT ph FROM pd GROUP BY ph
       |  HAVING count(*) BETWEEN 2 AND $MaxDf),
       |e AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM pd a JOIN okp USING (ph) JOIN pd b USING (ph)
       |  WHERE a.doc_id <> b.doc_id),
       |deg AS (SELECT src AS doc_id, count(*) AS deg FROM e GROUP BY 1)"""
      .stripMargin

  /** Spark side of [[oGraph]]: (edges(src,dst) hash-partitioned on src and
    * persisted, degrees(doc_id,deg)). */
  private def graph(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val chunks = transform(
      sequence(lit(1), ceil(size(col("lst")) / lit(P.toDouble)).cast("int")),
      i => concat_ws(" ", slice(col("lst"), (i - 1) * P + 1, lit(P))))
    val pd = Tables.fanOut(Tables.documents(s, d))
      .select(col("doc_id"), tokens(col("text")).as("lst"))
      .select(col("doc_id"), explode(chunks).as("passage"))
      .select(col("doc_id"), md5(col("passage")).as("ph"))
      .distinct()
    // boilerplate cap: tiny hash-agg dim, joined on the md5 key — the
    // postings join never sees a stop-passage's O(df²) fan-out
    val okp = pd.groupBy("ph").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, MaxDf)).select("ph")
    val edges = pd.select(col("doc_id").as("src"), col("ph"))
      .join(okp, "ph")
      .join(pd.select(col("doc_id").as("dst"), col("ph")), "ph")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .repartition(col("src"))  // iteration joins reuse this partitioning
      .persist()
    val deg = edges.groupBy(col("src").as("doc_id"))
      .agg(count(lit(1)).as("deg"))
    (edges, deg)
  }

  val all: Seq[QueryDef] = Seq(

    // G1: PageRank over the shared-passage graph — authority-based
    // canonical-representative selection for duplicate neighborhoods (the
    // centrality complement to dd7's min-id keeper). Fixed 8-round power
    // iteration on a 1e-12 integer mass grid; every round's rank longs are
    // bit-identical across engines (pure truncating-integer arithmetic),
    // verified end-to-end by the hash compare on rank_q.
    QueryDef(
      "g1_pagerank",
      Some {
        val init =
          s"""n AS (SELECT count(*) AS nn FROM deg),
             |it0 AS (
             |  SELECT doc_id, deg, 1000000000000 // nn AS r
             |  FROM deg CROSS JOIN n)""".stripMargin
        val steps = (1 to Iters).map { k =>
          s"""it$k AS (
             |  SELECT d.doc_id, d.deg,
             |    (15 * (1000000000000 // nn)) // 100 +
             |    ($DampPct * s.contrib) // 100 AS r
             |  FROM (
             |    SELECT e.dst AS doc_id,
             |      CAST(SUM(p.r // p.deg) AS BIGINT) AS contrib
             |    FROM e JOIN it${k - 1} p ON e.src = p.doc_id
             |    GROUP BY e.dst) s
             |  JOIN deg d USING (doc_id) CROSS JOIN n)""".stripMargin
        }
        (Seq(oGraph, init) ++ steps).mkString(",\n") +
          s"""
             |SELECT doc_id, deg, r AS rank_q,
             |  CAST(r AS DOUBLE) / 1000000000000.0 AS score
             |FROM it$Iters""".stripMargin
      },
      (s, d) => {
        val (edges, deg) = graph(s, d)
        // 1-row broadcast frame, never a driver-side collect
        val n = deg.agg(count(lit(1)).as("nn"))
        val base = expr(s"(15 * (1000000000000 DIV nn)) DIV 100")
        var ranks = deg.crossJoin(broadcast(n))
          .select(col("doc_id"), col("deg"),
            expr("1000000000000 DIV nn").as("r"))
          .localCheckpoint(true)
        for (_ <- 1 to Iters) {
          val contrib = edges
            .join(ranks.select(col("doc_id").as("src"),
              col("deg").as("sdeg"), col("r")), "src")
            .groupBy(col("dst").as("doc_id"))
            .agg(sum(expr("r DIV sdeg")).as("contrib"))
          // lineage cut per round (the ConnectedComponents doctrine): the
          // checkpointed frame is |V| rows of 3 longs, never the edges
          ranks = contrib.join(deg, "doc_id").crossJoin(broadcast(n))
            .select(col("doc_id"), col("deg"),
              (base + expr(s"($DampPct * contrib) DIV 100")).as("r"))
            .localCheckpoint(true)
        }
        ranks.select(col("doc_id"), col("deg"), col("r").as("rank_q"),
          (col("r").cast("double") / 1000000000000.0).as("score"))
      }),

    // G2: per-node triangle count + local clustering coefficient over the
    // same graph — the cohesion audit that separates paste-chains (path-
    // shaped, clustering≈0) from mirrored clusters (clique-shaped,
    // clustering≈1) before choosing a dedup keep policy. Each triangle is
    // enumerated exactly once via canonical ordering a<b<c; the
    // coefficient is one division of exact integers (identical IEEE tree
    // both engines).
    QueryDef(
      "g2_triangle_count",
      Some(oGraph +
        s""",
           |eu AS (SELECT src, dst FROM e WHERE src < dst),
           |tri AS (
           |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
           |  FROM eu e1
           |  JOIN eu e2 ON e1.dst = e2.src
           |  JOIN eu e3 ON e3.src = e1.src AND e3.dst = e2.dst),
           |tn AS (
           |  SELECT node, count(*) AS tri FROM (
           |    SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY 1)
           |SELECT d.doc_id, d.deg,
           |  CAST(COALESCE(tn.tri, 0) AS BIGINT) AS triangles,
           |  CASE WHEN d.deg >= 2 THEN
           |    CAST(2 * COALESCE(tn.tri, 0) AS DOUBLE) /
           |    (CAST(d.deg AS DOUBLE) * CAST(d.deg - 1 AS DOUBLE))
           |  ELSE CAST(0.0 AS DOUBLE) END AS clustering
           |FROM deg d LEFT JOIN tn ON tn.node = d.doc_id""".stripMargin),
      (s, d) => {
        val (edges, deg) = graph(s, d)
        // canonical direction: every triangle {a<b<c} appears exactly once
        // as (a→b, b→c, a→c). At 100 TB, orient by (degree, id) instead of
        // bare id so high-degree hubs never fan out (arboricity bound).
        val eu = edges.filter(col("src") < col("dst"))
        val tri = eu.select(col("src").as("a"), col("dst").as("b"))
          .join(eu.select(col("src").as("b"), col("dst").as("c")), "b")
          .join(eu.select(col("src").as("a"), col("dst").as("c")),
            Seq("a", "c"))
        val tn = tri
          .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("tri"))
        val t = coalesce(col("tri"), lit(0L))
        deg.join(tn, deg("doc_id") === tn("node"), "left")
          .select(col("doc_id"), col("deg"), t.as("triangles"),
            when(col("deg") >= 2,
              (t * 2).cast("double") /
                (col("deg").cast("double") *
                 (col("deg") - 1).cast("double")))
              .otherwise(lit(0.0)).as("clustering"))
      })
  )
}
