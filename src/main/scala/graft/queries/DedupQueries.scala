package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.TextOps._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline — graded as
  * first-class components alongside SURVEY §2.
  *
  * Scale design:
  *  - exact dedup = one hash aggregate on the text hash (never the raw text
  *    as shuffle key at 100 TB — hash first, 16 bytes vs KBs);
  *  - MinHash signatures are per-row higher-order expressions (NO shuffle,
  *    no UDF, md5 computed once per shingle);
  *  - LSH banding turns the O(n²) pair space into per-bucket joins — the
  *    only join is on (band_idx, band_hash), and exact Jaccard runs only on
  *    surviving candidates;
  *  - the inverted-index Jaccard (dd5) is the honest quadratic fallback,
  *    bounded by shingle-postings lengths — at 100 TB you run dd3 first and
  *    dd5 only on its candidates.
  */
object DedupQueries {

  private val K = 16          // minhash permutations
  private val Bands = 4       // LSH bands (4 rows each)
  private val SimBits = 16    // simhash width

  val all: Seq[QueryDef] = Seq(

    // DD1: exact duplicate groups (hash-groupBy on content).
    QueryDef(
      "dd1_dedup_exact",
      Some("""SELECT md5(text) AS text_hash, count(*) AS n_copies,
             |  min(doc_id) AS keep_id, max(doc_id) AS last_id
             |FROM documents GROUP BY md5(text)
             |HAVING count(*) > 1""".stripMargin),
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(md5(col("text")).as("text_hash"))
          .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"),
               max("doc_id").as("last_id"))
          .filter(col("n_copies") > 1)),

    // DD2: canonical fingerprint dedup — order/duplication-insensitive
    // fingerprint, then keep-first by id.
    QueryDef(
      "dd2_fingerprint_dedup",
      Some(s"""SELECT ${oFingerprint("text")} AS fp, count(*) AS n_docs,
              |  min(doc_id) AS keep_id
              |FROM documents GROUP BY 1""".stripMargin),
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))),

    // DD3: MinHash + LSH near-duplicate pairs. Shingles hashed ONCE to
    // 32-bit ints (md5 is the cost center; 16 permutations reuse the hash
    // array); bands bucket-joined; candidates verified with exact Jaccard
    // on the distinct hashed-shingle sets; emitted at jaccard >= 0.5.
    QueryDef(
      "dd3_minhash_lsh",
      Some {
        val sigs = minhashParams(K).zipWithIndex.map { case ((a, b), j) =>
          s"${oMinhashSig("hs", a, b)} AS sig$j"
        }.mkString(",\n    ")
        val bandSelects = (0 until Bands).map { bIdx =>
          val parts = (0 until 4).map(r => s"CAST(sig${bIdx * 4 + r} AS VARCHAR)")
            .mkString(" || ',' || ")
          s"SELECT doc_id, $bIdx AS band_idx, md5($parts) AS band_hash FROM sig"
        }.mkString("\n  UNION ALL ")
        s"""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS lst FROM documents),
           |sh AS (
           |  SELECT doc_id,
           |    list_distinct(${oHashAll(oShinglesFromList("lst"))}) AS hs
           |  FROM toks),
           |sig AS (
           |  SELECT doc_id, hs,
           |    $sigs
           |  FROM sh),
           |bands AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           |   AND a.doc_id < b.doc_id)
           |SELECT c.doc_a, c.doc_b,
           |  CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE) /
           |  CAST(len(list_distinct(list_concat(x.hs, y.hs))) AS DOUBLE)
           |    AS jaccard
           |FROM cand c
           |JOIN sh x ON c.doc_a = x.doc_id
           |JOIN sh y ON c.doc_b = y.doc_id
           |WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE) /
           |      CAST(len(list_distinct(list_concat(x.hs, y.hs))) AS DOUBLE)
           |      >= 0.5""".stripMargin
      },
      (s, d) => {
        // persist: the hashed-shingle sets feed four branches of the DAG
        // (bands a/b + jaccard x/y); md5 over every shingle is the cost
        // center and is interpreted (higher-order fn), so compute it once.
        // Tiny frame: one row per doc with an int array.
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            array_distinct(hashAll(shingles(col("text")))).as("hs"))
          .persist()
        val sigCols = minhashParams(K).zipWithIndex.map { case ((a, b), j) =>
          minhashSig(col("hs"), a, b).as(s"sig$j")
        }
        val sig = docs.select(col("doc_id") +: col("hs") +: sigCols: _*)
        val bandStructs = (0 until Bands).map { bIdx =>
          val parts = (0 until 4).map(r => col(s"sig${bIdx * 4 + r}").cast("string"))
          struct(lit(bIdx).as("band_idx"),
                 md5(concat_ws(",", parts: _*)).as("band_hash"))
        }
        val bands = sig
          .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
          .select(col("doc_id"),
                  col("b.band_idx").as("band_idx"),
                  col("b.band_hash").as("band_hash"))
        val a = bands.select(col("doc_id").as("doc_a"),
          col("band_idx"), col("band_hash"))
        val b = bands.select(col("doc_id").as("doc_b"),
          col("band_idx"), col("band_hash"))
        val cand = a.join(b, Seq("band_idx", "band_hash"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        val x = docs.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
        val y = docs.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
        val jac = size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))).cast("double")
        cand.join(x, "doc_a").join(y, "doc_b")
          .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
          .filter(col("jaccard") >= 0.5)
      }),

    // DD4: SimHash signatures + collision groups. Token hashes computed
    // once per row; 16 per-bit weighted sums as higher-order aggregates
    // (frequency-weighted: duplicates of a token count), no shuffle until
    // the final tiny collision groupBy.
    QueryDef(
      "dd4_simhash",
      Some {
        val bitSums = (0 until SimBits).map { i =>
          s"""list_sum(list_transform(hs,
             |      h -> CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END))
             |    AS s$i""".stripMargin
        }.mkString(",\n    ")
        val combine = (0 until SimBits).map { i =>
          s"CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH hs AS (
           |  SELECT doc_id,
           |    list_transform(string_split(text, ' '), t -> ${oHash32("t")})
           |      AS hs
           |  FROM documents),
           |bits AS (
           |  SELECT doc_id,
           |    $bitSums
           |  FROM hs),
           |sigs AS (
           |  SELECT doc_id, CAST($combine AS BIGINT) AS simhash FROM bits)
           |SELECT simhash, count(*) AS n_docs, min(doc_id) AS keep_id
           |FROM sigs GROUP BY simhash""".stripMargin
      },
      (s, d) => {
        val hs = Tables.documents(s, d).select(col("doc_id"),
          transform(tokens(col("text")), t => hash32(t)).as("hs"))
        val bitCols = (0 until SimBits).map { i =>
          aggregate(col("hs"), lit(0L), (acc, h) =>
            acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L)
              .otherwise(-1L)).as(s"s$i")
        }
        val bits = hs.select(col("doc_id") +: bitCols: _*)
        val sim = (0 until SimBits).map { i =>
          when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _)
        bits.select(col("doc_id"), sim.cast("long").as("simhash"))
          .groupBy("simhash")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      }),

    // DD5: inverted-index n-gram Jaccard — exact pairwise similarity via a
    // postings self-join on shingles (candidates = pairs sharing >= 1
    // shingle), the quadratic-fallback dedup.
    QueryDef(
      "dd5_ngram_jaccard",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split(text, ' ') AS lst FROM documents),
              |sets AS (
              |  SELECT doc_id,
              |    list_distinct(${oHashAll(oShinglesFromList("lst"))}) AS sh
              |  FROM toks),
              |sz AS (SELECT doc_id, len(sh) AS n FROM sets),
              |posts AS (SELECT doc_id, unnest(sh) AS s FROM sets),
              |common AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
              |  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT cm.doc_a, cm.doc_b,
              |  CAST(cm.c AS DOUBLE) / CAST(sa.n + sb.n - cm.c AS DOUBLE)
              |    AS jaccard
              |FROM common cm
              |JOIN sz sa ON cm.doc_a = sa.doc_id
              |JOIN sz sb ON cm.doc_b = sb.doc_id
              |WHERE CAST(cm.c AS DOUBLE) / CAST(sa.n + sb.n - cm.c AS DOUBLE)
              |      >= 0.4""".stripMargin),
      (s, d) => {
        // persist for the same reason as dd3: one md5 pass, four consumers.
        val sets = Tables.documents(s, d)
          .select(col("doc_id"),
            array_distinct(hashAll(shingles(col("text")))).as("sh"))
          .persist()
        val sz = sets.select(col("doc_id"), size(col("sh")).as("n"))
        val posts = sets.select(col("doc_id"), explode(col("sh")).as("s"))
        val common = posts.as("a")
          .join(posts.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("c"))
        val jac = col("c").cast("double") /
          (col("na") + col("nb") - col("c")).cast("double")
        common
          .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
          .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
          .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
          .filter(col("jaccard") >= 0.4)
      }),
  )
}
