package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.TextOps.{hash32, oHash32}
import org.apache.spark.sql.functions._

/** Multimodal-column metadata operators — the oracle-verifiable half of the
  * media pipeline ([[graft.operators.Multimodal]] carries the mapPartitions
  * decode/frame plumbing, spec-covered since no codecs exist in this env).
  *
  * The queries here exercise exactly what a 100 TB media lakehouse does
  * BEFORE any codec runs: treat payloads as opaque `binary`, compute sizes
  * and content checksums, and pick deterministic seeded sample offsets per
  * media row (the frame-sampling schedule). All pure columnar expressions
  * — the payload bytes never cross a shuffle, and a metadata-only
  * projection prunes the binary column at the Parquet scan.
  */
object MultimodalQueries {

  val all: Seq[QueryDef] = Seq(

    // MM1: media metadata + deterministic offset-seeded sampling. The media
    // table is derived from `documents` (payload = UTF-8 text bytes — the
    // only binary-able corpus in the fixture set; kind cycles image/audio/
    // video by id). Per media row: byte size, md5 checksum, then 4 sample
    // offsets seeded by the portable hash32 of the id (stride 9973) and the
    // code point sampled at each offset — the deterministic analog of "grab
    // k frames at reproducible positions". Both engines replay the same
    // hash and the same 1-based substr, so the row set is bit-exact.
    //
    // Scale shape: one projection + a 4-element explode, no shuffle at all;
    // checksum/size are the per-file audit columns a media manifest keeps,
    // and the sample schedule is recomputable anywhere without the payload.
    QueryDef(
      "mm1_media_metadata",
      Some(s"""WITH media AS (
              |  SELECT doc_id AS media_id,
              |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              |         ELSE 'video' END AS kind,
              |    encode(text) AS payload, text
              |  FROM documents),
              |meta AS (
              |  SELECT media_id, kind,
              |    CAST(octet_length(payload) AS BIGINT) AS n_bytes,
              |    md5(text) AS checksum,
              |    CAST(length(text) AS BIGINT) AS n_chars, text
              |  FROM media
              |  WHERE length(text) >= 1),
              |f AS (SELECT unnest(generate_series(0, 3)) AS frame_idx),
              |s AS (
              |  SELECT m.*, f.frame_idx,
              |    (${oHash32("CAST(media_id AS VARCHAR)")} +
              |      frame_idx * 9973) % n_chars + 1 AS off
              |  FROM meta m CROSS JOIN f)
              |SELECT media_id, kind, n_bytes, checksum,
              |  CAST(frame_idx AS BIGINT) AS frame_idx,
              |  CAST(off AS BIGINT) AS off,
              |  CAST(ascii(substr(text, CAST(off AS INTEGER), 1)) AS BIGINT)
              |    AS sample_cp
              |FROM s""".stripMargin),
      (s, d) => {
        val meta = Tables.documents(s, d).select(
          col("doc_id").as("media_id"),
          when(pmod(col("doc_id"), lit(3)) === 0, "image")
            .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
            .otherwise("video").as("kind"),
          expr("octet_length(cast(text as binary))").cast("long")
            .as("n_bytes"),
          md5(col("text").cast("binary")).as("checksum"),
          length(col("text")).cast("long").as("n_chars"),
          col("text"))
          .filter(length(col("text")) >= 1)
        meta
          .select(col("media_id"), col("kind"), col("n_bytes"),
            col("checksum"), col("n_chars"), col("text"),
            explode(sequence(lit(0), lit(3))).as("frame_idx"))
          .withColumn("off",
            pmod(hash32(col("media_id").cast("string")) +
              col("frame_idx") * 9973L, col("n_chars")) + 1)
          .select(col("media_id"), col("kind"), col("n_bytes"),
            col("checksum"),
            col("frame_idx").cast("long").as("frame_idx"),
            col("off").cast("long").as("off"),
            ascii(expr("substr(text, cast(off as int), 1)")).cast("long")
              .as("sample_cp"))
      })
  )
}
