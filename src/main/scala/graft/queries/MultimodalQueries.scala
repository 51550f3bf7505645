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
      }),

    // MM2: kind-partitioned byte/duration rollup — the media-manifest audit
    // a lakehouse runs per modality: row counts, total/max/mean payload
    // bytes, and summed durations (durations derive deterministically from
    // content length per kind: audio 250 ms/char, video 40 ms/char, image
    // none — the stand-in for codec-probed durations, which the metadata
    // table would carry at ingest). One hash aggregate over a metadata-only
    // projection: the payload column itself is never read (columnar prune),
    // never shuffled — the shuffle carries |kinds| partial rows.
    //
    // Parity: counts/sums/max are exact longs; the single double
    // (avg_bytes) is one division of exact-long casts — identical IEEE
    // trees both engines. NULL duration sums (image) stay NULL on both.
    QueryDef(
      "mm2_kind_rollup",
      Some("""WITH media AS (
             |  SELECT doc_id AS media_id,
             |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |         ELSE 'video' END AS kind,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |    CAST(length(text) AS BIGINT) AS n_chars
             |  FROM documents),
             |d AS (
             |  SELECT media_id, kind, n_bytes,
             |    CASE kind WHEN 'audio' THEN n_chars * 250
             |              WHEN 'video' THEN n_chars * 40 END AS duration_ms
             |  FROM media)
             |SELECT kind,
             |  CAST(count(*) AS BIGINT) AS n_media,
             |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
             |  CAST(max(n_bytes) AS BIGINT) AS max_bytes,
             |  CAST(SUM(n_bytes) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS avg_bytes,
             |  CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms,
             |  CAST(count(duration_ms) AS BIGINT) AS n_with_duration
             |FROM d GROUP BY kind""".stripMargin),
      (s, d) => {
        val media = Tables.documents(s, d).select(
          col("doc_id").as("media_id"),
          when(pmod(col("doc_id"), lit(3)) === 0, "image")
            .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
            .otherwise("video").as("kind"),
          expr("octet_length(cast(text as binary))").cast("long")
            .as("n_bytes"),
          length(col("text")).cast("long").as("n_chars"))
          .withColumn("duration_ms",
            when(col("kind") === "audio", col("n_chars") * 250L)
              .when(col("kind") === "video", col("n_chars") * 40L))
        media.groupBy("kind").agg(
          count(lit(1)).cast("long").as("n_media"),
          sum("n_bytes").cast("long").as("total_bytes"),
          max("n_bytes").cast("long").as("max_bytes"),
          (sum("n_bytes").cast("double") / count(lit(1)).cast("double"))
            .as("avg_bytes"),
          sum("duration_ms").cast("long").as("total_duration_ms"),
          count(col("duration_ms")).cast("long").as("n_with_duration"))
      }),

    // MM3: sampled-offset → embedding-vector association (frame→vector
    // join): each media row's 4 deterministic sample offsets (the mm1
    // schedule) map to a vector id in the embeddings table — the shape of
    // "look up the precomputed CLIP/spectrogram embedding for each sampled
    // frame". The id mapping hashes (media_id, frame_idx) onto the dense
    // [0, n_vecs) key space; n_vecs rides a 1-row broadcast (never
    // collected), and the association is a plain equi-join on vec_id —
    // broadcast at fixture scale, the standard vec_id shuffle join when
    // the vector table is 100 TB-large. Payload bytes appear nowhere.
    //
    // Parity: hash32 replays identically on both engines, both operands of
    // `%` are non-negative so `%`/pmod agree, and every output column is an
    // exact long (the embedding itself is represented by its width — raw
    // float passthrough is avoided entirely).
    QueryDef(
      "mm3_frame_vector_join",
      Some(s"""WITH n AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM embeddings),
              |f AS (SELECT unnest(generate_series(0, 3)) AS frame_idx),
              |fr AS (
              |  SELECT d.doc_id AS media_id,
              |    CAST(f.frame_idx AS BIGINT) AS frame_idx,
              |    (${oHash32("'fv:' || CAST(d.doc_id AS VARCHAR)")} +
              |      f.frame_idx * 2654435761) % n.n_vecs AS vec_id
              |  FROM documents d CROSS JOIN f CROSS JOIN n)
              |SELECT fr.media_id, fr.frame_idx, fr.vec_id,
              |  CAST(e.label AS BIGINT) AS label,
              |  CAST(len(e.embedding) AS BIGINT) AS dim
              |FROM fr JOIN embeddings e ON fr.vec_id = e.vec_id""".stripMargin),
      (s, d) => {
        val nv = Tables.embeddings(s, d)
          .agg(count(lit(1)).cast("long").as("n_vecs"))
        val frames = Tables.documents(s, d)
          .select(col("doc_id").as("media_id"),
            explode(sequence(lit(0), lit(3))).as("frame_idx"))
          .crossJoin(broadcast(nv))
          .select(col("media_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            pmod(hash32(concat(lit("fv:"), col("media_id").cast("string"))) +
              col("frame_idx") * lit(2654435761L), col("n_vecs"))
              .as("vec_id"))
        val emb = Tables.embeddings(s, d).select(col("vec_id"),
          col("label").cast("long").as("label"),
          size(col("embedding")).cast("long").as("dim"))
        frames.join(emb, Seq("vec_id"))
          .select(col("media_id"), col("frame_idx"), col("vec_id"),
            col("label"), col("dim"))
      }),

    // MM4: payload chunk-checksum dedup across kinds — the dd-family
    // composed over mm1's media manifest, i.e. what a media lakehouse runs
    // BEFORE any decode. Payloads are content-addressed at fixed-size
    // chunk granularity at ingest (the standard blob-store dedup unit;
    // whole-file dedup is the degenerate one-chunk case), and identical
    // leading chunks ingested under different media ids — often as
    // different declared kinds — collapse to one canonical copy. Output is
    // the duplicate clusters only: canonical id (min media_id =
    // keep-first), copy count, distinct-kind count (cross-modality
    // duplication is the interesting audit), and the reclaimable bytes
    // ((n_copies−1) × chunk size).
    //
    // Scale shape: ONE hash aggregate keyed on the 16-byte digest — the
    // chunk checksum is manifest METADATA (computed once at ingest, like
    // mm1's checksum column), so at 100 TB this groupBy shuffles digests
    // and longs, never payload bytes; the payload column stays pruned at
    // the scan (Plans "mm4 shape" check over a real binary table). No
    // all-pairs anything.
    //
    // Parity: md5 hex strings are identical on both engines (both hash the
    // UTF-8 bytes of the same 64-char prefix); counts and byte sums are
    // exact longs.
    QueryDef(
      "mm4_payload_dedup",
      Some("""WITH media AS (
             |  SELECT doc_id AS media_id,
             |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |         ELSE 'video' END AS kind,
             |    md5(substr(text, 1, 64)) AS chunk_checksum,
             |    CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT)
             |      AS chunk_bytes
             |  FROM documents)
             |SELECT chunk_checksum,
             |  CAST(min(media_id) AS BIGINT) AS canonical_id,
             |  CAST(count(*) AS BIGINT) AS n_copies,
             |  CAST(count(DISTINCT kind) AS BIGINT) AS n_kinds,
             |  CAST((count(*) - 1) * max(chunk_bytes) AS BIGINT)
             |    AS reclaim_bytes
             |FROM media GROUP BY chunk_checksum
             |HAVING count(*) > 1""".stripMargin),
      (s, d) => {
        val chunk = substring(col("text"), 1, 64)
        val media = Tables.documents(s, d).select(
          col("doc_id").as("media_id"),
          when(pmod(col("doc_id"), lit(3)) === 0, "image")
            .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
            .otherwise("video").as("kind"),
          md5(chunk.cast("binary")).as("chunk_checksum"),
          expr("octet_length(cast(substring(text, 1, 64) as binary))")
            .cast("long").as("chunk_bytes"))
        media.groupBy("chunk_checksum")
          .agg(min("media_id").cast("long").as("canonical_id"),
            count(lit(1)).cast("long").as("n_copies"),
            countDistinct("kind").cast("long").as("n_kinds"),
            ((count(lit(1)) - 1) * max("chunk_bytes")).cast("long")
              .as("reclaim_bytes"))
          .filter(col("n_copies") > 1)
      }),

    // MM5: bounded-box RESIZE audit — the remaining media transform from
    // the brief (decode/extract/frame-sample live in operators.Multimodal
    // since round 6; resize landed round 10). The Spark side runs the
    // REAL operator (Multimodal.resize: mapPartitions, payload never
    // shuffles, pass-through rows untouched); the audit projects the
    // operator's OUTPUT metadata — final dims, actual octet_length of the
    // produced payload, resized flag — so the hash compare proves the
    // operator's two contracts end-to-end: the integer-exact scaledDims
    // arithmetic (cross-multiplied axis choice, int division, ≥1 guard)
    // and the stub payload-size contract (outW·3 + outH bytes).
    //
    // Dims are synthesized per media row from n_chars (the fixture has no
    // codec-probed dims, same stand-in doctrine as mm2's durations);
    // audio rows carry NULL dims and must pass through byte-identical.
    // maxW=640 / maxH=480 are deliberately ASYMMETRIC so both branches of
    // the cross-multiplication fire across the corpus.
    //
    // Parity: every number is exact int64 arithmetic on both engines; the
    // only payload-derived output is octet_length, which the stub pins to
    // the arithmetic the oracle replays.
    QueryDef(
      "mm5_resize_audit",
      Some("""WITH media AS (
             |  SELECT doc_id AS media_id,
             |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |         ELSE 'video' END AS kind,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |    CAST(length(text) AS BIGINT) AS n_chars
             |  FROM documents WHERE length(text) >= 1),
             |dims AS (
             |  SELECT media_id, kind, n_bytes,
             |    CASE WHEN kind = 'audio' THEN NULL
             |         ELSE (n_chars * 7) % 1600 + 16 END AS w,
             |    CASE WHEN kind = 'audio' THEN NULL
             |         ELSE (n_chars * 13) % 1200 + 16 END AS h
             |  FROM media),
             |r AS (
             |  SELECT media_id, kind, n_bytes, w, h,
             |    CASE WHEN w IS NULL OR (w <= 640 AND h <= 480) THEN 0
             |         ELSE 1 END AS resized,
             |    CASE WHEN w IS NULL OR (w <= 640 AND h <= 480) THEN w
             |         WHEN 640 * h <= 480 * w THEN 640
             |         ELSE GREATEST(1, (w * 480) // h) END AS ow,
             |    CASE WHEN w IS NULL OR (w <= 640 AND h <= 480) THEN h
             |         WHEN 640 * h <= 480 * w
             |           THEN GREATEST(1, (h * 640) // w)
             |         ELSE 480 END AS oh
             |  FROM dims)
             |SELECT media_id, kind,
             |  CAST(ow AS BIGINT) AS out_w, CAST(oh AS BIGINT) AS out_h,
             |  CAST(CASE WHEN resized = 1 THEN ow * 3 + oh
             |       ELSE n_bytes END AS BIGINT) AS out_bytes,
             |  CAST(resized AS BIGINT) AS resized
             |FROM r""".stripMargin),
      (s, d) => {
        import graft.operators.Multimodal
        val isAudio = pmod(col("media_id"), lit(3)) === 1
        val media = Tables.documents(s, d)
          .filter(length(col("text")) >= 1)
          .select(
            col("doc_id").as("media_id"),
            col("text"),
            length(col("text")).cast("long").as("n_chars"))
          .select(
            col("media_id"),
            when(pmod(col("media_id"), lit(3)) === 0, "image")
              .when(isAudio, "audio").otherwise("video").as("kind"),
            col("text").cast("binary").as("payload"),
            when(isAudio, lit(null))
              .otherwise((col("n_chars") * 7 % 1600 + 16).cast("int"))
              .as("width"),
            when(isAudio, lit(null))
              .otherwise((col("n_chars") * 13 % 1200 + 16).cast("int"))
              .as("height"))
          .withColumn("orig_w", col("width"))
          .withColumn("orig_h", col("height"))
        Multimodal.resize(media, maxW = 640, maxH = 480)
          .select(col("media_id"), col("kind"),
            col("width").cast("long").as("out_w"),
            col("height").cast("long").as("out_h"),
            expr("octet_length(payload)").cast("long").as("out_bytes"),
            (!(col("width") <=> col("orig_w")) ||
              !(col("height") <=> col("orig_h"))).cast("long").as("resized"))
      })
  )
}
