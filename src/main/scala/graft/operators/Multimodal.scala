package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample transforms over `mapPartitions`.
  *
  * The Spark-side mechanics — schema, batch-per-partition iteration,
  * deterministic output shape — are real and tested. The media DECODE step
  * is a clearly-marked STUB (`stubDecode`): this container has no
  * image/audio codecs, so it derives a deterministic pseudo-feature vector
  * from the payload bytes. Swapping in a real decoder (JNI/ffmpeg/opencv)
  * only replaces that one function; the distributed plumbing is unchanged.
  *
  * Scale notes: payloads never pass through a shuffle here — decode is a
  * narrow per-partition map; metadata-only projections prune the binary
  * column entirely (columnar Parquet stores it separately, so a
  * `select(meta)` plan never reads the bytes).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** STUB decode: a real implementation would decode the media payload.
    * Deterministic stand-in: k floats derived from a rolling byte hash.
    * `seed` distinguishes sub-reads of one payload (e.g. frame offsets)
    * without copying the payload bytes. */
  private[operators] def stubDecode(payload: Array[Byte], k: Int,
                                    seed: Long = 0L): Array[Float] = {
    val out = new Array[Float](k)
    var h = 1125899906842597L ^ (seed * 0x9E3779B97F4A7C15L)
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < k) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      j += 1
    }
    out
  }

  /** Feature extraction over partitions: one decoded `dim`-float vector per
    * media row. Batch shape: the iterator is consumed lazily, so executor
    * memory holds one partition's rows at a time, never the whole column. */
  def extractFeatures(df: DataFrame, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "payload") :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val payloadIdx = df.schema.fieldIndex("payload")
    val keepIdx = df.schema.fields.indices.filterNot(_ == payloadIdx)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val payload = row.getAs[Array[Byte]](payloadIdx)
        val feats = if (payload == null) null
          else stubDecode(payload, dim)
        Row.fromSeq(keepIdx.map(row.get) :+ feats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Integer-exact bounded-box dims: the largest (w', h') with w' ≤ maxW,
    * h' ≤ maxH preserving aspect by integer division. The binding axis is
    * chosen by cross-multiplication (maxW·h ≤ maxH·w → width-bound), so
    * the arithmetic is pure int64 — a SQL oracle replays it bit-for-bit,
    * no float scale factor anywhere. In-bounds dims pass through. */
  def scaledDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (maxW.toLong * h <= maxH.toLong * w)
      (maxW, math.max(1L, h.toLong * maxW / w).toInt)
    else
      (math.max(1L, w.toLong * maxH / h).toInt, maxH)

  /** STUB resized payload: a real implementation decodes, scales, and
    * re-encodes; the stand-in emits EXACTLY `outW * 3 + outH` bytes (a
    * "row stride" stand-in contract the mm5 oracle audits) derived from a
    * rolling hash of the source bytes — deterministic, and never a copy
    * of the input. */
  private[operators] def stubResize(payload: Array[Byte], outW: Int,
                                    outH: Int): Array[Byte] = {
    val n = outW * 3 + outH
    val out = new Array[Byte](n)
    var h = 1125899906842597L ^ (outW.toLong << 32 | outH.toLong)
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < n) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = (h >>> 56).toByte
      j += 1
    }
    out
  }

  /** Bounded-box RESIZE over partitions: image/video rows whose dims
    * exceed (maxW, maxH) get [[scaledDims]] and a stub payload of the
    * resized size; audio, null-dim, null-payload, and in-bounds rows pass
    * through UNTOUCHED (same object, no copy). Schema is unchanged. Like
    * the other media transforms this is a narrow per-partition map — the
    * payload never crosses a shuffle, and at 100 TB the transform
    * parallelizes per input split with no skew term (cost ∝ bytes). */
  def resize(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val ki = schema.fieldIndex("kind")
    val pi = schema.fieldIndex("payload")
    val wi = schema.fieldIndex("width")
    val hi = schema.fieldIndex("height")
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val kind = row.getString(ki)
        val sized = (kind == "image" || kind == "video") &&
          !row.isNullAt(wi) && !row.isNullAt(hi) && !row.isNullAt(pi)
        if (!sized) row
        else {
          val w = row.getInt(wi)
          val h = row.getInt(hi)
          val (ow, oh) = scaledDims(w, h, maxW, maxH)
          if (ow == w && oh == h) row
          else {
            val vals = row.toSeq.toArray
            vals(pi) = stubResize(row.getAs[Array[Byte]](pi), ow, oh)
            vals(wi) = ow
            vals(hi) = oh
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame sampling (video analog): emit one row per sampled frame offset —
    * an explode over a generated offset sequence, then per-frame stub
    * features from the payload slice. */
  def sampleFrames(df: DataFrame, everyMs: Long, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_ms", LongType, nullable = false),
      StructField("frame_features", ArrayType(FloatType), nullable = true)))
    val rdd = df.select("media_id", "duration_ms", "payload").rdd
      .mapPartitions { it =>
        it.flatMap { row =>
          val id = row.getLong(0)
          val dur = if (row.isNullAt(1)) 0L else row.getLong(1)
          val payload = row.getAs[Array[Byte]](2)
          (0L until math.max(dur, 1L) by math.max(everyMs, 1L)).map { off =>
            // offset goes into the hash seed — never copy the payload per
            // frame (a g-frame video would otherwise allocate g copies).
            val feats = if (payload == null) null
              else stubDecode(payload, dim, seed = off)
            Row(id, off, feats)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }
}
