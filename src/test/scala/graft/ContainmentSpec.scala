package graft

import org.apache.spark.sql.functions._

/** Semantic checks for dd11_containment that the oracle cannot provide:
  * the oracle replays the same computation, so it proves cross-engine
  * parity but not that the winnowing-fingerprint containment score
  * actually DETECTS embedded excerpts. Here we construct a corpus with a
  * known containment relationship and assert the detector's behavior:
  *
  *  - a 20-token excerpt pasted out of a 60-token document scores
  *    containment ≈ 1 on the short side (the MOSS guarantee: every shared
  *    window of ≥ w+k-1 tokens shares a fingerprint; only the excerpt's
  *    boundary windows may pick different minima than they did in context)
  *  - the same relationship is ASYMMETRIC — the long side's containment is
  *    far lower (that is the whole point vs symmetric Jaccard)
  *  - a token-REORDERED copy of the long document does not match it (the
  *    rolling gram hash is order-sensitive by construction)
  *  - an unrelated document matches nothing
  */
class ContainmentSpec extends SparkSpec {

  test("winnowing containment finds embedded excerpts, asymmetrically") {
    val s = spark
    import s.implicits._
    val longTokens  = (0 until 60).map(i => f"w$i%02d")
    val excerpt     = longTokens.slice(10, 30)           // 20-token paste
    val unrelated   = (0 until 20).map(i => s"z$i")
    val reordered   = longTokens.reverse                 // same bag, new order
    val docs = Seq(
      (1L, longTokens.mkString(" ")),
      (2L, excerpt.mkString(" ")),
      (3L, unrelated.mkString(" ")),
      (4L, reordered.mkString(" ")),
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft_dd11").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(dir + "/documents.parquet")

    val rows = SparkEntry.queries("dd11_containment")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Double]("containment_a"), r.getAs[Double]("containment_b")))
      .toMap

    // the excerpt pair is found, with the short side near-fully contained
    val (ca, cb) = rows.getOrElse((1L, 2L),
      fail(s"excerpt pair (1,2) not detected; got ${rows.keySet}"))
    assert(cb >= 0.8, s"short-side containment $cb should be ≈1")
    assert(ca < cb, s"containment must be asymmetric (a=$ca, b=$cb)")
    // order sensitivity: the reordered copy is NOT a containment hit
    assert(!rows.contains((1L, 4L)),
      "token-reordered copy must not match (order-sensitive grams)")
    // no spurious pairs against the unrelated document
    assert(!rows.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated document must match nothing")
  }
}
