package graft

import org.apache.spark.sql.functions._
import graft.operators.SignLsh

/** Recall mechanics of the multi-table sign-LSH operator.
  *
  * The fixture corpus has no planted embedding near-duplicates (max
  * pairwise cosine ~0.6), so absolute recall there is information-free;
  * this spec plants real near-dups (cosine ≥ 0.999) and checks the
  * OR-amplified configuration recovers them, and separately checks the
  * structural guarantee that adding tables never loses candidates.
  */
class SignLshSpec extends SparkSpec {

  private def planted(n: Int, dups: Int, noise: Double, dim: Int = 64) = {
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(dim)(rnd.nextGaussian())
    val base = (0 until n).map(i => (i.toLong, vec()))
    val nearDups = (0 until dups).map { i =>
      val (id, v) = base(i)
      ((n + i).toLong, v.map(x => x + noise * rnd.nextGaussian()))
    }
    val quantized = (base ++ nearDups).map { case (id, v) =>
      (id, v.toSeq.map(x => math.floor(x * 1e6 + 0.5).toLong))
    }
    import spark.implicits._
    (quantized.toDF("vec_id", "qv"),
     (0 until dups).map(i => (i.toLong, (n + i).toLong)))
  }

  test("4x16-bit OR-amplified LSH recovers planted near-duplicates") {
    val (df, pairs) = planted(n = 200, dups = 50, noise = 0.02)
    val cand = SignLsh.candidatePairs(df, "vec_id", "qv",
      tables = 4, bits = 16, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recovered = pairs.count(cand.contains)
    // per-bit collision prob p ≈ 0.994 at cosine 0.9998 → table hit
    // p^16 ≈ 0.90, OR over 4 tables ≈ 1-1e-4. Deterministic given the
    // fixed seed and plan constants.
    assert(recovered >= 48, s"recovered only $recovered/50 planted pairs")
  }

  test("OR-amplification: multi-table candidates contain single-table's, recall does not drop") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000.0 + 0.5).cast("long")).as("qv"))
    val single = SignLsh.candidatePairs(emb, "vec_id", "qv",
      tables = 1, bits = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = SignLsh.candidatePairs(emb, "vec_id", "qv",
      tables = 4, bits = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // table 0 of the 4-table config IS the single-table config → superset.
    assert(single.subsetOf(multi))
    assert(multi.size > single.size,
      "extra tables should contribute extra candidates on this corpus")
  }

  test("12-bit multiprobe query path recovers planted near-duplicates") {
    // the sim2 shape: queries are the planted originals, candidates come
    // from exact-bucket OR any 1-bit-flip probe, per table.
    val (df, pairs) = planted(n = 200, dups = 50, noise = 0.02)
    val bits = 12
    val bk = SignLsh.bucketize(df, "vec_id", "qv",
      tables = 4, bits = bits, dim = 64)
    val qb = bk.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("table_id"),
        explode(SignLsh.probeBuckets(col("bucket"), bits)).as("bucket"))
    val cand = bk.select(col("vec_id").as("cand_id"), col("table_id"),
        col("bucket"))
      .join(qb, Seq("table_id", "bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recovered = pairs.count { case (orig, dup) => cand((orig, dup)) }
    assert(recovered >= 48,
      s"multiprobe recovered only $recovered/50 planted pairs")
    // structural: multiprobe at the same bits never loses exact-bucket hits
    val exact = bk.select(col("vec_id").as("cand_id"), col("table_id"),
        col("bucket"))
      .join(bk.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("table_id"),
          col("bucket")), Seq("table_id", "bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(cand))
  }

  test("bucket cap drops exactly the overflowing buckets and reports them") {
    val (df, _) = planted(n = 50, dups = 0, noise = 0.0)
    val over = SignLsh.overflow(df, "vec_id", "qv",
      tables = 1, bits = 2, dim = 64, maxBucket = 10)
    val overflowing = over.collect()
    // 50 vecs in 4 buckets → some bucket must exceed 10
    assert(overflowing.nonEmpty)
    val kept = SignLsh.bucketize(df, "vec_id", "qv",
      tables = 1, bits = 2, dim = 64, maxBucket = 10)
      .groupBy("bucket").agg(count(lit(1)).as("n")).collect()
    assert(kept.forall(_.getAs[Long]("n") <= 10))
  }

  test("cap telemetry counts the dropped rows, not just that a drop happened") {
    val (df, _) = planted(n = 50, dups = 0, noise = 0.0)
    val dropped = SignLsh.overflow(df, "vec_id", "qv",
      tables = 1, bits = 2, dim = 64, maxBucket = 10)
      .agg(sum("n")).collect()(0).getLong(0)
    // run the capped bucketize with a metric attached; the counter must
    // equal the overflow report's total
    SignLsh.bucketize(df, "vec_id", "qv",
      tables = 1, bits = 2, dim = 64, maxBucket = 10,
      capMetric = Some("spec_cap_metric"))
      .write.format("noop").mode("overwrite").save()
    assert(CapTelemetry.snapshot().get("spec_cap_metric").contains(dropped))
    spark.catalog.clearCache()
  }
}
