package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: super-linearity probe. Synthesizes a 10× replica of a fixture
  * directory (sf0.1 → "sf1") and times a chosen set of the most expensive
  * DATA-BOUND queries on both, printing the observed scale factor. A
  * healthy query lands near 10× (linear) or below (broadcast/stats-bound);
  * well above 10× flags a pair-space or shuffle term growing faster than
  * the data — exactly the class of bug sf0.01→sf0.1 verification can't
  * see.
  *
  * Replication is ID-DISJOINT and CONTENT-DISJOINT so the 10× corpus has
  * organic geometry, not adversarial duplication: ids get per-replica
  * offsets; user series are replicated as NEW users (10× groups, same
  * per-group depth); document words are suffixed `_k` per replica (no
  * cross-replica shingle collisions — near-dup structure scales linearly
  * instead of ×100 pair blowup); embeddings get a tiny deterministic
  * per-replica jitter (no 10-way exact-duplicate vectors collapsing every
  * ANN cell).
  *
  * Usage: runMain graft.ScaleProbe <srcDir> <replicaDir> [query ...]
  */
object ScaleProbe {

  private val DefaultQueries = Seq(
    "pl22_zorder_pruned_scan", "pl14_gold_full", "a43_analyze_stats",
    "a22_grid_quantiles", "dd3_minhash_lsh", "dd5_ngram_jaccard",
    "dd11_containment", "dd13_cluster_canonical", "sim12_kmeans_train",
    "sim17_semantic_decon")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleProbe <srcDir> <replicaDir> [q..]")
    val (src, out) = (args(0), args(1))
    val queries = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, src, out)
    val results = queries.map { q =>
      val fn = SparkEntry.queries(q)
      def time(dir: String): Double = {
        // one warm-up-free measured run per dir: the probe wants the
        // relative shape, and JIT noise is shared by both sides
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val base = time(src)
      val big = time(out)
      val ratio = big / base
      println(f"[probe] $q%-28s base=$base%7.2fs x10=$big%7.2fs ratio=$ratio%5.1f")
      (q, base, big, ratio)
    }
    val bad = results.filter(_._4 > 20.0)
    println(s"[probe] ${results.size} probed, " +
      s"${bad.size} above the 20x super-linearity bar" +
      (if (bad.nonEmpty) ": " + bad.map(_._1).mkString(", ") else ""))
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }

  /** Writes 10× replicas of events/documents/embeddings into `out`. */
  private def synthesize(spark: SparkSession, src: String,
                         out: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(out, "_PROBE_READY"))) return
    def reps(df: DataFrame): DataFrame =
      df.withColumn("__k", explode(sequence(lit(0L), lit(9L))))
    reps(Tables.events(spark, src))
      .select(
        (col("event_id") + col("__k") * lit(1000000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + col("__k") * lit(1000000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
    reps(spark.read.parquet(s"$src/documents.parquet"))
      .select(
        (col("doc_id") + col("__k") * lit(1000000000000L)).as("doc_id"),
        when(col("__k") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), " "),
            w => concat(w, lit("_"), col("__k"))))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    reps(spark.read.parquet(s"$src/embeddings.parquet"))
      .select(
        (col("vec_id") + col("__k") * lit(1000000000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((col("__k") * 37 + i) % 97).cast("float")
            * lit(1e-4f)).as("embedding"),
        col("label"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    fs.create(new org.apache.hadoop.fs.Path(out, "_PROBE_READY")).close()
  }
}
