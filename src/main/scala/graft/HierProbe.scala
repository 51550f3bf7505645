package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the ANN scale-boundary probe. The vector index
  * ([[graft.operators.EmbedStage]]) switches quantizer regime at
  * [[graft.operators.IvfIndex.HierarchyThreshold]] cells (≈1.05M vectors
  * at the default list target): flat all-cell assignment below, two-level
  * parent→child ([[graft.operators.IvfIndex.assignHier]]) above. This
  * main measures BOTH sides of that seam on synthetic replicas of the
  * fixture embedding corpus:
  *
  *  - per point: corpus size, cell count, regime, stage BUILD seconds,
  *    wall time of the probed searches (sim4), the cell-local kNN join
  *    (sim14) and semantic dedup (sim5), and the sim8 recall audit
  *    (recall@10 of the probed search vs the exact brute-force ranking
  *    over the SAME corpus — the honest quality cost of the quantizer).
  *  - a FORCED-hier point ("<N>h") rebuilds one flat-regime corpus with
  *    the two-level geometry at the same cell count, so flat and hier
  *    compare head-to-head on identical data (build cost, query cost,
  *    recall) — the seam evidence a threshold crossing alone can't give,
  *    because the flat build is quadratic and unaffordable at the
  *    boundary itself (that unaffordability IS the motivation).
  *
  * Replicas are embeddings-only (the sim family reads nothing else):
  * ScaleProbe's id-offset + per-replica jitter scheme, so no N-way exact
  * duplicates collapse the cells. Default points: 50, 100, 100h, 750
  * (750 × sf0.1 = 1.5M vectors → 5859 cells, the hier regime).
  *
  * Usage: runMain graft.HierProbe <srcDir> <workDir> [--fresh] [pt ...]
  * Point suffixes: "<N>h" forces the two-level geometry on a flat-regime
  * corpus (the seam comparison); "<N>d" synthesizes a DIRECTION-DIVERSE
  * corpus of the same size instead of jittered replicas (separates the
  * fixture's 2k-base-direction cap on cell occupancy from the
  * quantizer's own law — see synthesizeEmbeddings). `--fresh`
  * resynthesizes replicas (new mtime → cache-busts the stage, so
  * build_sec is a real build, not a cache hit — use for artifacts).
  * SPARK_GRAFT_PROBE_OUT writes the JSON artifact.
  *
  * `--sweep s1,s2,...` instead measures the probe budget's
  * RECALL-vs-COST curve on each point: the exact top-10 neighbor set of
  * a 50-query sample is computed once by brute force, then the probed
  * search re-runs at each target CORPUS SHARE value, reporting per-share
  * recall@10 (mean and min over queries), the probe budgets (blocks ×
  * cells/block), the realized corpus share, and the probed-search wall.
  * This is the evidence the default [[graft.operators.IvfIndex
  * .TargetProbeShare]] is chosen from — measured on the direction-diverse
  * corpus, the adversarial no-structure case (the r11 fixed-P budget
  * read recall 0.02 there while the jittered-replica corpus read 1.0).
  */
object HierProbe {

  private val DefaultPoints = Seq("50", "100", "100h", "750")
  private val ProbeQueries = Seq("sim4_ivf_topk", "sim14_knn_join",
    "sim5_semdedup")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: HierProbe <srcDir> <workDir> [--fresh] [point ...]")
    val (src, work) = (args(0), args(1))
    var fresh = false
    var sweep: Seq[Double] = Nil
    var expectSweep = false
    val pts = Seq.newBuilder[String]
    args.drop(2).foreach {
      case "--fresh" => fresh = true
      case "--sweep" => expectSweep = true
      case v if expectSweep =>
        sweep = v.split(",").toSeq.map(_.toDouble); expectSweep = false
      case p => pts += p
    }
    val points = { val p = pts.result(); if (p.isEmpty) DefaultPoints else p }
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (sweep.nonEmpty) {
      runSweep(spark, src, work, points, sweep, fresh)
      spark.stop(); return
    }

    val rows = points.map { pt =>
      val forced = pt.endsWith("h")
      val diverse = pt.endsWith("d")
      val factor = (if (forced || diverse) pt.dropRight(1) else pt).toLong
      val dir = s"$work/x$pt"
      synthesizeEmbeddings(spark, src, dir, factor, fresh, diverse)
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val cells = graft.operators.IvfIndex.cellsFor(n)
      graft.operators.IvfIndex.withForceHier(forced) {
        val hier = graft.operators.IvfIndex.isHier(cells)
        val b0 = graft.operators.EmbedStage.buildSeconds
        graft.operators.EmbedStage(spark, dir)
        val buildSec = graft.operators.EmbedStage.buildSeconds - b0
        val cached = buildSec < 0.01
        println(f"[hier] x$pt n=$n cells=$cells " +
          f"regime=${if (hier) "hier" else "flat"} " +
          f"build=$buildSec%.1fs${if (cached) " (CACHED)" else ""}")
        val timings = ProbeQueries.map { q =>
          val qt0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          spark.sharedState.cacheManager.clearCache()
          val sec = (System.nanoTime() - qt0) / 1e9
          println(f"[hier] x$pt $q%-16s $sec%7.2fs")
          q -> sec
        }
        val rec = SparkEntry.queries("sim8_recall_audit")(spark, dir)
          .select(avg("recall"), min("recall")).head()
        println(f"[hier] x$pt recall@10 mean=${rec.getDouble(0)}%.3f " +
          f"min=${rec.getDouble(1)}%.3f")
        (pt, forced, n, cells, hier, buildSec, cached, timings,
          rec.getDouble(0), rec.getDouble(1))
      }
    }

    // per-vector build cost is the law being probed: flat grows ∝ n
    // (cells ∝ n per-row term), hier ∝ √n with a ~40× smaller constant
    // at the boundary
    rows.foreach { case (pt, _, n, cells, hier, b, cached, ts, rm, _) =>
      val per = b * 1e6 / n
      println(f"[hier] SUMMARY x$pt%-5s n=$n%9d cells=$cells%5d " +
        f"${if (hier) "hier" else "flat"}%4s build/vec=$per%7.2fus" +
        f"${if (cached) " (cached)" else ""} " +
        ts.map { case (q, s) => f"${q.take(5)}=$s%.1fs" }.mkString(" ") +
        f" recall=$rm%.3f")
    }
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { path =>
      val json = rows.map {
        case (pt, forced, n, cells, hier, b, cached, ts, rm, rmin) =>
          val qj = ts.map { case (q, s) => f""""$q": $s%.2f""" }
            .mkString(", ")
          f"""  "x$pt": {"factor": "$pt", "forced_hier": $forced, """ +
            f""""n": $n, "cells": $cells, """ +
            f""""regime": "${if (hier) "hier" else "flat"}", """ +
            f""""build_sec": $b%.2f, "build_cached": $cached, """ +
            f""""build_us_per_vec": ${b * 1e6 / n}%.2f, $qj, """ +
            f""""recall_mean": $rm%.4f, "recall_min": $rmin%.4f}"""
      }.mkString("{\n \"points\": {\n", ",\n", "\n }\n}")
      val p = new java.io.PrintWriter(path); p.write(json); p.close()
      println(s"[hier] artifact -> $path")
    }
    spark.stop()
  }

  /** Recall-vs-cost curve for the hier probe budget (see object doc).
    * 50 query vectors (vs the sim family's NQ=5 — a stabler mean), exact
    * leg computed once per point, probed leg re-run per frac. */
  private def runSweep(spark: SparkSession, src: String, work: String,
                       points: Seq[String], fracs: Seq[Double],
                       fresh: Boolean): Unit = {
    import graft.operators.{EmbedStage, IvfIndex, VectorOps}
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    val nq = 50
    val topK = 10
    val out = points.map { pt =>
      val forced = pt.endsWith("h")
      val diverse = pt.endsWith("d")
      val factor = (if (forced || diverse) pt.dropRight(1) else pt).toLong
      val dir = s"$work/x$pt"
      synthesizeEmbeddings(spark, src, dir, factor, fresh, diverse)
      graft.operators.IvfIndex.withForceHier(forced) {
        val v = EmbedStage(spark, dir).vectors
        val n = v.count()
        val cells = EmbedStage.cells(spark, dir)
        require(IvfIndex.isHier(cells),
          s"sweep point x$pt is not in the hier regime ($cells cells)")
        val qs = v.filter(col("vec_id") < nq)
          .select(col("vec_id").as("query_id"), col("qv").as("qv_q"),
            col("nsq").as("nsq_q"))
        val cosine = VectorOps.dotL(col("qv_q"), col("qv_c")).cast("double") /
          (sqrt(col("nsq_q").cast("double")) *
            sqrt(col("nsq_c").cast("double")))
        val wTop = Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("cand_id"))
        val corpus = v.select(col("vec_id").as("cand_id"),
          col("qv").as("qv_c"), col("nsq").as("nsq_c"), col("cid"))
        def topk(scored: DataFrame) = scored
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= topK).select("query_id", "cand_id")
        val exact = topk(corpus
          .crossJoin(broadcast(qs))
          .filter(col("cand_id") =!= col("query_id"))
          .select(col("query_id"), col("cand_id"), cosine.as("cosine")))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        println(f"[sweep] x$pt n=$n cells=$cells exact leg done " +
          f"(${exact.size} queries)")
        val rows = fracs.map { f =>
          val (bP, c) = IvfIndex.hierBudget(cells, share = f)
          val t0 = System.nanoTime()
          val probes = IvfIndex.probeCells(
            v.filter(col("vec_id") < nq)
              .select(col("vec_id").as("query_id"), col("qv"),
                col("nsq").as("nsq_q"), col("dl")),
            "query_id", VectorOps.Dim, cells, share = f)
            .withColumnRenamed("qv", "qv_q")
          val approx = topk(corpus.join(broadcast(probes), "cid")
            .filter(col("cand_id") =!= col("query_id"))
            .select(col("query_id"), col("cand_id"), cosine.as("cosine")))
            .collect().map(r => (r.getLong(0), r.getLong(1)))
            .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
          val wall = (System.nanoTime() - t0) / 1e9
          val rec = exact.map { case (q, ex) =>
            approx.getOrElse(q, Set.empty[Long]).count(ex.contains)
              .toDouble / ex.size
          }.toSeq
          val (rm, rmin) = (rec.sum / rec.size, rec.min)
          val share = bP.toDouble * c * IvfIndex.TargetCellSize / n
          println(f"[sweep] x$pt share=$f%.4f budget=${bP}x$c " +
            f"(~${share * 100}%.1f%% corpus) recall mean=$rm%.3f " +
            f"min=$rmin%.3f wall=$wall%.1fs")
          (f, bP, c, share, rm, rmin, wall)
        }
        (pt, n, cells, rows)
      }
    }
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { path =>
      val json = out.map { case (pt, n, cells, rows) =>
        val rj = rows.map { case (f, bP, c, share, rm, rmin, wall) =>
          f"""   {"target_share": $f%.4f, "blocks": $bP, """ +
            f""""cells_per_block": $c, """ +
            f""""corpus_share": $share%.4f, "recall_mean": $rm%.4f, """ +
            f""""recall_min": $rmin%.4f, "probe_wall_sec": $wall%.2f}"""
        }.mkString(",\n")
        f"""  "x$pt": {"n": $n, "cells": $cells, "n_queries": $nq, """ +
          f""""top_k": $topK, "curve": [\n$rj\n  ]}"""
      }.mkString("{\n \"points\": {\n", ",\n", "\n }\n}")
      val p = new java.io.PrintWriter(path); p.write(json); p.close()
      println(s"[sweep] artifact -> $path")
    }
  }

  /** N× embeddings-only replica with ScaleProbe's geometry rules:
    * contiguous vec_id offsets, tiny deterministic per-replica jitter so
    * no cross-replica exact duplicates exist and every ANN cell fills
    * organically.
    *
    * `diverse = true` instead synthesizes factor×|fixture| vectors with
    * INDEPENDENT pseudo-random directions (xxhash64 per (vec_id, axis) →
    * uniform floats in [-1, 1]). The replica scheme keeps the fixture's
    * 2k base DIRECTIONS and only jitters them — genuinely near-duplicate
    * data, which is what dedup probes want, but it caps ANN cell
    * occupancy at ~2k cells no matter how many cells the quantizer
    * grows (a direction-based partition cannot split co-directional
    * near-dups), inflating cell-local pair work BY CONSTRUCTION. The
    * diverse corpus separates that fixture property from the
    * quantizer's own law. */
  private def synthesizeEmbeddings(spark: SparkSession, src: String,
                                   dir: String, factor: Long,
                                   fresh: Boolean,
                                   diverse: Boolean = false): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ready = new org.apache.hadoop.fs.Path(dir, s"_HIER_READY_$factor")
    if (!fresh && fs.exists(ready)) return
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val step = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val out =
      if (!diverse)
        emb.withColumn("__k", explode(sequence(lit(0L), lit(factor - 1))))
          .select((col("vec_id") + col("__k") * lit(step)).as("vec_id"),
            transform(col("embedding"),
              (x, i) => x + ((col("__k") * 37 + i) % 97).cast("float")
                * lit(1e-4f)).as("embedding"),
            col("label"))
      else
        spark.range(step * factor).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(VectorDim - 1)), k =>
            ((xxhash64(col("id") * VectorDim + k) % 1000001L)
              .cast("double") / 1000000.0).cast("float")).as("embedding"),
          (col("id") % 10).cast("int").as("label"))
    out.repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    fs.create(ready, true).close()
  }

  private val VectorDim = graft.operators.VectorOps.Dim
}
