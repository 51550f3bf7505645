package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints formatted physical plans for scale-critical queries so
  * plan regressions (lost pushdown, missed broadcast, extra exchanges) are
  * visible, and runs a small set of hard plan assertions (exit code 1 on
  * regression). Usage: runMain graft.Plans [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // plan-string assertions match on scan locations (e.g. the stage's
    // staged_pairs path), which the default 100-char metadata truncation
    // would cut off
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_scan_pushdown", "j2_broadcast_dim_join", "pl6_feature_battery",
               "w5_lag_battery", "w5b_lag_battery_dst", "j7_asof_join",
               "pl14_gold_full", "sim2_ann_lsh", "dd3_minhash_lsh")
    val qs = SparkEntry.queries
    names.foreach { n =>
      println(s"\n========== $n ==========")
      qs(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }

    // Hard assertions on scale-critical plan properties.
    def planOf(n: String): String =
      qs(n)(spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString
    var failed = 0
    def check(label: String)(ok: Boolean): Unit = {
      println(s"[plans] ${if (ok) "OK  " else "FAIL"} $label")
      if (!ok) failed += 1
    }
    // predicate pushdown reaches the parquet scan
    check("s1: filters pushed to scan") {
      planOf("s1_scan_pushdown").contains("PushedFilters: [")
    }
    // dimension joins broadcast (no shuffle of the fact side)
    check("j2: broadcast hash join") {
      planOf("j2_broadcast_dim_join").contains("BroadcastHashJoin")
    }
    // the window battery reuses ONE hash exchange (no per-horizon shuffle)
    check("w5: single exchange for the lag battery") {
      "Exchange hashpartitioning".r
        .findAllIn(planOf("w5_lag_battery")).length == 1
    }
    // top-k compiles to TakeOrdered, not global sort
    check("o2: TakeOrderedAndProject") {
      planOf("o2_topk").contains("TakeOrdered")
    }
    // head-N preview is a bare CollectLimit over the scan — no sort, no
    // heap (the o4 contract: preview cost is O(n) rows fetched, period)
    check("o4: unordered head is CollectLimit, no Sort") {
      val p = planOf("o4_head_preview")
      p.contains("CollectLimit") && !p.contains("Sort") &&
        !p.contains("TakeOrdered")
    }
    // the fused Gold pass: the daily substrate joins broadcast (never a
    // shuffle join), and the whole window battery shares ONE sort — a
    // second Sort would mean a feature broke the shared (user, ts) frame
    val pl16 = planOf("pl16_gold_fused")
    check("pl16: substrate joins broadcast, no shuffle join") {
      pl16.contains("BroadcastHashJoin") && !pl16.contains("SortMergeJoin")
    }
    check("pl16: one shared Sort under the window chain") {
      "\\bSort \\[".r.findAllIn(pl16).length == 1 &&
        "\\bWindow \\[".r.findAllIn(pl16).length >= 3
    }
    // dd5: the skew cap is a hash-agg + broadcast anti-join — NO window
    // sort over the postings; both self-join sides read the same cache
    val dd5 = planOf("dd5_ngram_jaccard")
    check("dd5: no window sort in the postings pipeline") {
      !dd5.contains("Window [")
    }
    check("dd5: both self-join sides read the postings cache") {
      "InMemoryTableScan".r.findAllIn(dd5).length >= 2
    }
    // the rolling-splits range join broadcasts the (one-row-per-window)
    // splits frame — never a shuffle or cartesian of the data side
    check("mlprep_rolling: splits side broadcast, no cartesian") {
      val p = planOf("mlprep_rolling_splits")
      p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")
    }
    // sim4: the IVF probe join broadcasts the (NQ×P)-row probe frame
    // against the corpus — never a corpus shuffle join; the only hash
    // exchanges are the two tiny windows (probe ranking over NQ queries,
    // final top-k over the scored candidates)
    val sim4 = planOf("sim4_ivf_topk")
    check("sim4: probes broadcast against the corpus, no shuffle join") {
      sim4.contains("BroadcastHashJoin") && !sim4.contains("SortMergeJoin") &&
        !sim4.contains("CartesianProduct")
    }
    check("sim4: only the two small-side window exchanges") {
      "Exchange hashpartitioning".r.findAllIn(sim4).length == 2
    }
    // the sim family reads the MATERIALIZED vector-index stage
    // (operators.EmbedStage) — no inline re-quantization / re-encoding of
    // the corpus on any query path
    check("sim2/sim4/sim6: read the materialized vector-index stage") {
      planOf("sim2_ann_lsh").contains("graft_embed_stage") &&
        sim4.contains("graft_embed_stage") &&
        planOf("sim6_pq_topk").contains("graft_embed_stage")
    }
    // dd3/dd6 consume the MATERIALIZED signature stage (operators.DedupStage)
    // instead of re-running the md5-shingle preamble, and their banding
    // path has no window sort anywhere. dd6 additionally reads the stage's
    // PUBLISHED pair table (band join paid once at build), so its plan
    // must contain NO band explode — dd3 keeps the inline band join as the
    // timed exemplar of the same core.
    val dd6 = planOf("dd6_staged_neardup")
    check("dd6: reads the materialized signature stage") {
      dd6.contains("graft_dedup_stage") &&
        planOf("dd3_minhash_lsh").contains("graft_dedup_stage")
    }
    check("dd6: no window sort in the banding pipeline") {
      !dd6.contains("Window [")
    }
    check("dd6: reads materialized staged pairs, no inline band explode") {
      dd6.contains("staged_pairs") && !dd6.contains("Generate explode") &&
        planOf("dd3_minhash_lsh").contains("Generate explode")
    }
    // mlprep_prepare: every join is broadcast (the two 1-row crossJoins
    // ride BroadcastNestedLoopJoin) — no cartesian, no shuffle join
    check("mlprep_prepare: broadcasts only, no cartesian/shuffle join") {
      val p = planOf("mlprep_prepare")
      !p.contains("CartesianProduct") && !p.contains("SortMergeJoin")
    }
    // pl13's merge primitive: the anti-join's target side scans ONLY the
    // key columns (keys-not-rows build side at 100 TB)
    check("pl13: keys-only target scan in insertIfAbsent") {
      val tmp = Sinks.dir(spark, "plans_merge_target")
      Tables.events(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").parquet(tmp)
      val src = Tables.events(spark, "/root/testdata/sf0.001").limit(10)
      val plan = graft.operators.MergeUpsert
        .newRows(spark, src, tmp, Seq("user_id", "ts"), "event_id")
        .queryExecution.executedPlan.toString
      val targetScans = plan.linesIterator
        .filter(l => l.contains(tmp) && l.contains("ReadSchema")).toSeq
      targetScans.nonEmpty && targetScans.forall { l =>
        val schema = l.substring(l.indexOf("ReadSchema"))
        schema.contains("user_id") && !schema.contains("value") &&
          !schema.contains("event_type") && !schema.contains("props")
      }
    }
    // dd8: decontamination reads the staged gram hashes (no re-shingle of
    // raw text — no string split/explode of `text` in the plan) and the
    // benchmark dim rides a broadcast join, never a shuffle join of the
    // corpus side
    val dd8 = planOf("dd8_decontaminate")
    check("dd8: stage read + broadcast benchmark dim, no sort-merge") {
      dd8.contains("graft_dedup_stage") &&
        dd8.contains("BroadcastHashJoin") && !dd8.contains("SortMergeJoin")
    }
    // sim5: the within-cluster pair space comes from the cid equi-join —
    // never a cartesian; the coarse assignment is a projection (no
    // shuffle before the pair join's own cid exchange)
    check("sim5: cid-keyed pair join, no cartesian") {
      val p = planOf("sim5_semdedup")
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop")
    }
    // mix1: the per-row decision is a projection over ONE corpus scan —
    // every join in the plan is broadcast
    check("mix1: decision is broadcast-joined projection, no shuffle join") {
      val p = planOf("mix1_domain_mixture")
      !p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
        p.contains("BroadcastHashJoin")
    }
    // j10: the salted join must actually exercise the salted-shuffle path —
    // a ShuffledHashJoin keyed on (user_id, salt), NOT a broadcast (which
    // would make the salt decorative) and NOT a sort-merge (the hint asks
    // for hash); the replicated dim's explode is distributed
    val j10 = planOf("j10_salted_skew_join")
    check("j10: shuffled hash join on the salted key, no broadcast join") {
      j10.contains("ShuffledHashJoin") && j10.contains("__salt") &&
        !j10.contains("BroadcastHashJoin")
    }
    // j10 under AQE: the string above is the INITIAL plan; AQE may replan
    // joins at runtime from observed shuffle statistics, and a runtime
    // broadcast conversion would make the salt decorative (the exact
    // failure the salted join exists to prevent would be decided by the
    // optimizer, not the operator). Execute the query with AQE on (the
    // session default) and assert the FINAL adaptive plan still carries
    // the salted shuffled-hash join — the shuffle_hash hint must survive
    // replanning.
    check("j10: salted shuffle survives AQE replanning (final plan)") {
      val df = qs("j10_salted_skew_join")(spark, "/root/testdata/sf0.01")
      // execute THIS df's QueryExecution (a write would plan a fresh one
      // that never runs AQE's replanning on the instance we inspect)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
        "AQE must be on for this check to mean anything")
      val finalSection = p.indexOf("== Final Plan ==") match {
        case -1 => p // not adaptive — assert on the whole plan
        case i => p.substring(i,
          math.max(i, p.indexOf("== Initial Plan ==")).max(i + 1))
      }
      p.contains("isFinalPlan=true") &&
        finalSection.contains("ShuffledHashJoin") &&
        finalSection.contains("__salt") &&
        !finalSection.contains("BroadcastHashJoin")
    }
    // dd9: passage stream persisted once, read by BOTH the occurrence
    // aggregate and the join probe. The count join is deliberately
    // UNHINTED: at fixture scale Catalyst broadcasts the (small, cached,
    // accurately-sized) count table, at 100 TB the same declarative plan
    // crosses the threshold and becomes a ph-keyed shuffle join — both are
    // the right strategy for their scale, so the assertion pins only the
    // scale-invariant properties (dual cache read, equi-join, never a
    // cartesian or nested loop).
    val dd9 = planOf("dd9_passage_dedup")
    check("dd9: both count and probe read the passage cache, equi-join") {
      "InMemoryTableScan".r.findAllIn(dd9).length >= 2 &&
        !dd9.contains("CartesianProduct") &&
        !dd9.contains("BroadcastNestedLoop")
    }
    // a22: ONE data-sized hash aggregate; the quantile windows run over
    // the bounded histogram AFTER the aggregate (no data-sized window sort
    // and no extra exchange beyond the group key's)
    check("a22: histogram-first — aggregate below the quantile windows") {
      val p = planOf("a22_grid_quantiles")
      "Exchange hashpartitioning".r.findAllIn(p).length <= 2 &&
        "\\bWindow \\[".r.findAllIn(p).length == 2
    }
    // mix2: same shape contract as mix1 — the per-row decision is a
    // broadcast-joined projection, never a shuffle join of the corpus
    check("mix2: decision is broadcast-joined projection, no shuffle join") {
      val p = planOf("mix2_token_budget")
      !p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
        p.contains("BroadcastHashJoin")
    }
    // w17: the index joins broadcast (never a data shuffle join) and the
    // lag + rolling-moment windows share ONE Sort — a second Sort would
    // mean the two window frames stopped sharing the (user_id, day) order
    val w17 = planOf("w17_rolling_beta")
    check("w17: broadcast index join, one shared Sort under both windows") {
      w17.contains("BroadcastHashJoin") && !w17.contains("SortMergeJoin") &&
        "\\bSort \\[".r.findAllIn(w17).length == 1 &&
        "\\bWindow \\[".r.findAllIn(w17).length == 2
    }
    // sim6: every join rides a broadcast of the tiny side (probes with
    // LUTs against the encoded corpus; pool + query dims against the
    // rerank scan) — the corpus is never shuffle-joined or cartesian'd
    check("sim6: probes/pool broadcast against corpus scans, no shuffle join") {
      val p = planOf("sim6_pq_topk")
      p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
        !p.contains("CartesianProduct")
    }
    // mlprep_scaler: the fit statistics ride 1-row broadcast cross joins
    // back onto the transform scan — never a cartesian or shuffle join
    check("mlprep_scaler: stats broadcast onto the transform scan") {
      val p = planOf("mlprep_scaler")
      !p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
        p.contains("BroadcastNestedLoopJoin")
    }
    // a24: the contingency marginals + statistic are windows over the
    // CELL table (one data-sized exchange for the groupBy; the window
    // exchanges move ≤ |types|×|tiers| rows)
    check("a24: one data-sized aggregate below the cell windows") {
      val p = planOf("a24_chisq")
      "\\bWindow \\[".r.findAllIn(p).length >= 3 &&
        !p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
    }
    // o6: keyset pagination — the cursor predicate reaches the scan and
    // the page compiles to TakeOrdered (each page is O(page), no matter
    // how deep the cursor: the whole point vs OFFSET)
    check("o6: cursor predicate pushed, page is TakeOrdered") {
      val p = planOf("o6_keyset_page")
      p.contains("TakeOrdered") && p.contains("PushedFilters: [Or(")
    }
    // j11: the Bloom filter rides a ONE-ROW broadcast (always a
    // BroadcastNestedLoopJoin, at any scale) onto the fact scan; nothing
    // in the plan is a cartesian
    check("j11: bloom rides a 1-row broadcast, no cartesian") {
      val p = planOf("j11_bloom_prune")
      p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct")
    }
    // tx13: exactly ONE window (the per-doc top-k) — a second Window or a
    // cartesian would mean the idf join or corpus-count broadcast broke
    check("tx13: single per-doc window, no cartesian") {
      val p = planOf("tx13_tfidf")
      "\\bWindow \\[".r.findAllIn(p).length == 1 &&
        !p.contains("CartesianProduct")
    }
    // a28: the 256-cell sketch broadcasts onto the point queries and the
    // top-k compiles to TakeOrdered, never a global sort
    check("a28: broadcast sketch join + TakeOrdered top-k") {
      val p = planOf("a28_cms_topk")
      p.contains("BroadcastHashJoin") && p.contains("TakeOrdered")
    }
    // tx9: the gram-count shuffle is keyed on the hashed (ord,g1,g2,g3)
    // long tuple — gram TEXT must never appear as a shuffle key (the
    // dedup-family rule; tx12/dd5 follow it, round-4 tx9 violated it)
    check("tx9: gram shuffle keyed on hash longs, never gram strings") {
      val p = planOf("tx9_repetition")
      p.contains("g1") && !p.toLowerCase.contains("gram#")
    }
    // mm1: media metadata + offset sampling is a pure projection + a
    // 4-element explode — ZERO exchanges of any kind; the payload bytes
    // never leave the scan
    check("mm1: zero shuffles in the media-metadata plan") {
      !planOf("mm1_media_metadata").contains("Exchange")
    }
    // tx15: chunk segmentation is projection + explode only — no KEYED
    // shuffle at any corpus size (the dd9 no-pairwise rule; the one
    // roundrobin exchange is Tables.fanOut spreading the single fixture
    // file across cores, absent on a real multi-file table)
    check("tx15: no keyed shuffle in the chunking plan") {
      !planOf("tx15_chunk_windows").contains("Exchange hashpartitioning")
    }
    // dd10: the calibration audit reads the materialized signature stage
    // (never re-shingles the corpus) and its pair space is the bucketed
    // band join — no cartesian anywhere
    check("dd10: stage read + bucketed candidates, no cartesian") {
      val p = planOf("dd10_minhash_calibration")
      p.contains("graft_dedup_stage") && !p.contains("CartesianProduct")
    }
    // dd11: the containment pair space is the integer-keyed postings
    // self-join (never a cartesian), and the per-doc fingerprint-size
    // lookups ride broadcasts — the big shuffle moves only (doc_id, w)
    // long pairs, the winnowed print arrays stay inside their scan stage
    check("dd11: integer-keyed postings join, broadcast sizes, no cartesian") {
      val p = planOf("dd11_containment")
      !p.contains("CartesianProduct") &&
        p.contains("Exchange hashpartitioning(w") &&
        "BroadcastHashJoin".r.findAllIn(p).length >= 2
    }
    // dd12: the incremental gate reads the MATERIALIZED stage on both
    // sides (exact gate from membership, near gate from profile
    // signatures — the corpus text is never re-shingled), the batch's
    // band keys ride broadcasts, and the pair space is never a cartesian
    check("dd12: stage read on both gates, broadcast batch, no cartesian") {
      val p = planOf("dd12_incremental_dedup")
      p.contains("graft_dedup_stage") && !p.contains("CartesianProduct") &&
        "BroadcastHashJoin".r.findAllIn(p).length >= 2
    }
    // a33: the HLL sketch must aggregate registers BEFORE the exchange —
    // a partial_max on rho proves the map-side fold (the shuffle carries
    // ≤ groups×256 register rows, not the input), and the audit branch is
    // the only count-distinct
    check("a33: map-side partial register fold before the shuffle") {
      val p = planOf("a33_hll_distinct")
      p.contains("partial_max(rho") && !p.contains("CartesianProduct")
    }
    // a35: the cube's Expand must collapse MAP-SIDE — a partial
    // aggregate between Expand and the exchange proves the shuffle
    // carries subtotal cells, not input-rows × grouping-sets
    check("a35: Expand collapsed by a partial aggregate before the shuffle") {
      val p = planOf("a35_cube")
      p.contains("Expand") && p.contains("partial_count")
    }
    // j12: the star rollup — the region predicate is pushed into the
    // dimension scan and the dims ride broadcast joins; never a
    // cartesian. (The orders⋈lineitem join broadcasts at fixture scale
    // and becomes the one orderkey exchange at 100 TB — both are right
    // for their scale, so only scale-invariant properties are pinned.)
    check("j12: region filter pushed, dims broadcast, no cartesian") {
      val p = planOf("j12_star_revenue")
      p.contains("EqualTo(r_name,ASIA)") &&
        "BroadcastHashJoin".r.findAllIn(p).length >= 2 &&
        !p.contains("CartesianProduct")
    }
    // g1's rounds are lineage-cut per iteration (the ConnectedComponents
    // doctrine): the final plan must read the checkpointed rank frame, not
    // restack 8 iterations of joins into one tree
    check("g1: iteration lineage cut (final plan reads checkpointed ranks)") {
      planOf("g1_pagerank").contains("ExistingRDD")
    }
    // g2's triangle enumeration: integer-keyed equi-joins only — a
    // CartesianProduct here means a join key degenerated to a filter
    check("g2: triangle joins integer-keyed, no cartesian") {
      val p = planOf("g2_triangle_count")
      !p.contains("CartesianProduct") && p.contains("Exchange hashpartitioning")
    }
    // j14's candidate generation is token-BLOCKED: every join is an
    // equi-join on the blocking key / entity name — an all-pairs verify
    // would surface as a cartesian
    check("j14: blocked equi-joins only, no cartesian") {
      !planOf("j14_fuzzy_blocking").contains("CartesianProduct")
    }
    // sim9 audits the INDEX, so it must read the materialized stage (cid
    // included), never re-quantize/re-assign the corpus inline
    check("sim9: reads the vector-index stage, no cartesian") {
      val p = planOf("sim9_centroid_drift")
      p.contains("graft_embed_stage") && !p.contains("CartesianProduct")
    }
    // w26: the lag window and the running-sum window share the SAME
    // (user_id / ts,event_id) partitioning+ordering — one exchange for
    // the whole indicator, a second would mean the frames diverged
    check("w26: one shared exchange for lag + cumulative windows") {
      "Exchange hashpartitioning".r.findAllIn(planOf("w26_obv")).length == 1
    }
    // a40: rank window, count window and the final per-user aggregate all
    // reuse ONE user_id exchange (the groupBy must not re-shuffle what
    // the windows already partitioned)
    check("a40: single user_id exchange for windows + final aggregate") {
      "Exchange hashpartitioning".r
        .findAllIn(planOf("a40_var_cvar")).length == 1
    }
    // a39: daily-rollup exchange + user_id window exchange only — the
    // final moment aggregate reuses the window's partitioning
    check("a39: final aggregate reuses the window exchange") {
      "Exchange hashpartitioning".r
        .findAllIn(planOf("a39_yang_zhang")).length == 2
    }
    // w27: the OHLC rollup and the oscillator windows are the only
    // keyed exchanges (%K quantization and %D stay in the window stage)
    check("w27: two keyed exchanges (rollup + window stage)") {
      "Exchange hashpartitioning".r
        .findAllIn(planOf("w27_stochastic")).length == 2
    }
    // mix4: the rank window partitions by source — the data-sized
    // window must never run on a single partition (the 8-row audit
    // window above the shard aggregate is the only global step)
    check("mix4: size-rank window partitioned by source, no cartesian") {
      val p = planOf("mix4_shard_snake")
      p.contains("Exchange hashpartitioning(source") &&
        !p.contains("CartesianProduct")
    }
    // mix5: the rank-filter pushes down as WindowGroupLimit — each
    // partition pre-selects its top-k BEFORE the source exchange, so the
    // shuffle carries ~k rows per partition, not the corpus
    check("mix5: WindowGroupLimit pushdown on the weighted-sample rank") {
      val p = planOf("mix5_weighted_sample")
      p.contains("WindowGroupLimit") && !p.contains("CartesianProduct")
    }
    // class balance: the minority count rides a 1-row broadcast onto the
    // label-partitioned rank window — never a cartesian/shuffle join
    check("mlprep_class_balance: 1-row broadcast, label-keyed window") {
      val p = planOf("mlprep_class_balance")
      p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct") && !p.contains("SortMergeJoin")
    }
    // pl20: manifest-stats pruning must actually skip files — the 5-day
    // range over the 6-file range layout schedules ≤ 2 data files (file
    // skipping happens at manifest-resolution time, before the plan, so
    // the proof is the scheduled file list, not a plan string)
    check("pl20: pruned scan schedules ≤ 2 of the 6 committed files") {
      val files = qs("pl20_stats_pruned_scan")(spark, "/root/testdata/sf0.01")
        .inputFiles.filter(_.contains("graft_snapstats"))
      files.nonEmpty && files.length <= 2
    }
    // mm2: the per-kind manifest rollup is ONE hash aggregate — the only
    // exchange is the |kinds|-row partial-agg shuffle (plus fanOut-free
    // scan), never a sort or join
    check("mm2: single aggregate exchange, no join/sort") {
      val p = planOf("mm2_kind_rollup")
      "Exchange hashpartitioning".r.findAllIn(p).length == 1 &&
        !p.contains("Join") && !p.contains("CartesianProduct")
    }
    // mm3: the frame→vector association is an equi-join on vec_id (never a
    // cartesian). The guarded property is purely NEGATIVE plus the
    // equi-join's presence — the 1-row n_vecs attachment may legally plan
    // as BroadcastNestedLoopJoin or anything else non-cartesian Spark/AQE
    // picks, so no specific operator is required for it.
    check("mm3: vec_id equi-join present, no cartesian") {
      val p = planOf("mm3_frame_vector_join")
      !p.contains("CartesianProduct") &&
        (p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
          p.contains("SortMergeJoin"))
    }
    // multimodal payload pruning: a metadata-only projection over a REAL
    // binary-payload parquet table must not read the payload column at the
    // scan (columnar prune — at 100 TB this is "scan KBs of metadata, not
    // TBs of media bytes")
    check("multimodal: metadata-only scan prunes the binary payload column") {
      import org.apache.spark.sql.Row
      import graft.operators.Multimodal
      val tmp = Sinks.dir(spark, "plans_media")
      val rows = (1L to 64L).map { i =>
        Row(i, Seq("image", "audio", "video")(i.toInt % 3),
          Array.fill[Byte](128)((i % 127).toByte),
          if (i % 3 == 0) Int.box(640) else null,
          if (i % 3 == 0) Int.box(480) else null,
          if (i % 3 != 0) Long.box(i * 1000L) else null)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
        .write.mode("overwrite").parquet(tmp)
      val plan = spark.read.parquet(tmp)
        .groupBy("kind").count()
        .queryExecution.executedPlan.toString
      val scanLines = plan.linesIterator
        .filter(l => l.contains("ReadSchema")).toSeq
      scanLines.nonEmpty && scanLines.forall { l =>
        val schema = l.substring(l.indexOf("ReadSchema"))
        schema.contains("kind") && !schema.contains("payload")
      }
    }
    // mm4's shape over a REAL binary table: chunk-checksum dedup groups on
    // the STORED checksum metadata column — the payload bytes must stay
    // pruned at the scan (at 100 TB the dedup pass reads digests, not
    // media)
    check("mm4 shape: checksum dedup scan prunes the binary payload column") {
      import org.apache.spark.sql.functions.{col, count, lit, md5, min}
      val tmp = Sinks.dir(spark, "plans_media_ck")
      spark.read.parquet(Sinks.dir(spark, "plans_media"))
        .withColumn("chunk_checksum", md5(col("payload")))
        .write.mode("overwrite").parquet(tmp)
      val plan = spark.read.parquet(tmp)
        .groupBy("chunk_checksum")
        .agg(min("media_id"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .queryExecution.executedPlan.toString
      val scanLines = plan.linesIterator
        .filter(l => l.contains("ReadSchema")).toSeq
      scanLines.nonEmpty && scanLines.forall { l =>
        val schema = l.substring(l.indexOf("ReadSchema"))
        schema.contains("chunk_checksum") && !schema.contains("payload")
      }
    }
    // u8's contract at the I/O layer: the incremental read SCHEDULES only
    // the files the later commits added — the manifest set-difference
    // decides before any scan task exists (tailing a 100 TB table costs
    // the appended bytes)
    check("u8 shape: incremental append scan reads only the added files") {
      import org.apache.spark.sql.functions.input_file_name
      import graft.operators.SnapshotTable
      val t = Sinks.dir(spark, "plans_incr")
      val p = new org.apache.hadoop.fs.Path(t)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      SnapshotTable.commit(spark, spark.range(0, 100).toDF("id")
        .repartition(4), t)
      SnapshotTable.commit(spark, spark.range(100, 120).toDF("id")
        .repartition(2), t, replace = false)
      val added = SnapshotTable.entries(spark, t, Some(2)).size -
        SnapshotTable.entries(spark, t, Some(1)).size
      val readFiles = SnapshotTable.readAppendsSince(spark, t, 1)
        .select(input_file_name()).distinct().count()
      added == 2 && readFiles == added
    }
    // mlprep_eval_report's scale contract: the rank/cumulative window runs
    // over the score HISTOGRAM, never the raw rows — every Window in the
    // plan must sit on top of a hash aggregate
    check("eval_report shape: windows run over the histogram aggregate") {
      val plan = planOf("mlprep_eval_report")
      val lastWin = plan.lastIndexOf("Window")
      lastWin > 0 && plan.indexOf("HashAggregate", lastWin) > lastWin
    }
    // sim10's corpus side must stream against BROADCAST query/pool frames
    // only (the pool is NQ×R rows by construction) — any shuffle join or
    // cartesian means the rerank pulled the corpus through an exchange
    check("sim10: pool rides broadcast joins, no cartesian") {
      val p = planOf("sim10_mmr_rerank")
      !p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
        !p.contains("ShuffledHashJoin")
    }
    // sim11's Lloyd iteration: the refined centroids ride a 1-row
    // broadcast and reassignment is a per-row fold — the corpus must
    // never be exchanged by vec_id (no explode-×C + re-group, no
    // per-vector window), and no shuffle join anywhere
    check("sim11: reassignment folds in-row, corpus never keyed by vec_id") {
      val p = planOf("sim11_kmeans_refine")
      !p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
        !p.contains("hashpartitioning(vec_id")
    }
    // readMor's delete-vector subtraction: the key file is small by
    // construction (matched keys, not data), so the anti-join must
    // BROADCAST it onto the data scan — a shuffle anti-join would re-key
    // the whole table to subtract a handful of keys
    check("readMor: delete vectors subtract via broadcast anti-join") {
      import graft.operators.SnapshotTable
      import org.apache.spark.sql.functions.col
      val t = java.nio.file.Files
        .createTempDirectory("graft_plans_mor").toString + "/t"
      SnapshotTable.commit(spark,
        spark.range(0, 1000).toDF("id"), t)
      SnapshotTable.deleteWhere(spark, t, "id", col("id") % 7 === 0)
      val p = SnapshotTable.readMor(spark, t)
        .queryExecution.executedPlan.toString
      p.contains("BroadcastHashJoin") && p.contains("LeftAnti") &&
        !p.contains("SortMergeJoin")
    }
    // sim12 holds sim11's invariant across every training round
    check("sim12: no corpus shuffle in any training round") {
      val p = planOf("sim12_kmeans_train")
      !p.contains("CartesianProduct") &&
        !p.contains("hashpartitioning(vec_id")
    }
    // mix6's LM count tables must BROADCAST onto the token stream (they
    // are ≤ B rows by the hash-bucket construction) — a shuffle join
    // there would re-key the whole token explosion
    check("mix6: LM dims broadcast, token stream never shuffle-joined") {
      val p = planOf("mix6_dsir_select")
      !p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
        !p.contains("CartesianProduct")
    }
    // dd13: the canonical pick must not broadcast the (unbounded)
    // cluster membership — only the cluster-size dim rides broadcast
    check("dd13: no cartesian in the canonical selection") {
      val p = planOf("dd13_cluster_canonical")
      !p.contains("CartesianProduct")
    }
    // sim13: both retrieval legs must pool via TakeOrdered (top-R, never
    // a global sort/rank of the corpus) and the 1-row stat/query
    // broadcasts must never degrade to a cartesian
    check("sim13: TakeOrdered pools on both legs, no cartesian") {
      val p = planOf("sim13_hybrid_rrf")
      "TakeOrdered".r.findAllIn(p).length >= 2 &&
        !p.contains("CartesianProduct")
    }
    // a42: the data-sized work is ONE hash-agg shuffle; the CDF window
    // and final agg share the user_id partitioning (no third exchange)
    check("a42: at most two exchanges (cells agg + user window)") {
      "Exchange hashpartitioning".r
        .findAllIn(planOf("a42_ks_drift")).length <= 2
    }
    // psi: decile edges and totals ride broadcast onto the scan — a
    // shuffle join anywhere would re-key the events for a 10-row dim
    check("psi: edges/totals broadcast, no shuffle join") {
      val p = planOf("mlprep_psi_drift")
      !p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
        !p.contains("CartesianProduct")
    }
    // sim14: the kNN join's pair space must come from the cell equi key
    // (Σ|cell|² bounded), never an all-pairs loop over the corpus; and
    // the top-k window must rank the pair stream INSIDE the join's cid
    // partitioning (window keys (cid, query_id) — a superset of the
    // join key, so no second exchange of the Σ|cell|²-row intermediate;
    // only the two join-input exchanges may appear)
    check("sim14: cell equi-join, no all-pairs scan, no pair re-shuffle") {
      val p = planOf("sim14_knn_join")
      !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin") &&
        "Exchange hashpartitioning".r.findAllIn(p).size == 2
    }
    // j16: the key-free interval join must ride the bucket EQUI key
    // (hash/SMJ/broadcast-hash — partition-parallel at any scale), never
    // a nested-loop/cartesian range scan
    check("j16: bucket equi-join, no nested-loop range scan") {
      val p = planOf("j16_grid_interval_join")
      !p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct")
    }
    // pl26: both sides are WRITTEN bucketed on the join key, so the
    // SortMergeJoin must consume the bucket layout directly — any
    // Exchange here means the layout-level shuffle elimination (the
    // whole point of bucketing a 100 TB fact table) silently broke
    check("pl26: bucketed SMJ, zero exchanges") {
      val p = planOf("pl26_bucketed_join")
      p.contains("SortMergeJoin") && !p.contains("Exchange")
    }
    // a45: the transition matrix is event_type^2 rows — its
    // row-normalizing join must broadcast, never re-shuffle
    check("a45: broadcast row-normalization join") {
      val p = planOf("a45_markov_transitions")
      p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")
    }
    // j17: the fact scan's PartitionFilters must carry the runtime
    // dim-derived day set — without it the partitioned fact is read in
    // full and the row proves nothing
    check("j17: dynamic partition pruning on the fact scan") {
      planOf("j17_dpp_prune").toLowerCase.contains("dynamicpruning")
    }
    // a46: grouping sets are ONE Expand + hash-agg pass over the scan —
    // a second exchange would mean the grains re-shuffled separately
    check("a46: one Expand, at most one exchange") {
      val p = planOf("a46_grouping_sets")
      p.contains("Expand") &&
        "Exchange hashpartitioning".r.findAllIn(p).length <= 1
    }
    // pl27: the native session rollup is one user-keyed exchange (the
    // hand-rolled pl2 needs the same exchange TWICE: lag pass + agg)
    check("pl27: single exchange for the native session window") {
      "Exchange hashpartitioning".r
        .findAllIn(planOf("pl27_native_session")).length == 1
    }
    // w28: the RANGE frame costs the same single user-keyed exchange
    // as any ROWS battery — a second exchange means the frame mode
    // broke the shared partitioning
    check("w28: single exchange for the RANGE frame") {
      "Exchange hashpartitioning".r
        .findAllIn(planOf("w28_range_frame")).length == 1
    }
    // a48: the 9-row expectation dim and the 1-row total attach by
    // broadcast — any shuffle join re-keys the corpus for constants
    check("a48: broadcast-only joins") {
      val p = planOf("a48_benford")
      !p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
    }
    // pl28: the MV rewrite must answer from the summary scan; the base
    // fact table never opens
    check("pl28: aggregate answered from the MV, base table unread") {
      val p = planOf("pl28_mv_rewrite")
      p.contains("mv_counts") && !p.contains("events.parquet")
    }
    // o8: the custom whole-operator top-k — partial heap BELOW the one
    // group-key exchange, final heap above, zero Window/Sort machinery
    // (the stock plan would Sort every partition end to end)
    check("o8: partial+final GroupTopK around one exchange, no sort") {
      val p = planOf("o8_group_topk")
      "GroupTopK \\[".r.findAllIn(p).length == 2 &&
        "Exchange hashpartitioning".r.findAllIn(p).length == 1 &&
        !p.contains("Window") && !"\\bSort \\[".r.findAllIn(p).hasNext
    }
    // sql3: the correlated scalar subquery must DECORRELATE — one
    // per-part aggregate equi-joined back to the fact (two lineitem
    // scans total), never a per-row subquery re-scan
    check("sql3: subquery decorrelated to aggregate + equi-join") {
      val p = planOf("sql3_decorrelated_subquery")
      !p.contains("Subquery") &&
        (p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
          p.contains("ShuffledHashJoin")) &&
        "Scan parquet".r.findAllIn(p).length == 2
    }
    // a50: the native sketch aggregate runs as partial+final
    // ObjectHashAggregate — the shuffle carries 256-byte register
    // buffers per (group, map task), never per-row (bucket, rho) cells
    check("a50: partial+final ObjectHashAggregate on the sketch") {
      "ObjectHashAggregate".r
        .findAllIn(planOf("a50_hll_native")).length >= 2
    }
    // sim17: the benchmark side rides broadcasts (bucket collision,
    // candidate scoring) — no cartesian; the ONE shuffle join allowed
    // is the final corpus-universe LEFT join, whose both sides are
    // corpus-sized and co-keyed (the correct plan at any scale)
    check("sim17: benchmark broadcast, one corpus-keyed outer join") {
      val p = planOf("sim17_semantic_decon")
      p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct") &&
        "SortMergeJoin".r.findAllIn(p).length <= 1
    }
    // mlprep_logit: the whole IRLS fit is the logit_fit4 typed
    // aggregate over ONE scan — no per-step joins or windows at all
    // (round 9's fusion; before that, β-frame broadcasts per step)
    check("mlprep_logit: one scan into the logit_fit4 aggregate") {
      val p = planOf("mlprep_logit")
      p.contains("logit_fit4") &&
        "Scan parquet".r.findAllIn(p).length == 1 &&
        !p.contains("Window") && !p.contains("Join")
    }
    // mlprep_gbt: all four boosting rounds inside gbt_fit4 — same shape
    check("mlprep_gbt: one scan into the gbt_fit4 aggregate") {
      val p = planOf("mlprep_gbt")
      p.contains("gbt_fit4") &&
        "Scan parquet".r.findAllIn(p).length == 1 &&
        !p.contains("Window") && !p.contains("Join")
    }
    // mlprep_tree: the whole depth-3 search is the tree_fit3 typed
    // aggregate over ONE scan — no window stages, no level joins, no
    // cache (round 9's fusion; the old shape was ~a dozen tiny stages)
    check("mlprep_tree: one scan into the tree_fit3 aggregate, no joins") {
      val p = planOf("mlprep_tree")
      p.contains("tree_fit3") &&
        "Scan parquet".r.findAllIn(p).length == 1 &&
        !p.contains("Window") && !p.contains("Join")
    }
    // mlprep_importance: same aggregate; the normalizer join reads the
    // cached groups-sized imps frame, so the corpus aggregation chain
    // (partial_tree_fit3) appears exactly once — raw scan-string counts
    // are unreliable here because the IMTS description re-prints the
    // shared cached subtree
    // (plan.toString re-prints the shared cached subtree under every
    // IMTS reference, so exact chain counts are not assertable here —
    // the cache's existence + the absence of window/SMJ stages is the
    // robust textual form of "one corpus aggregation")
    check("mlprep_importance: tree_fit3 into a cached normalizer") {
      val p = planOf("mlprep_importance")
      p.contains("tree_fit3") && p.contains("InMemoryTableScan") &&
        !p.contains("Window") && !p.contains("SortMergeJoin")
    }
    // mlprep_sweep: the λ-grid cross join is STATS-sized (broadcast
    // nested loop over the cached moment table); every branch reads the
    // cache, so no raw scan appears outside an IMTS description
    check("mlprep_sweep: branches read cached moments; stats-sized BNLJ") {
      val p = planOf("mlprep_sweep")
      val imts = "InMemoryTableScan".r.findAllIn(p).length
      imts > 0 && "Scan parquet".r.findAllIn(p).length == imts &&
        !p.contains("CartesianProduct") && !p.contains("SortMergeJoin")
    }
    // mlprep_forest: the 8-tree fan-out stays map-side (Generate over
    // the one scan into the grid), and everything after the grid is the
    // forest_fit8 aggregate — no joins, no windows, no cache
    check("mlprep_forest: one fan-out scan into forest_fit8, no joins") {
      val p = planOf("mlprep_forest")
      p.contains("forest_fit8") && p.contains("Generate") &&
        "Scan parquet".r.findAllIn(p).length == 1 &&
        !p.contains("Window") && !p.contains("Join")
    }
    // sql4: the parser-tier ASOF sugar must lower to the union+ffill
    // window plan — a Window over one hash exchange — and NEVER a range
    // join (BroadcastNestedLoopJoin/CartesianProduct would mean the
    // O(left×right) lowering a naive ASOF implementation produces)
    check("sql4: ASOF sugar lowers to window ffill, not a range join") {
      val p = planOf("sql4_asof_sugar")
      (p.contains("RunningWindowFunction") || p.contains("Window")) &&
        !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin")
    }
    // mlprep_naive_bayes: the model rollups derive from the cached grid
    // and join back BROADCAST — a shuffle join would re-exchange the
    // grid per model table; nothing data-sized appears twice
    check("mlprep_naive_bayes: cached grid, broadcast model joins") {
      val p = planOf("mlprep_naive_bayes")
      val imts = "InMemoryTableScan".r.findAllIn(p).length
      imts > 0 && "Scan parquet".r.findAllIn(p).length == imts &&
        p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
        !p.contains("CartesianProduct")
    }
    // mlprep_pca: the whole 48-step factorization is ONE corpus scan
    // into one hash aggregate — no join, no second scan, no window; 48
    // iterations must stay pure projection work on the stats frame
    check("mlprep_pca: one scan, one aggregate, join-free iteration") {
      val p = planOf("mlprep_pca")
      "Scan parquet".r.findAllIn(p).length == 1 &&
        !p.contains("Join") && !p.contains("CartesianProduct") &&
        "Exchange hashpartitioning".r.findAllIn(p).length == 1
    }
    // mlprep_learning_curve: prefixes come from the CACHED cumulative
    // frame (one corpus scan feeds it); every boundary/holdout join is
    // broadcast of day-count-sized frames
    check("mlprep_learning_curve: cached cum frame, broadcast joins") {
      val p = planOf("mlprep_learning_curve")
      val imts = "InMemoryTableScan".r.findAllIn(p).length
      imts > 0 && "Scan parquet".r.findAllIn(p).length == imts &&
        !p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
    }
    // mlprep_robust_scaler: the fit side works on the cent-grid
    // HISTOGRAM (a data-sized sort would show as a second Sort under
    // a non-histogram aggregate); the edges reach the transform scan
    // by broadcast, never a shuffle join
    check("mlprep_robust_scaler: histogram fit, broadcast edges") {
      val p = planOf("mlprep_robust_scaler")
      p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("SortMergeJoin") &&
        "InMemoryTableScan".r.findAllIn(p).length > 0
    }
    // mlprep_roc_curve: the curve is windows over the SCORE HISTOGRAM —
    // exactly one data-sized exchange (the histogram aggregate); the
    // window sorts histogram rows, never data rows
    check("mlprep_roc_curve: one data-sized exchange, histogram windows") {
      val p = planOf("mlprep_roc_curve")
      "Scan parquet".r.findAllIn(p).length == 1 && !p.contains("Join")
    }
    // mlprep_permutation_importance: ONE windowed pass (a second
    // window or scan would mean per-feature re-permutation); join-free
    check("mlprep_perm_importance: one scan, one window, join-free") {
      val p = planOf("mlprep_permutation_importance")
      "Scan parquet".r.findAllIn(p).length == 1 &&
        "Window".r.findAllIn(p).length <= 2 && !p.contains("Join")
    }
    // mlprep_elastic_net: the whole λ-path is ONE scan into one
    // aggregate; 40 coordinate updates stay pure projection work
    check("mlprep_elastic_net: one scan, one aggregate, join-free") {
      val p = planOf("mlprep_elastic_net")
      "Scan parquet".r.findAllIn(p).length == 1 && !p.contains("Join") &&
        "Exchange hashpartitioning".r.findAllIn(p).length == 1
    }
    // mlprep_shap_linear: moments, both histograms, and the sample all
    // read the CACHED projection; model/summary attach by broadcast
    check("mlprep_shap_linear: cached corpus pass, broadcast model") {
      val p = planOf("mlprep_shap_linear")
      val imts = "InMemoryTableScan".r.findAllIn(p).length
      imts > 0 && "Scan parquet".r.findAllIn(p).length == imts &&
        p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
        !p.contains("CartesianProduct")
    }
    // a25: the k-th order statistic rides the native KMV aggregate's
    // bounded partial states — a Window here would put each source's
    // whole distinct-gram set through one serial sort task (the 20×
    // probe's only >40× row before kmv_sketch_agg landed)
    check("a25: KMV minima via partial+final aggregate, no window") {
      val p = planOf("a25_kmv_distinct")
      p.contains("kmv_sketch_agg") && !p.contains("Window") &&
        "ObjectHashAggregate".r.findAllIn(p).length >= 2
    }
    // a34: same contract for the overlap sketch BUILD (the windows that
    // remain rank the 128-row pair unions — sketch-sized by construction)
    check("a34: KMV sketch build via aggregate") {
      val p = planOf("a34_kmv_overlap")
      p.contains("kmv_sketch_agg")
    }
    // a25b: the shard and merge tiers are both native sketch aggregates
    // (map-side-combined — partial state is ≤64 longs, the exchanges
    // carry sketches), the exact audit is its own partial-distinct
    // branch, nothing is persisted (the old vocabulary-frame cache was
    // the board's GC outlier), no window anywhere
    check("a25b: sketch-agg tiers, no cache, no window") {
      val p = planOf("a25b_kmv_merge")
      !p.contains("InMemoryTableScan") &&
        "kmv_sketch_agg".r.findAllIn(p).length >= 4 && // 2 tiers × partial+final
        !p.contains("Window")
    }
    // a43: ANALYZE is ONE scan into ONE partial+final aggregate — no
    // melt explode before the agg, no persisted intermediate, no join;
    // the sole exchange carries the fixed-width sketch partials
    check("a43: one scan, one aggregate, no persist/join") {
      val p = planOf("a43_analyze_stats")
      "Scan parquet".r.findAllIn(p).length == 1 &&
        "ObjectHashAggregate".r.findAllIn(p).length >= 2 &&
        !p.contains("InMemoryTableScan") && !p.contains("Join") &&
        "Exchange".r.findAllIn(p).length == 1
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
