package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the clustering step
  * a dedup pipeline runs AFTER near-dup pair generation (dd3/dd6): pairs
  * are only evidence; the unit of deduplication is the transitive CLUSTER
  * (a ~ b, b ~ c ⇒ keep one of {a,b,c}).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the minimum of its label
  * and its neighbors' labels; at fixpoint the label is the component's
  * minimum id (the canonical keep id by the engine's keep-first-by-id
  * convention).
  *
  * Scale shape:
  *  - The per-round step is two shuffles of the EDGE frame (join labels on
  *    src, min-aggregate on dst) — no collect of nodes or edges; the only
  *    driver-side value per round is a 1-row checksum aggregate used for
  *    convergence, the same driver-coordinated iteration Pregel/GraphX
  *    run. Rounds are O(component diameter).
  *  - Each round is edge propagation PLUS pointer jumping
  *    (label ← label(label), the Shiloach-Vishkin shortcut): propagation
  *    alone needs O(diameter) rounds, but jumping doubles the distance a
  *    label has travelled each round, so convergence is O(log diameter) —
  *    a 100-link chain closes in ~8 rounds, not 100. The jump is sound
  *    because a label is always the id of a node in the same component, so
  *    that node's own (smaller-or-equal) label is also a valid label.
  *    Near-dup clusters are overwhelmingly stars/cliques anyway (a
  *    template doc + its variants — diameter ≤ ~3); the jump is what makes
  *    the adversarial chain shape cheap too. `maxRounds` still fails fast
  *    (rather than silently truncating clusters) as the backstop; the
  *    edge-rewriting alternative at that point is large-star/small-star
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *    SoCC'14).
  *  - Per-round lineage is cut with an EAGER checkpoint, not persist():
  *    round k's logical plan contains TWO copies of round k-1 (the label
  *    frame feeds both the message join and the fold), so an uncut plan
  *    doubles per round and Catalyst ANALYSIS time — not execution —
  *    becomes the cost (measured: the round-2 plan carried 7000+ nodes
  *    and downstream consumers paid seconds just planning). Checkpointing
  *    pins each round to its materialized RDD, keeping every plan O(1).
  *    TWO modes: the default `localCheckpoint(true)` stores blocks on
  *    executors — fastest, but an executor loss mid-iteration kills the
  *    job (blocks are unrecoverable); passing `checkpointDir` switches
  *    every cut to a RELIABLE `checkpoint()` against that directory
  *    (HDFS/object store on a cluster), which survives executor loss at
  *    the price of a filesystem write per round — the right trade for a
  *    multi-hour 100 TB dedup run. Both modes execute the identical
  *    label-propagation plans (spec-proven equal output).
  *  - Convergence check: labels only ever DECREASE, so Σlabels strictly
  *    decreases every round until fixpoint — equality of two consecutive
  *    checksums is exact convergence, one scalar per round, no
  *    frame-compare join.
  */
object ConnectedComponents {

  /** Rounds after which [[run]] throws instead of returning a possibly
    * under-merged clustering. With pointer jumping, rounds grow with
    * log2(diameter) — 50 rounds covers diameters around 2^50, so hitting
    * the cap means something is structurally wrong, not merely big. */
  val MaxRounds = 50

  /** (doc_id, cluster_id) for every doc appearing in `pairs`
    * (columns `doc_a`, `doc_b`); cluster_id = min doc_id of the
    * component. The result is checkpointed — safe to reuse in any number
    * of downstream consumers without replaying the iteration.
    *
    * @param checkpointDir when set, per-round lineage cuts use reliable
    *   `checkpoint()` files under this directory (survives executor loss;
    *   set it to a DFS path on a real cluster) instead of executor-local
    *   blocks. Output is identical in both modes.
    */
  def run(pairs: DataFrame, maxRounds: Int = MaxRounds,
          checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(true)
    // checkpoint the INPUT before mirroring it: edges = pairs ∪ reverse
    // reads the pair plan twice, and the caller's pair generator (an LSH
    // candidate join + exact verify) is far too expensive to execute per
    // branch. In a composed pipeline `pairs` is dd6's materialized output
    // table and this is a cheap re-read.
    val p = cut(pairs)
    val edges = cut(p
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(p.select(col("doc_b").as("src"),
        col("doc_a").as("dst"))))
    var labels = cut(edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("label")))
    def checksum(df: DataFrame): Long =
      df.agg(coalesce(sum("label"), lit(0L))).first().getLong(0)
    var curSum = checksum(labels)
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      require(rounds <= maxRounds,
        s"connected components did not converge in $maxRounds rounds — " +
        "chain-shaped dup graph; use a large-star/small-star variant")
      val msgs = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min("label").as("nbr_min"))
      val prop = labels.join(msgs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
      // pointer jump: follow the label one hop through the label table
      // itself (label is a node id, so it has a row) — doubles the
      // propagation distance per round
      val next = cut(prop
        .join(prop.select(col("doc_id").as("label"),
          col("label").as("jump")), Seq("label"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("jump"), col("label")))
            .as("label")))
      val nextSum = checksum(next)
      labels = next
      if (nextSum == curSum) converged = true else curSum = nextSum
    }
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }
}
