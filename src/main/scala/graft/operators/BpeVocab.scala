package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
  * arXiv:1508.07909) — learn the subword merge table a tokenizer ships
  * with, directly on-engine over the corpus the model will train on.
  *
  * Scale shape (the classic word-frequency formulation): the corpus is
  * touched EXACTLY ONCE — one explode + word-count shuffle — and every
  * merge round after that operates on the DISTINCT-WORD table, which is
  * vocabulary-sized (Heaps' law: ~|corpus|^0.5), not corpus-sized. Pair
  * counting weights each adjacent symbol pair by the word's corpus
  * frequency, so the result is identical to scanning raw text. Rounds
  * are driver-ORCHESTRATED but never driver-EVALUATED: the argmax pair
  * is a 1-row frame cross-joined (broadcast) into the rewrite, no data
  * ever `.collect()`s, and each round cuts lineage with an eager
  * `localCheckpoint` (the ConnectedComponents pattern; the word table is
  * small enough that executor-local blocks are the right trade even on a
  * cluster — losing one means recomputing a vocabulary-sized frame).
  *
  * Merge application is the standard greedy left-to-right non-overlapping
  * rewrite, expressed as a fold (`aggregate` HOF): append each symbol
  * unless the accumulator's LAST symbol is `l` and the incoming is `r`,
  * in which case replace the tail with the merged symbol. Because the
  * merged symbol becomes the new tail, overlapping occurrences ("aaa"
  * under (a,a) → [aa, a]) resolve leftmost-first exactly like the
  * reference algorithm.
  *
  * Determinism: ties in pair counts break on (left, right) lexicographic
  * order — byte-stable across runs and partitionings, so two clusters
  * learning on the same corpus ship the same tokenizer.
  */
object BpeVocab {

  /** End-of-word marker appended to every word's symbol sequence, so a
    * word-final subword is distinct from the same subword mid-word (the
    * Sennrich convention). */
  val EndMark = "</w>"

  /** Learned model.
    *
    * @param merges one row per learned merge: rank (1-based), left,
    *               right, merged (= left||right), pair_count at the time
    *               the merge was chosen
    * @param words  the segmented word table: word, cnt, syms (the word's
    *               final subword sequence under all learned merges)
    */
  final case class Model(merges: DataFrame, words: DataFrame) {
    /** Final subword vocabulary with corpus frequencies. */
    def vocab: DataFrame =
      words.select(explode(col("syms")).as("symbol"), col("cnt"))
        .groupBy("symbol").agg(sum("cnt").as("count"))
  }

  /** Learn up to `nMerges` merges from `docs(textCol)` (whitespace
    * pre-tokenization, the TextOps convention). Stops early when no
    * adjacent pair remains (every word collapsed to one symbol). */
  def learn(docs: DataFrame, textCol: String, nMerges: Int): Model = {
    val spark = docs.sparkSession
    import spark.implicits._

    // The ONE corpus-scale pass: word frequencies.
    val freq = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

    // Symbolize: characters + explicit end-of-word marker.
    var words = freq.select(col("word"), col("cnt"),
        concat(split(col("word"), ""), array(lit(EndMark))).as("syms"))
      .localCheckpoint(true)

    var merges = Seq.empty[(Int, String, String, String, Long)]
      .toDF("rank", "left", "right", "merged", "pair_count")
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // Adjacent pairs weighted by word frequency. Single-symbol words
      // carry no pairs and are filtered BEFORE the index sequence (an
      // empty `sequence(1, 0)` would run descending under Spark's
      // sign-inferred step).
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, " +
            "element_at(syms, i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("pair_count"))
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint(true)
      if (best.isEmpty) exhausted = true
      else {
        rank += 1
        merges = merges.union(best.select(lit(rank).as("rank"),
          col("l").as("left"), col("r").as("right"),
          concat(col("l"), col("r")).as("merged"), col("pair_count")))
        // Greedy left-to-right rewrite under the chosen pair; the 1-row
        // winner rides a broadcast cross join, never the driver.
        words = words.crossJoin(broadcast(
            best.select(col("l").as("bl"), col("r").as("br"))))
          .withColumn("syms", expr(
            "aggregate(syms, cast(array() as array<string>), " +
              "(acc, x) -> if(size(acc) > 0 " +
              "and element_at(acc, -1) = bl and x = br, " +
              "concat(slice(acc, 1, size(acc) - 1), " +
              "array(concat(bl, br))), " +
              "concat(acc, array(x))))"))
          .drop("bl", "br")
          .localCheckpoint(true)
      }
    }
    Model(merges.localCheckpoint(true), words)
  }
}
