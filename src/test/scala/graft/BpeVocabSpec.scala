package graft

import graft.operators.BpeVocab
import org.apache.spark.sql.functions._

/** BPE vocabulary induction vs an independent in-memory reference
  * implementation of the Sennrich et al. algorithm (word-frequency
  * formulation, greedy leftmost-first merge application, ties on
  * (left, right) lexicographic order). */
class BpeVocabSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: pure Scala, no Spark. */
  private def refBpe(wordFreq: Map[String, Long], nMerges: Int)
      : (List[(Int, String, String, String, Long)],
         Map[String, List[String]]) = {
    var words: Map[String, (List[String], Long)] = wordFreq.map {
      case (w, c) =>
        w -> (w.toCharArray.map(_.toString).toList :+ BpeVocab.EndMark, c)
    }
    var merges = List.empty[(Int, String, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val pairs = collection.mutable.Map.empty[(String, String), Long]
      for ((_, (syms, c)) <- words; Seq(l, r) <- syms.sliding(2))
        pairs((l, r)) = pairs.getOrElse((l, r), 0L) + c
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.minBy { case ((pl, pr), pc) =>
          (-pc, pl, pr)
        }
        rank += 1
        merges :+= ((rank, l, r, l + r, c))
        words = words.map { case (w, (syms, cnt)) =>
          val merged = syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
          w -> (merged, cnt)
        }
      }
    }
    (merges, words.map { case (w, (syms, _)) => w -> syms })
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest widest")

  test("merge sequence matches the reference implementation") {
    val docs = corpus.toDF("text")
    val model = BpeVocab.learn(docs, "text", nMerges = 12)

    val wordFreq = corpus.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val (refMerges, refWords) = refBpe(wordFreq, 12)

    val got = model.merges
      .select("rank", "left", "right", "merged", "pair_count")
      .as[(Int, String, String, String, Long)]
      .collect().sortBy(_._1).toList
    assert(got == refMerges)

    val gotWords = model.words.select("word", "syms")
      .as[(String, Seq[String])].collect()
      .map { case (w, s) => w -> s.toList }.toMap
    assert(gotWords == refWords)
  }

  test("vocab aggregates surviving symbols weighted by word frequency") {
    val docs = corpus.toDF("text")
    val model = BpeVocab.learn(docs, "text", nMerges = 8)
    val vocab = model.vocab.as[(String, Long)].collect().toMap
    // every symbol in the segmented words appears in the vocab, with
    // count = Σ word-frequency × occurrences-in-word
    val words = model.words.select("cnt", "syms")
      .as[(Long, Seq[String])].collect()
    val expected = words.flatMap { case (c, syms) => syms.map(_ -> c) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    assert(vocab == expected)
  }

  test("deterministic across runs and early-stops when no pairs remain") {
    val docs = Seq("a b a b a").toDF("text")
    val m1 = BpeVocab.learn(docs, "text", nMerges = 50)
    val m2 = BpeVocab.learn(docs, "text", nMerges = 50)
    val s1 = m1.merges.as[(Int, String, String, String, Long)]
      .collect().sortBy(_._1).toSeq
    val s2 = m2.merges.as[(Int, String, String, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(s1 == s2)
    // "a"/"b" fully collapse after 2 merges each (char+</w>); the loop
    // must stop well short of 50
    assert(s1.size < 50)
    assert(m1.words.filter(size(col("syms")) > 1).count() == 0)
  }

  test("overlapping occurrences merge leftmost-first") {
    // word "aaa": under merge (a,a) → [aa, a], never [a, aa]
    val docs = Seq("aaa aaa aaa aa").toDF("text")
    val model = BpeVocab.learn(docs, "text", nMerges = 1)
    val first = model.merges
      .select("left", "right").as[(String, String)].collect().head
    assert(first == ("a", "a"))
    val segmented = model.words.filter(col("word") === "aaa")
      .select("syms").as[Seq[String]].collect().head.toList
    assert(segmented == List("aa", "a", BpeVocab.EndMark))
  }
}
