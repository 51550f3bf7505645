package graft

import graft.operators.SnapshotTable._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Model-based property test for the snapshot table's merge-on-read
  * surface: a random sequence of appends, equality deletes, keyed
  * upserts, and compactions runs against BOTH the real table and an
  * in-memory multiset model of its rows; after every operation,
  * `readMor(head)` must equal the model exactly. This covers the
  * interleavings the example-based tests can't enumerate —
  * delete → re-insert → delete again, compaction folding mid-sequence,
  * upserts over delete-vectored bases, deletes whose key set is empty.
  */
class SnapshotMorModelSpec extends SparkSpec {

  private sealed trait Op
  private case class Append(rows: List[(Long, String)]) extends Op
  private case class Delete(k: Long, r: Long) extends Op // id % k == r
  private case class Upsert(rows: List[(Long, String)]) extends Op
  private case object Compact extends Op

  private val rowGen: Gen[(Long, String)] = for {
    id <- Gen.choose(0L, 9L)
    v <- Gen.choose(0, 99)
  } yield (id, s"v$v")

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, rowGen)).map(Append),
    3 -> (for { k <- Gen.choose(2L, 4L); r <- Gen.choose(0L, 3L) }
      yield Delete(k, r % k)),
    2 -> Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, rowGen)).map(Upsert),
    1 -> Gen.const(Compact))

  private val scenarioGen: Gen[(List[(Long, String)], List[Op])] = for {
    seed <- Gen.choose(2, 5).flatMap(n => Gen.listOfN(n, rowGen))
    ops <- Gen.choose(3, 6).flatMap(n => Gen.listOfN(n, opGen))
  } yield (seed, ops)

  /** scalatestplus bridge is not in the offline cache (PropertySpecs
    * doctrine): drive the generator directly with fixed seeds. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1L to 5L).foreach { s =>
      gen.apply(Gen.Parameters.default, Seed(s)).foreach(body)
    }

  test("readMor equals the multiset model after every random op") {
    val s = spark
    import s.implicits._
    forAll(scenarioGen) { case (seed, ops) =>
      val t = java.nio.file.Files
        .createTempDirectory("graft_mor_model").toString + "/t"
      commit(spark, seed.toDF("id", "x"), t)
      var model: List[(Long, String)] = seed
      def checkEqual(after: String): Unit = {
        val got = readMor(spark, t).as[(Long, String)].collect().toList
        assert(got.sorted == model.sorted,
          s"divergence after $after: table=${got.sorted} " +
            s"model=${model.sorted} (ops=$ops)")
      }
      checkEqual("seed")
      ops.foreach { op =>
        op match {
          case Append(rows) =>
            commit(spark, rows.toDF("id", "x"), t, replace = false)
            model = model ++ rows
          case Delete(k, r) =>
            deleteWhere(spark, t, "id", col("id") % k === r)
            // equality delete: EVERY current row whose id matches goes
            val doomed = model.collect {
              case (id, _) if id % k == r => id
            }.toSet
            model = model.filterNot { case (id, _) => doomed.contains(id) }
          case Upsert(rows) =>
            // keyed source-wins merge; duplicate source ids collapse to
            // the first by orderCol (here: min x, via the "x" ordering)
            upsertSnapshot(spark, rows.toDF("id", "x"), t,
              keyCols = Seq("id"), orderCol = "x")
            val deduped = rows.groupBy(_._1).map { case (_, g) =>
              g.minBy(_._2)
            }.toList
            val srcIds = deduped.map(_._1).toSet
            model = model.filterNot { case (id, _) =>
              srcIds.contains(id)
            } ++ deduped
          case Compact =>
            compactSnapshot(spark, t)
          // a compaction folds deletes; the visible rows are unchanged
        }
        checkEqual(op.toString)
      }
    }
  }
}
