package graft

import graft.operators.TextOps.hash32
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Count-min-sketch invariant behind a28_cms_topk: the estimate NEVER
  * undercounts (each of the d counters holds the key's count plus
  * colliding mass; min over d can't dip below the true count), over
  * random skewed key streams.
  */
class CmsSpec extends SparkSpec {

  import spark.implicits._

  private val W = 64

  private def bucketOf(u: org.apache.spark.sql.Column,
                       ri: org.apache.spark.sql.Column) =
    hash32(concat(u.cast("string"), lit("#"), ri.cast("string"))) % W

  test("CMS estimate >= exact count for every key (no undercount)") {
    val gen = Gen.listOfN(500, Gen.frequency(
      (5, Gen.chooseNum(0L, 3L)),    // hot keys
      (1, Gen.chooseNum(0L, 200L)))) // tail
    (1L to 5L).foreach { seed =>
      gen.apply(Gen.Parameters.default, Seed(seed)).foreach { keys =>
        val ev = keys.toDF("user_id")
        val cells = ev
          .select(col("user_id"), explode(sequence(lit(0), lit(3))).as("ri"))
          .select(col("ri"), bucketOf(col("user_id"), col("ri")).as("bucket"))
          .groupBy("ri", "bucket").agg(count(lit(1)).as("cnt"))
        val est = ev.distinct()
          .select(col("user_id"), explode(sequence(lit(0), lit(3))).as("ri"))
          .select(col("user_id"), col("ri"),
            bucketOf(col("user_id"), col("ri")).as("bucket"))
          .join(broadcast(cells), Seq("ri", "bucket"))
          .groupBy("user_id").agg(min("cnt").as("cms"))
        val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
        val under = est.join(exact, "user_id")
          .filter(col("cms") < col("exact")).count()
        assert(under == 0, s"CMS undercounted $under keys (seed $seed)")
      }
    }
  }
}
