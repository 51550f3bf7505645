package graft

import graft.sources.HoldingsSource
import org.apache.spark.sql.functions._

/** S7 holdings source: schema normalization + keep-first ticker dedup. */
class HoldingsSourceSpec extends SparkSpec {

  test("load normalizes vendor headers with explicit schema") {
    val df = HoldingsSource.load(spark, HoldingsSource.FixturePath)
    assert(df.columns.toSeq == Seq("row_idx", "ticker", "name", "sector",
      "asset_class", "market_value", "weight_pct", "shares", "price"))
    assert(df.schema("market_value").dataType.typeName == "double")
    assert(df.count() == 33)
  }

  test("dedupByTicker keeps the first file-order occurrence") {
    val deduped = HoldingsSource.dedupByTicker(
      HoldingsSource.load(spark, HoldingsSource.FixturePath))
    // 33 rows, 5 later-duplicate rows (SMCI@9, MSTR@14, CVNA@21, XTSLA@28)
    assert(deduped.count() == 29)
    // the KEPT occurrence is the earliest row_idx
    val smci = deduped.filter(col("ticker") === "SMCI")
      .select("row_idx").collect().map(_.getLong(0)).toSeq
    assert(smci == Seq(1L))
    assert(deduped.filter(col("ticker") === "XTSLA")
      .select("row_idx").head().getLong(0) == 20L)
  }
}
