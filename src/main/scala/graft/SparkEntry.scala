package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{AggQueries, DedupQueries, GraphQueries, JoinQueries,
  MlPrepQueries, MultimodalQueries, PipelineQueries, ScalarQueries,
  ScanFilterQueries, SimilarityQueries, SortSetQueries, SqlQueries,
  StreamingQueries, TextQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (plus the large-scale training-data operators); `oracleSql` carries the
  * DuckDB-equivalent SQL for every SQL-expressible entry. Cross-engine float
  * parity follows the [[Parity]] doctrine.
  */
object SparkEntry {

  /** All operator queries, grouped by SURVEY §2 family. */
  val defs: Seq[QueryDef] = {
    val all =
      ScanFilterQueries.all ++
      AggQueries.all ++
      WindowQueries.all ++
      JoinQueries.all ++
      ScalarQueries.all ++
      SortSetQueries.all ++
      DedupQueries.all ++
      GraphQueries.all ++
      SimilarityQueries.all ++
      TextQueries.all ++
      MultimodalQueries.all ++
      PipelineQueries.all ++
      MlPrepQueries.all ++
      SqlQueries.all ++
      StreamingQueries.all
    // a duplicate name would silently shadow its twin in the `queries`
    // map — Verify would then "pass" having never run the shadowed one
    val dup = all.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own smoke shape (Procesamiento_fase_2.ipynb:129):
    * per-key daily rollup + lag-window returns, filtered and sorted.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min_by(col("value"), col("ts")).as("open"),
           max_by(col("value"), col("ts")).as("close"),
           count(lit(1)).as("n"))
    val w = Window.partitionBy("user_id").orderBy("day")
    daily
      .withColumn("prev_close", lag("close", 1).over(w))
      .withColumn("gap_pct",
        (col("open") - col("prev_close")) /
          nullif(col("prev_close"), lit(0.0)) * 100)
      .filter(col("gap_pct").isNotNull)
      .orderBy("user_id", "day")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
