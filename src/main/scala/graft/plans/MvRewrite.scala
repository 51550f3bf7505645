package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view query rewrite — the warehouse feature where a
  * pre-aggregated summary table transparently answers a matching
  * aggregate over the base table (Oracle/Calcite MV rewrite; Databricks
  * materialized views). The engine-extension surface this exercises is
  * `SparkSessionExtensions.injectOptimizerRule`: a `Rule[LogicalPlan]`
  * running inside Catalyst's operator-optimization batch, alongside the
  * native function injections ([[graft.functions.GraftExtensions]]).
  *
  * Safety model — a rewrite is only legal when it provably cannot change
  * results, so the match is deliberately narrow and OPT-IN:
  *  - the aggregate must be exactly `GROUP BY user_id` with a single
  *    `count(1)` aliased to the reserved marker name
  *    [[MvRegistry.CountAlias]] (no other query can match by accident —
  *    consumers choose the rewrite by choosing the alias);
  *  - the child must be a bare column-pruning projection over ONE
  *    parquet relation rooted at a REGISTERED source directory — any
  *    Filter/Join/expression in between disqualifies (a filtered
  *    aggregate over the base table is NOT the MV's answer);
  *  - the output attributes keep the ORIGINAL exprIds (downstream
  *    operator references must not notice the swap).
  *
  * Freshness is the registrant's contract (as in every MV system: the
  * view answers as of its last refresh): [[MvRegistry.register]] is
  * called right after the MV build, and `pl28_mv_rewrite` hash-verifies
  * the rewritten plan's output against the raw-table oracle, which is
  * exactly the staleness-free guarantee.
  */
object MvRegistry {
  /** The reserved output-alias marker that opts an aggregate into the
    * rewrite. */
  val CountAlias = "mv_user_event_count"

  final case class Entry(sourceDir: String, mvPath: String)

  @volatile private var reg: Vector[Entry] = Vector.empty

  /** Register (or refresh) the MV for `sourceDir`. */
  def register(sourceDir: String, mvPath: String): Unit = synchronized {
    reg = reg.filterNot(_.sourceDir == sourceDir) :+
      Entry(sourceDir, mvPath)
  }

  def clear(): Unit = synchronized { reg = Vector.empty }

  def entries: Vector[Entry] = reg
}

class MvCountRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The single parquet relation under `plan`, if `plan` is a bare scan
    * or a pure column-pruning projection of one. */
  private def plainScanOf(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case lr: LogicalRelation => Some(lr)
      case Project(projList, lr: LogicalRelation)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        Some(lr)
      case _ => None
    }

  private def entryFor(lr: LogicalRelation): Option[MvRegistry.Entry] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        val roots = fs.location.rootPaths.map(_.toString)
        MvRegistry.entries.find(e =>
          roots.exists(_.stripSuffix("/").endsWith(
            e.sourceDir.stripSuffix("/"))))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.entries.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(
            Seq(g: AttributeReference), aggExprs, child, _)
          if g.name == "user_id" && aggExprs.size == 2 =>
        val rewritten = for {
          lr <- plainScanOf(child)
          e <- entryFor(lr)
          gOut <- aggExprs.headOption.collect {
            case a: AttributeReference if a.semanticEquals(g) => a
          }
          cnt <- aggExprs.lastOption.collect {
            case al @ Alias(ae: AggregateExpression, name)
                if name == MvRegistry.CountAlias &&
                  ae.aggregateFunction.isInstanceOf[Count] &&
                  !ae.isDistinct && ae.filter.isEmpty => al
          }
        } yield {
          val mv = spark.read.parquet(e.mvPath).queryExecution.analyzed
          val mvUser = mv.output.find(_.name == "user_id").get
          val mvN = mv.output.find(_.name == MvRegistry.CountAlias).get
          // keep the ORIGINAL exprIds so downstream references resolve
          Project(Seq(
            Alias(mvUser, g.name)(exprId = gOut.exprId),
            Alias(mvN, MvRegistry.CountAlias)(exprId = cnt.exprId)), mv)
        }
        rewritten.getOrElse(agg)
    }
}
