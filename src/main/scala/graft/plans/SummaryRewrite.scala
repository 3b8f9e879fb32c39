package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.store.{IncrementalAgg, TableStore}

/** C44: automatic aggregate rewrite over a MAINTAINED summary table —
  * the optimizer half of the materialized-view story (C41 keeps the
  * summary current from the change feed; this makes queries USE it
  * without being rewritten by hand). A `Rule[LogicalPlan]` registered
  * through `spark.experimental.extraOptimizations` (the same runtime
  * hook the Pairs strategy uses; `graft.plans.GraftExtensions` is the
  * declarative twin): when a query aggregates the base table's scan
  * with exactly the summary's grouping and aggregate shape, the whole
  * Aggregate collapses into a scan of the summary — at 100 TB that is
  * the difference between re-scanning the fact table and reading a
  * group-count-sized relation.
  *
  * The rewrite fires only when ALL of the following hold, and is
  * conservative by construction (a miss costs nothing — the plain
  * aggregate runs):
  *
  *  - the Aggregate's child is a FAITHFUL read of the registered base
  *    table: Project/SubqueryAlias layers that only pass attributes
  *    through (optionally cast) under the SAME name, bottoming at the
  *    base's parquet scan. A Filter, a rename, or any computed column
  *    breaks faithfulness — a filtered or reshaped aggregate cannot be
  *    answered from the summary;
  *  - the grouping is exactly the summary's group columns, and every
  *    aggregate is `count(1)` or `sum(cast(valueCol as decimal(18,2)))`
  *    (the [[IncrementalAgg.summarize]] shape, which is what the
  *    summary stores losslessly);
  *  - the summary is FRESH: its durable maintenance watermark
  *    ([[IncrementalAgg.maintainedGen]]) equals the base's current
  *    generation. A base commit without maintenance makes the rule
  *    stand down until [[IncrementalAgg.maintainToCurrent]] catches up
  *    — a stale summary is never served.
  *
  * Output attribute ids are preserved (each replacement column is
  * aliased under the original exprId), so parent operators above the
  * rewritten Aggregate resolve unchanged. Single-writer contract:
  * the summary must be maintained through the watermark API. */
object SummaryRewrite extends Rule[LogicalPlan] {

  final case class Registration(
      store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String)

  // keyed by the base table's live data directory — the scan identity.
  // Scheme-normalized (a parquet scan's rootPaths carry `file:`/`hdfs:`
  // prefixes; the store's path string may not).
  private val registry = new ConcurrentHashMap[String, Registration]()

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Register a maintained summary for rewrite and install the rule on
    * the session's experimental optimizations (idempotent). */
  def register(spark: SparkSession, store: TableStore, base: String, summary: String,
      groupCols: Seq[String], valueCol: String): Unit = {
    registry.put(normalize(store.dataLocation(base)),
      Registration(store, base, summary, groupCols, valueCol))
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  /** Drop a registration (tests; a summary being decommissioned). */
  def unregister(store: TableStore, base: String): Unit = {
    registry.remove(normalize(store.dataLocation(base))); ()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        rewrite(agg, groupings, aggExprs, child).getOrElse(agg)
    }
  }

  /** Strip faithful Project/SubqueryAlias layers; None on anything that
    * could change row content, row count, or column identity. */
  private def faithfulScanPaths(p: LogicalPlan): Option[Seq[String]] = p match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some(fs.location.rootPaths.map(_.toString))
    case SubqueryAlias(_, c) => faithfulScanPaths(c)
    case Project(list, c) if list.forall(faithfulColumn) => faithfulScanPaths(c)
    case _ => None
  }

  private def faithfulColumn(e: NamedExpression): Boolean = e match {
    case _: AttributeReference => true
    case a @ Alias(ar: AttributeReference, _) => ar.name == a.name
    case a @ Alias(c: Cast, _) => c.child match {
      case ar: AttributeReference => ar.name == a.name
      case _ => false
    }
    case _ => false
  }

  private def isCountStar(e: Expression): Boolean = e match {
    case ae: AggregateExpression if !ae.isDistinct => ae.aggregateFunction match {
      case Count(Seq(Literal(_, _))) => true
      case _ => false
    }
    case _ => false
  }

  /** `sum(cast(valueCol as decimal(18,2)))` or `sum(valueCol)` when the
    * column already is decimal(18,2) — summarize's lossless shape. */
  private def isSummarySum(e: Expression, valueCol: String): Boolean = e match {
    case ae: AggregateExpression if !ae.isDistinct => ae.aggregateFunction match {
      case s: Sum => s.child match {
        case c: Cast => c.dataType match {
          case d: org.apache.spark.sql.types.DecimalType
            if d.precision == 18 && d.scale == 2 => c.child match {
              case ar: AttributeReference => ar.name == valueCol
              case _ => false
            }
          case _ => false
        }
        case ar: AttributeReference =>
          ar.name == valueCol && (ar.dataType match {
            case d: org.apache.spark.sql.types.DecimalType =>
              d.precision == 18 && d.scale == 2
            case _ => false
          })
        case _ => false
      }
      case _ => false
    }
    case _ => false
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    val paths = faithfulScanPaths(child).getOrElse(return None)
    val reg = paths.flatMap(p => Option(registry.get(normalize(p)))).distinct match {
      case Seq(r) => r
      case _      => return None
    }
    // grouping must be exactly the summary's group columns (bare attrs)
    val groupNames = groupings.map {
      case ar: AttributeReference => ar.name
      case _ => return None
    }
    if (groupNames.sorted != reg.groupCols.sorted) return None
    // every output: a grouping attribute, count(1), or the summary sum
    aggExprs.foreach {
      case ar: AttributeReference if groupNames.contains(ar.name) =>
      case a: Alias => a.child match {
        case ar: AttributeReference if groupNames.contains(ar.name) =>
        case e if isCountStar(e) || isSummarySum(e, reg.valueCol) =>
        case _ => return None
      }
      case e if isCountStar(e) || isSummarySum(e, reg.valueCol) => return None // unnamed agg can't happen post-analysis; bail
      case _ => return None
    }
    // freshness: the durable watermark must sit at the base's current
    // generation — otherwise the summary is missing changes and the
    // rule stands down (driver-side metadata reads only)
    val fresh = try {
      reg.store.exists(reg.summary) &&
        IncrementalAgg.maintainedGen(reg.store, reg.base, reg.summary)
          .contains(reg.store.snapshots(reg.base).last._1)
    } catch { case _: Exception => false }
    if (!fresh) return None

    val sumPlan = reg.store.readTable(reg.summary).queryExecution.analyzed
    val byName = sumPlan.output.map(a => a.name -> a).toMap
    // the summary must carry the expected columns
    if (!(reg.groupCols :+ "n_rows" :+ "sum_val").forall(byName.contains)) return None

    val projected: Seq[NamedExpression] = agg.output.zip(aggExprs).map {
      case (orig, src) =>
        val replacement: Expression = src match {
          case ar: AttributeReference => byName(ar.name)
          case a: Alias => a.child match {
            case ar: AttributeReference => byName(ar.name)
            case e if isCountStar(e) => byName("n_rows")
            case _ => byName("sum_val") // isSummarySum verified above
          }
          case _ => return None
        }
        val cast = if (replacement.dataType == orig.dataType) replacement
                   else Cast(replacement, orig.dataType)
        Alias(cast, orig.name)(exprId = orig.exprId)
    }
    Some(Project(projected, sumPlan))
  }
}
