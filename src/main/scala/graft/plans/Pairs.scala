package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY §7.1 case (c)): intra-group
  * candidate-pair generation for the near-dup dedup families.
  *
  * Every blocked near-dup operator needs "all ordered pairs of documents
  * sharing a key" (a shingle, an LSH band bucket, a SimHash chunk). As a
  * self-join that costs TWO exchanges of the keyed relation (one per join
  * side) plus a hash-table build per partition, and Spark plans it as a
  * generic equi-join because it cannot know both sides are the same
  * relation. This operator expresses the semantics directly: ONE exchange
  * clustering on the group key, one sort, then a streaming scan that
  * buffers a single group at a time and emits its `n·(n−1)/2` ordered
  * pairs. Shuffle volume halves, the build side disappears, and the
  * per-group buffer bound (`maxGroupRows`) turns the quadratic-skew
  * hazard of a hot key into an explicit, named error instead of a
  * silently stuck task — the df-cut/bucket-width invariants the callers
  * maintain are what keep groups small at 100 TB, and this operator
  * enforces them.
  *
  * Output: group columns (same attributes, so downstream operators that
  * re-aggregate on them reuse the clustering) ++ `a_<id>`,`a_<p>`…,
  * `b_<id>`,`b_<p>`… with `a.<id> < b.<id>` by the child sort order.
  */
case class PairsWithinGroups(
    groupAttrs: Seq[Attribute],
    idAttr: Attribute,
    payloadAttrs: Seq[Attribute],
    pairAttrs: Seq[Attribute],
    maxGroupRows: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = groupAttrs ++ pairAttrs
  override def producedAttributes: AttributeSet = AttributeSet(pairAttrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): PairsWithinGroups =
    copy(child = newChild)
}

/** Planner rule: the logical node has exactly one physical form. Kept as
  * a standalone strategy so it can be registered either through
  * `spark.experimental.extraStrategies` (done lazily by [[Pairs]]) or via
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
object PairsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PairsWithinGroups(g, id, p, pairs, max, child) =>
      PairsWithinGroupsExec(g, id, p, pairs, max, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** `SparkSessionExtensions` entry point for deployments that configure
  * extensions declaratively (`--conf spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => PairsStrategy)
}

case class PairsWithinGroupsExec(
    groupAttrs: Seq[Attribute],
    idAttr: Attribute,
    payloadAttrs: Seq[Attribute],
    pairAttrs: Seq[Attribute],
    maxGroupRows: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = groupAttrs ++ pairAttrs
  override def producedAttributes: AttributeSet = AttributeSet(pairAttrs)

  /** The single exchange: cluster on the group key. A child already
    * hash-partitioned on these attributes (e.g. the window that computed
    * the jaccard df-cut) satisfies this with no new shuffle. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupAttrs) :: Nil

  /** Sort groups together; the id tie-break inside a group makes the
    * emitted (a, b) orientation deterministic (a = smaller id). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((groupAttrs :+ idAttr).map(a => SortOrder(a, Ascending)))

  /** Group attributes pass through with their exprIds, so the child's
    * clustering remains valid for downstream per-group aggregation. */
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    groupAttrs.map(a => SortOrder(a, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val gAttrs = groupAttrs
    val sideAttrs = idAttr +: payloadAttrs
    val childOutput = child.output
    val outAttrs = output
    val maxRows = maxGroupRows
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(gAttrs, childOutput)
      val sideProj = UnsafeProjection.create(sideAttrs, childOutput)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyAndA = new JoinedRow
      val full = new JoinedRow
      // one group at a time: (key, members sorted by id)
      val groups = new Iterator[(UnsafeRow, ArrayBuffer[UnsafeRow])] {
        private var lookahead: InternalRow = if (iter.hasNext) iter.next() else null
        override def hasNext: Boolean = lookahead != null
        override def next(): (UnsafeRow, ArrayBuffer[UnsafeRow]) = {
          val key = keyProj(lookahead).copy()
          val buf = ArrayBuffer.empty[UnsafeRow]
          var inGroup = true
          while (inGroup) {
            buf += sideProj(lookahead).copy()
            if (buf.length > maxRows)
              throw new IllegalStateException(
                s"pairsWithinGroups: group exceeded maxGroupRows=$maxRows " +
                  "(a hot key would emit quadratic pairs — raise the limit " +
                  "or tighten the caller's df-cut/bucket width)")
            lookahead = if (iter.hasNext) iter.next() else null
            inGroup = lookahead != null && keyProj(lookahead) == key
          }
          (key, buf)
        }
      }
      groups.flatMap { case (key, rows) =>
        val n = rows.length
        for {
          i <- Iterator.range(0, n - 1)
          j <- Iterator.range(i + 1, n)
        } yield outProj(full(keyAndA(key, rows(i)), rows(j)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PairsWithinGroupsExec =
    copy(child = newChild)
}

object Pairs {

  private def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val em = spark.experimental
    if (!em.extraStrategies.contains(PairsStrategy))
      em.extraStrategies = em.extraStrategies :+ PairsStrategy
  }

  /** All ordered intra-group pairs of `df` rows: group by `groupCols`,
    * pair members by ascending `idCol` (`a_<id> < b_<id>`), carrying
    * `payloadCols` on both sides. One exchange + sort, no join. */
  def withinGroups(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      payloadCols: Seq[String] = Nil,
      maxGroupRows: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"pairsWithinGroups: no column '$n' in [${plan.output.map(_.name).mkString(", ")}]"))
    val side = (idCol +: payloadCols).map(attr)
    val pairAttrs = (Seq("a_", "b_")).flatMap(prefix =>
      side.map(a => AttributeReference(prefix + a.name, a.dataType, a.nullable)()))
    org.apache.spark.sql.graftglue.Glue.ofRows(spark,
      PairsWithinGroups(groupCols.map(attr), attr(idCol), payloadCols.map(attr),
        pairAttrs, maxGroupRows, plan))
  }
}
