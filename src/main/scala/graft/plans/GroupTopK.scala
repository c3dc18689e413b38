package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Grouped top-k as a first-class physical operator — the full custom
  * Catalyst tier: logical node + planner Strategy + two-phase SparkPlan,
  * installed through the public `spark.experimental.extraStrategies` hook.
  *
  * Why not a window function? Spark 4 already optimizes the
  * `row_number().over(partitionBy(g).orderBy(o)) <= k` pattern with
  * WindowGroupLimit, which does prune map-side — but its partial stage
  * first SORTS the whole map partition (O(n log n) + sort spill risk on
  * every mapper) before walking group runs, and the reduce side still
  * computes the rank column and filters it. On engines or filter shapes
  * where that rewrite doesn't fire, the window plan shuffles every row.
  * This operator guarantees the pruned shape by construction and replaces
  * the map-side sort with one O(n log k) bounded-heap pass:
  *
  *   GroupTopKExec(final)            -- streaming take-k per group; O(1) mem
  *     +- Sort(grouping ++ order)    -- inserted by EnsureRequirements;
  *     |                                SortExec spills, so the reduce side
  *     |                                is robust to any group size
  *     +- Exchange(hash(grouping))   -- sees ONLY the survivors
  *        +- GroupTopKExec(partial)  -- per-partition bounded heaps
  *           +- scan ...
  *
  * The partial pass caps the exchange input at |groups-per-partition| × k
  * rows — the same bound WindowGroupLimit(Partial) achieves, but without
  * sorting the map partition to get it (one heap pass, no spill surface).
  * Partial-pass memory is bounded two ways: each tracked group holds at
  * most k row copies, and the number of TRACKED groups is capped by
  * `spark.graft.topk.maxLiveGroups` (default 65536). Once the cap is hit,
  * rows of new (untracked) groups stream through unpruned — the
  * ObjectHashAggregate fallback shape, except no sort is needed because
  * the final stage alone is already correct and spill-safe for any input;
  * the fallback merely trades shuffle volume for hard-bounded map memory
  * on adversarial group cardinality.
  *
  * Correctness of the split: top-k(⋃ᵢ top-k(partᵢ)) = top-k(⋃ᵢ partᵢ) for
  * any total order — elements pruned by a partial heap are dominated by k
  * better elements of the same group that the partial DID keep.
  */
case class GroupTopKNode(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"GroupTopK needs k >= 1, got $k")
  require(grouping.nonEmpty,
    "GroupTopK needs grouping keys; global top-k is Spark's own " +
      "TakeOrderedAndProject (orderBy.limit)")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : GroupTopKNode = copy(child = newChild)
}

/** Planner strategy: one logical node → partial + final pair. The final
  * stage declares distribution/ordering requirements and lets
  * EnsureRequirements plan the exchange and the (spillable) sort — never
  * hand-schedule what the planner already does. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(g, o, k, child) =>
      GroupTopKExec(g, o, k, partial = false,
        GroupTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class GroupTopKExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** Final stage: rows of one group must be co-located and contiguous in
    * sort order. Partial runs on whatever partitioning the scan produced. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(grouping) :: Nil

  private def groupAscending: Seq[SortOrder] =
    grouping.map(SortOrder(_, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(groupAscending ++ order)

  /** The final stage preserves its required child ordering, so a parent
    * needing group-sorted output gets it for free. */
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else groupAscending ++ order

  override protected def doExecute(): RDD[InternalRow] =
    if (partial) executePartial() else executeFinal()

  /** Map side: one bounded max-heap per live group; a row enters only if
    * its group has < k rows or it beats the group's current worst. Past
    * `maxLiveGroups` tracked groups, rows of NEW groups pass through
    * unpruned (streamed, never buffered) — memory stays ≤ maxLiveGroups
    * × k row copies no matter how adversarial the group cardinality, and
    * the final stage re-derives the exact answer either way. */
  private def executePartial(): RDD[InternalRow] = {
    val g = grouping
    val o = order
    val kk = k
    val childOutput = child.output
    val maxLive = conf
      .getConfString("spark.graft.topk.maxLiveGroups", "65536").toInt
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      val ord = RowOrdering.create(o, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]()
      val pruned = iter.flatMap { row =>
        val key = keyProj(row)
        val heap = heaps.get(key)
        if (heap != null) {
          if (heap.size < kk) heap.enqueue(row.copy())
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
          Iterator.empty
        } else if (heaps.size() < maxLive) {
          val h = mutable.PriorityQueue.empty[InternalRow](ord)
          h.enqueue(row.copy())
          heaps.put(key.copy(), h)
          Iterator.empty
        } else {
          // untracked group: stream the row through unpruned
          Iterator.single(row)
        }
      }
      import scala.jdk.CollectionConverters._
      // `++` is lazy: the heap dump materializes only after the input is
      // exhausted, so pass-through rows stream ahead of it
      pruned ++ heaps.values().iterator().asScala.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  /** Reduce side: input arrives hash-partitioned by group and sorted by
    * (grouping, order) — emit the first k rows of each group run. O(1)
    * memory; spill safety lives in the SortExec below. */
  private def executeFinal(): RDD[InternalRow] = {
    val g = grouping
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      var current: UnsafeRow = null
      var emitted = 0
      iter.flatMap { row =>
        val key = keyProj(row)
        if (current == null || key != current) {
          current = key.copy()
          emitted = 1
          Iterator.single(row)
        } else if (emitted < kk) {
          emitted += 1
          Iterator.single(row)
        } else Iterator.empty
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : GroupTopKExec = copy(child = newChild)
}

/** Optimizer rewrite: the idiomatic top-k-per-group WINDOW pattern
  *
  *   Project(cols without rn,
  *     Filter(rn <= k,
  *       Window(row_number() AS rn OVER (PARTITION BY g ORDER BY o), ...)))
  *
  * becomes `Project(cols, GroupTopKNode(g, o, k, child))` — users write
  * the standard Spark idiom and the planner swaps in the bounded-heap
  * operator (map-side O(n log k) prune, no map-partition sort — see the
  * operator scaladoc above for the full comparison with Spark's own
  * WindowGroupLimit rewrite, which this supersedes when it applies).
  *
  * Guards (all must hold — anything else is left untouched):
  *   - the Window computes EXACTLY ONE expression, a plain row_number()
  *     (rank/dense_rank assign equal positions to ties, so their <= k
  *     can keep MORE than k rows — only row_number is take-k);
  *   - non-empty PARTITION BY and ORDER BY (global top-k is Spark's own
  *     TakeOrderedAndProject);
  *   - the filter is `rn <= k`, `rn < k+1`, or `rn = 1` on an integer
  *     literal, k >= 1, and references nothing else;
  *   - the Project above drops rn (no reference in the project list),
  *     so the rewrite preserves the output schema exactly.
  *
  * If Spark's InsertWindowGroupLimit already placed a WindowGroupLimit
  * below the Window for the same keys, it is stripped — GroupTopK's
  * partial stage subsumes its map-side prune without the sort. */
object GroupTopKRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, WindowExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window => LWindow, WindowGroupLimit}

  private def limitOf(cond: Expression,
      rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.exprId == rn.exprId && k >= 1 => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k))
        if a.exprId == rn.exprId && k >= 2 => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1))
        if a.exprId == rn.exprId => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
          Filter(cond, LWindow(Seq(we: NamedExpression), part, order, wChild, _)))
        if part.nonEmpty && order.nonEmpty =>
      val isRowNumber = we match {
        case Alias(WindowExpression(RowNumber(), _), _) => true
        case _ => false
      }
      val rn = we.toAttribute
      val rewritable = isRowNumber &&
        projectList.forall(!_.references.contains(rn)) &&
        projectList.forall(_.references.subsetOf(wChild.outputSet))
      limitOf(cond, rn) match {
        case Some(k) if rewritable =>
          // strip a same-keyed WindowGroupLimit Spark already inserted
          val base = wChild match {
            case wgl: WindowGroupLimit
                if wgl.partitionSpec == part && wgl.orderSpec == order =>
              wgl.child
            case other => other
          }
          Project(projectList, GroupTopKNode(part, order, k, base))
        case _ => p
      }
  }
}

/** User-facing surface: `GroupTopK(df, groups, orderCols, k)`. */
object GroupTopK {

  /** Idempotently register the strategy on a live session (the driver owns
    * session construction, so contract queries install at call time). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(GroupTopKStrategy)) {
      spark.experimental.extraStrategies = cur :+ GroupTopKStrategy
    }
  }

  /** Install the strategy AND the window-idiom rewrite (session-wide,
    * idempotent): after this, `row_number().over(...) <= k` + drop plans
    * through GroupTopKExec automatically. */
  def installRewrite(spark: SparkSession): Unit = {
    install(spark)
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(GroupTopKRewrite)) {
      spark.experimental.extraOptimizations = cur :+ GroupTopKRewrite
    }
  }

  /** Top-k rows per group. `orderSpec` is (column, ascending); the caller
    * should end it with a unique tie-break column for deterministic output,
    * exactly as a window-function formulation would. */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderSpec.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(spark,
      GroupTopKNode(groupCols.map(attr), order, k, analyzed))
  }
}
