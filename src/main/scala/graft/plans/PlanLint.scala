package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BinaryComparison, Cast, Literal, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Aggregate => LAggregate, GlobalLimit => LGlobalLimit, LocalLimit => LLocalLimit, Project => LProject, Window => LWindow}
import org.apache.spark.sql.execution.{FileSourceScanExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Executable scale review: walks a physical plan and flags the shapes
  * that are harmless at test SF but fatal at 100 TB. The per-round
  * "would this plan survive a 100× scale-up?" checklist, as code —
  * PlanLintSpec sweeps every batch contract query and asserts zero
  * findings across the whole inventory.
  *
  * Rules (each tuned to keep legitimate plans quiet — a broadcast
  * nested-loop against a deliberately tiny side is how you attach a
  * scalar or probe panel to every row, and a filter on a computed
  * column is normal row-level work, so neither is flagged as such):
  *
  *   - `cartesian-product`: CartesianProductExec — both sides too big
  *     to broadcast and no join key; O(|L|·|R|) shuffle-and-compare
  *     never survives scale. (BroadcastNestedLoopJoin is governed by
  *     the broadcast rule below instead.)
  *   - `single-partition-window`: WindowExec with an empty PARTITION BY
  *     pulls the entire input through one task (the trap w2's global
  *     quantiles avoid via distributed rank). A window whose child is
  *     bounded by a LIMIT below (GlobalLimit/TakeOrderedAndProject) is
  *     exempt: a global window over a top-k frame is k rows in one
  *     task by construction (x62's cumulative-share report shape).
  *   - `unpushed-parquet-filter`: an attribute-vs-literal comparison
  *     (modulo casts) that never reached the reader (PushedFilters: [])
  *     — in practice a cast blocked the translation (comparing an int
  *     column as a string), silently turning a selective scan into a
  *     full decode. Computed-expression filters are exempt: they can
  *     never push and are normal row-level work.
  *   - `oversized-broadcast`: a broadcast whose subtree is a raw scan
  *     pipeline (no aggregate/limit bounding its cardinality) over more
  *     source bytes than 8× the session broadcast threshold — a pinned
  *     `broadcast()` on an unbounded dimension (the round-2 j11
  *     customer hazard) stops being a hint and becomes an OOM at scale.
  */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String) {
    override def toString: String = s"[$rule] $node: $detail"
  }

  /** Expand AQE/stage/reuse wrappers so rules see the real operators.
    * For an un-executed AQE frame, `initialPlan` is the first plan with
    * exchanges inserted (inputPlan predates EnsureRequirements). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.initialPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case r: ReusedExchangeExec    => flatten(r.child)
      case other                    => Seq(other)
    }
    here ++ p.children.flatMap(flatten)
  }

  private def scanBytes(p: SparkPlan): Long =
    flatten(p).collect { case s: FileSourceScanExec =>
      s.relation.location.sizeInBytes
    }.sum

  /** An aggregate or limit anywhere below bounds output cardinality
    * regardless of input volume — broadcasting such a subtree is a
    * deliberate, size-aware choice, not a scale hazard. */
  private def boundedOutput(p: SparkPlan): Boolean =
    flatten(p).exists {
      case _: BaseAggregateExec | _: GlobalLimitExec | _: LocalLimitExec |
          _: TakeOrderedAndProjectExec => true
      case _ => false
    }

  /** A comparison that is an attribute-vs-literal modulo a cast AROUND
    * THE ATTRIBUTE. A bare attribute comparison always translates into a
    * pushed filter; a cast-wrapped one never does (Catalyst unwraps only
    * the safe numeric widenings before this point), so its presence in a
    * scan's data filters means the reader decodes every row group for a
    * predicate it could have skipped with. Computed-expression filters
    * are exempt: they can never push and are normal row-level work. */
  private def castBlocked(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    def attrUnderCast(x: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      x match {
        case c: Cast => attrUnderCast(c.child)
        case _: AttributeReference => true
        case _ => false
      }
    e match {
      case c: BinaryComparison => (c.left, c.right) match {
        case (l: Cast, _: Literal) => attrUnderCast(l)
        case (_: Literal, r: Cast) => attrUnderCast(r)
        case _ => false
      }
      case _ => false
    }
  }

  def lint(df: DataFrame): Seq[Finding] = {
    val threshold =
      df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    flatten(df.queryExecution.executedPlan).flatMap {
      case c: CartesianProductExec =>
        Some(Finding("cartesian-product", c.nodeName,
          "no join key and neither side broadcastable: O(n*m) compare at scale"))
      case w: WindowExec if w.partitionSpec.isEmpty &&
          !flatten(w.child).exists {
            case _: GlobalLimitExec | _: LocalLimitExec |
                _: TakeOrderedAndProjectExec => true
            case _ => false
          } =>
        Some(Finding("single-partition-window", w.nodeName,
          "empty PARTITION BY funnels all rows through one task; use distributed rank"))
      case s: FileSourceScanExec if s.dataFilters.exists(castBlocked) =>
        Some(Finding("unpushed-parquet-filter", s.nodeName,
          s"cast-blocked comparison(s) ${s.dataFilters.filter(castBlocked).mkString(", ")} " +
            "can never reach the reader; retype the literal instead"))
      case b: BroadcastExchangeExec
          if threshold > 0 && !boundedOutput(b.child) &&
            scanBytes(b.child) > 8L * threshold =>
        Some(Finding("oversized-broadcast", b.nodeName,
          s"unbounded subtree scanning ${scanBytes(b.child)} source bytes " +
            s"(> 8x broadcast threshold $threshold)"))
      case _ => None
    }.distinct
  }

  /** Data-aware rule: `low-cardinality-window-key`. A window whose
    * PARTITION BY key has a BOUNDED domain (5 languages, 5 market
    * segments — values that do not grow with the data) funnels an
    * unbounded input through that many tasks no matter how large the
    * cluster: the round-3 x21 shape, which `lint`'s static
    * `single-partition-window` rule cannot see because the key is
    * non-empty. Cardinality is a property of the data, not the plan, so
    * this rule MEASURES it: for every window that (a) computes an
    * aggregate window function and (b) sits over an unbounded child
    * (no aggregate/limit below bounding its size), it counts the
    * distinct partition-key values and flags counts below `minKeys`.
    *
    * Scope is the window functions with a KNOWN mechanical fix:
    * aggregate functions (running sum/count/first/last) can be re-keyed
    * to (key, content-hash shard) with per-shard semantics — exactly
    * x21's fix — and ROW_NUMBER decomposes exactly as
    * rank = (#rows in strictly-smaller order-key groups) + (position
    * among exact ties), i.e. a fine-grained (key, order-value) tie
    * window plus a cumulative count over the aggregate-bounded
    * distinct-value frame — exactly x31/x39's fix. The whole rank
    * family follows from the same identity with the per-key total
    * broadcast back: rank/dense_rank directly, percent_rank =
    * (rank−1)/(n−1), cume_dist = rows_le/n, ntile closed-form from
    * (rank, n) — w8 and w2 are the worked examples — so all of them are
    * flagged. Only the offset functions (lag, lead, nth_value) stay
    * exempt: their fix (broadcasting boundary rows) is shape-specific
    * enough that a generic finding would be noise.
    *
    * `minKeys` is parallelism-relative: in production set it near the
    * cluster's task slots; the sf0.001 sweep uses 8 (the corpus' growing
    * keys are ≥15 there, its bounded keys are 5).
    *
    * Runs count-distinct jobs (one per flagged-candidate window), so
    * this is a test/review-time check, not a planner hook. */
  def lowCardWindowKeys(df: DataFrame, minKeys: Long = 32): Seq[Finding] = {
    def boundedBelow(p: LogicalPlan): Boolean =
      p.collectFirst {
        case _: LAggregate => (); case _: LGlobalLimit => ()
        case _: LLocalLimit => ()
      }.isDefined
    def hasFixableWindow(w: LWindow): Boolean = {
      import org.apache.spark.sql.catalyst.expressions.{CumeDist, NTile, RankLike, RowNumberLike}
      w.windowExpressions.exists(_.collectFirst {
        case we: WindowExpression
            if we.windowFunction.isInstanceOf[AggregateExpression] ||
              we.windowFunction.isInstanceOf[RowNumberLike] ||
              we.windowFunction.isInstanceOf[RankLike] ||
              we.windowFunction.isInstanceOf[CumeDist] ||
              we.windowFunction.isInstanceOf[NTile] => ()
      }.isDefined)
    }
    // the OPTIMIZED plan: CTEs are inlined there, so a window child can
    // be re-planned standalone (an analyzed-plan child may carry
    // CTERelationRefs whose WithCTE definition sits above the window)
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow
          if w.partitionSpec.nonEmpty && hasFixableWindow(w) &&
            !boundedBelow(w.child) =>
        val keys = w.partitionSpec.zipWithIndex
          .map { case (e, i) => Alias(e, s"k$i")() }
        val n = org.apache.spark.sql.GraftBridge
          .ofRows(df.sparkSession, LProject(keys, w.child))
          .distinct().count()
        if (n < minKeys)
          Some(Finding("low-cardinality-window-key", w.nodeName,
            s"aggregate/row_number window over unbounded input partitioned by " +
              s"${w.partitionSpec.mkString(", ")} has only $n distinct keys " +
              s"(< $minKeys): bounded-domain key funnels the stream at scale; " +
              "re-key to (key, content-hash shard) like x21, or decompose " +
              "the rank into tie-window + cumulative counts like x31/x39"))
        else None
    }.flatten
  }

  /** Data-aware rule: `self-join-hot-key`. An inner equi-join whose two
    * sides are the SAME unbounded subtree (a pairwise self-join — the
    * x33/l2 candidate-pairing shape) produces Σ_key (rows sharing key)²
    * output: quadratic in the hottest key. Near-unique keys keep that
    * linear; one boilerplate fingerprint/band shared by m documents
    * makes one bucket with m rows and m² join output — a straggler/OOM
    * at crawl scale no matter how many executors. Like
    * [[lowCardWindowKeys]], hotness is a property of the data, not the
    * plan, so the rule MEASURES it: for each self-equi-join it computes
    * the max rows-per-key group on the (shared) child and flags groups
    * above `maxGroup`. The fix is the standard winnowing-index
    * treatment: pre-aggregate per-key frequency, split keys above a
    * threshold into a reported stop set, pair-join only the tail —
    * x33's guard (`WinnowHotFpThreshold`) is the worked example, and a
    * guarded plan passes here by construction because the tail filter
    * caps every group at the threshold.
    *
    * Only LIMITs below exempt a side ([[boundedOutput]]'s aggregate
    * exemption would be wrong here: `distinct()` IS an aggregate and the
    * unguarded x33 self-joins a distinct frame — aggregation bounds
    * output relative to group count, not per-key group size).
    *
    * Runs one count job per qualifying join, so this is a test/review-
    * time check, not a planner hook. */
  def selfJoinHotKeys(df: DataFrame, maxGroup: Long = 64): Seq[Finding] = {
    import org.apache.spark.sql.functions.{coalesce => fcoalesce, col => fcol, lit => flit, max => fmax}
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.InnerLike
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    def limited(p: LogicalPlan): Boolean =
      p.collectFirst {
        case _: LGlobalLimit => (); case _: LLocalLimit => ()
      }.isDefined
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    df.queryExecution.optimizedPlan.collect {
      case j: LJoin
          if j.joinType.isInstanceOf[InnerLike] &&
            j.left.sameResult(j.right) && !limited(j.left) =>
        // the left-side halves of the equi conjuncts = the pairing key
        val leftKeys = j.condition.toSeq
          .flatMap(conjuncts)
          .collect {
            case EqualTo(l, r)
                if l.references.subsetOf(j.left.outputSet) &&
                  r.references.subsetOf(j.right.outputSet) => l
            case EqualTo(l, r)
                if r.references.subsetOf(j.left.outputSet) &&
                  l.references.subsetOf(j.right.outputSet) => r
          }
        if (leftKeys.isEmpty) None // theta-only self-join: not this rule
        else {
          val aliases = leftKeys.zipWithIndex
            .map { case (e, i) => Alias(e, s"k$i")() }
          val keyed = org.apache.spark.sql.GraftBridge
            .ofRows(df.sparkSession, LProject(aliases, j.left))
          val hottest = keyed
            .groupBy(keyed.columns.map(fcol): _*)
            .count()
            .agg(fcoalesce(fmax(fcol("count")), flit(0L)))
            .collect()(0).getLong(0)
          if (hottest > maxGroup)
            Some(Finding("self-join-hot-key", j.nodeName,
              s"pairwise self-equi-join on ${leftKeys.mkString(", ")} has a " +
                s"hot key with $hottest rows (> $maxGroup): ${hottest}x$hottest " +
                "join output from one bucket at scale; pre-aggregate per-key " +
                "frequency and split hot keys into a stop set (the x33 guard)"))
          else None
        }
    }.flatten
  }

  /** Render a lint report for one frame. */
  def report(name: String, df: DataFrame): String = {
    val fs = lint(df)
    if (fs.isEmpty) s"$name: clean"
    else s"$name:\n" + fs.map("  " + _).mkString("\n")
  }
}
