package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a pure range join
  *
  *   A ⋈ B  ON  b >= a AND b <= a + C          (a from A, b from B, Long)
  *
  * into a banded equi-join. Without an equi-key Catalyst can only plan a
  * nested-loop join — O(|A|·|B|) comparisons. With band width C every
  * qualifying pair satisfies floor(b/C) - floor(a/C) ∈ {0, 1}, so
  * joining A (banded once) against B exploded into its two candidate
  * bands turns the plan into a shuffled hash/sort-merge join on the band
  * key plus the original residual predicate: O(|A| + |B| + matches·k)
  * where k is the per-band fan-in — the standard interval-join
  * bucketization, here done by the optimizer instead of by hand (compare
  * the hand-banded J10).
  *
  * Conservative by design — fires only when:
  *   - inner join with a condition containing the lower and upper range
  *     conjuncts over deterministic LongType expressions, each side
  *     referencing exactly one join input;
  *   - NO equi-conjunct between the sides exists (with one, Catalyst
  *     already plans a hash join and banding would only add overhead);
  *   - it has not already fired (band columns are tagged by name), which
  *     also makes the rule idempotent under the fixed-point batch.
  *
  * Floor division is computed sign-correctly via pmod, so negative
  * domains band correctly too.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BandPrefix = "__graft_band"

  private def floorDiv(e: Expression, c: Expression): Expression =
    IntegralDivide(Subtract(e, Pmod(e, c)), c)

  private case class RangePair(aExpr: Expression, bExpr: Expression,
    width: Long)

  /** Find (a, b, C) such that conjuncts imply b ∈ [a, a+C]. */
  private def findRange(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[RangePair] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty || !e.deterministic) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // lower bounds: b >= a in any spelling
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(x, y) => (x, y)
      case GreaterThan(x, y) => (x, y)
      case LessThanOrEqual(y, x) => (x, y)
      case LessThan(y, x) => (x, y)
    }.filter { case (x, y) =>
      x.dataType == LongType && y.dataType == LongType &&
        sideOf(x).contains(false) && sideOf(y).contains(true)
    }
    // upper bounds: b <= a + C in any spelling
    def asPlusLit(e: Expression): Option[(Expression, Long)] = e match {
      case Add(y, Literal(c: Long, LongType), _) => Some((y, c))
      case Add(Literal(c: Long, LongType), y, _) => Some((y, c))
      case _ => None
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(x, sum) => (x, sum)
      case LessThan(x, sum) => (x, sum)
      case GreaterThanOrEqual(sum, x) => (x, sum)
      case GreaterThan(sum, x) => (x, sum)
    }.flatMap { case (x, sum) => asPlusLit(sum).map { case (y, c) => (x, y, c) } }
      .filter { case (x, y, c) =>
        c > 0 && x.dataType == LongType && y.dataType == LongType &&
          sideOf(x).contains(false) && sideOf(y).contains(true)
      }
    (for {
      (bl, al) <- lowers
      (bu, au, c) <- uppers
      if bl.semanticEquals(bu) && al.semanticEquals(au)
    } yield RangePair(al, bl, c)).headOption
  }

  private def hasEquiConjunct(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(x, y) =>
        (x.references.subsetOf(left.outputSet) &&
          y.references.subsetOf(right.outputSet)) ||
        (x.references.subsetOf(right.outputSet) &&
          y.references.subsetOf(left.outputSet))
      case EqualNullSafe(x, y) =>
        (x.references.subsetOf(left.outputSet) &&
          y.references.subsetOf(right.outputSet)) ||
        (x.references.subsetOf(right.outputSet) &&
          y.references.subsetOf(left.outputSet))
      case _ => false
    }

  private def alreadyBanded(cond: Expression): Boolean =
    cond.references.exists(_.name.startsWith(BandPrefix))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !alreadyBanded(cond) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiConjunct(conjuncts, left, right)) j
      else findRange(conjuncts, left, right) match {
        case None => j
        case Some(RangePair(aExpr, bExpr, c)) =>
          val w = Literal(c, LongType)
          val bandL = Alias(floorDiv(aExpr, w), s"${BandPrefix}_l")()
          val newLeft = Project(left.output :+ bandL, left)
          val bDiv = floorDiv(bExpr, w)
          // a null b-side value bands to null (joins nothing) — declare
          // the attribute's nullability accordingly
          val bandROut = AttributeReference(s"${BandPrefix}_r", LongType,
            nullable = bDiv.nullable)()
          val gen = Generate(
            Explode(CreateArray(Seq(bDiv, Subtract(bDiv, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bandROut), child = right)
          val banded = Join(newLeft, gen, Inner,
            Some(And(EqualTo(bandL.toAttribute, bandROut), cond)), hint)
          Project(j.output, banded)
      }
  }
}

/** Installation surfaces: config-time (`spark.sql.extensions=
  * graft.plans.GraftSparkSessionExtensions`) or runtime on an existing
  * session (the driver builds the session, so contract queries use the
  * runtime hook). */
class GraftSparkSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BandedRangeJoinRule)
    // persistent-view SQL surface (round 15): CREATE/DROP/SHOW VIEW and
    // view reads against graft catalogs, intercepted at the parser —
    // Spark 4.1 core still session-catalog-routes view DDL
    e.injectParser((session, parser) =>
      new graft.sources.GraftViewParser(session, parser))
  }
}

object GraftExtensions {
  /** Idempotently add the rule to a live session's optimizer. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(BandedRangeJoinRule)) {
      spark.experimental.extraOptimizations = cur :+ BandedRangeJoinRule
    }
  }
}
