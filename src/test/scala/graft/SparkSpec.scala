package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one session per suite, UTC, small shuffle. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Tables.tune(s)
  }
  /** sf0.001 is the smoke-scale corpus (≈6k lineitem rows). */
  val sf: String = "/root/testdata/sf0.001"

  /** Expand AQE/stage wrappers (and subquery plans) so plan-shape
    * assertions see the real operators — one shared helper instead of a
    * per-suite copy. */
  def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = p match {
      case a: AdaptiveSparkPlanExec => flattenPlan(a.executedPlan)
      case q: QueryStageExec => q +: flattenPlan(q.plan)
      case _ => Seq(p)
    }
    here ++ p.children.flatMap(flattenPlan) ++
      p.subqueries.flatMap(flattenPlan)
  }
}
