package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the library's native expressions, so the
  * E2 entry point (spark.sql strings) can call them like builtins. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    GraftBridge.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))
    // aggregate: the analyzer wraps a bare AggregateFunction returned by
    // a registry builder in an AggregateExpression automatically
    GraftBridge.registerFunction(spark, "graft_minhash", { exprs =>
      require(exprs.length == 1,
        s"graft_minhash expects exactly 1 argument, got ${exprs.length}")
      MinHashAgg(exprs.head, numPerms = 128, seed = 42L)
    })
    // generator (UDTF) tier: LATERAL VIEW graft_ngrams(text, 3)
    GraftBridge.registerFunction(spark, "graft_ngrams", { exprs =>
      require(exprs.length >= 2,
        s"graft_ngrams expects (text, n[, distinct]), got ${exprs.length} args")
      def lit[T](e: Expression, what: String): T = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.asInstanceOf[T]
        case other => throw new IllegalArgumentException(
          s"graft_ngrams $what must be a literal, got $other")
      }
      WordNGrams(exprs.head, lit[Int](exprs(1), "n"),
        if (exprs.length > 2) lit[Boolean](exprs(2), "distinct") else false)
    })
  }
}
