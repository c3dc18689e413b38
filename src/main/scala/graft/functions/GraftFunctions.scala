package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}

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
  }
}
