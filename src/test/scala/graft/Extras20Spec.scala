package graft

import org.apache.spark.sql.functions._
import graft.operators.Extras20

class Extras20Spec extends SparkSpec {

  test("sql50: TABLESAMPLE claims all hold, and the PERCENT grain " +
      "genuinely samples (neither empty nor the whole table)") {
    val r = Extras20.sql50Tablesample(spark, sf).head()
    val baseN = Tables.lineitem(spark, sf).count()
    assert(r.getAs[Long]("base_n") == baseN)
    assert(r.getAs[Boolean]("rows_exact"))
    assert(r.getAs[Boolean]("pct_in_bounds"))
    assert(r.getAs[Boolean]("repeatable_stable"))
    assert(r.getAs[Boolean]("subset_ok"))
    // the PERCENT grain is a real Bernoulli filter, not a no-op: the
    // sampled count is strictly between 0 and the base count (the
    // in-bounds claim already pins it to [0.05n, 0.15n], but assert
    // the raw behavior independently of the claim plumbing)
    Tables.lineitem(spark, sf).createOrReplaceTempView("li_spec50")
    val n = spark.sql("SELECT * FROM li_spec50 " +
      "TABLESAMPLE (10 PERCENT) REPEATABLE (7)").count()
    assert(n > 0 && n < baseN, s"sampled $n of $baseN")
    // ROWS grain caps at the table size when the table is smaller
    val tiny = spark.sql("SELECT * FROM li_spec50 " +
      s"TABLESAMPLE (${baseN + 1000} ROWS)").count()
    assert(tiny == baseN, "ROWS grain must cap at the table size")
  }
}
