package graft

import org.apache.spark.sql.SparkSession

/** Round-16 plan sweep: formatted physical plan of EVERY declared
  * query (guide §1 — plan-shape evidence for the optimization round).
  * Usage: runMain graft.ProbeExplainAll <sfDir> <outFile>.
  * Note: protocol rows (DML/streaming) execute their statement
  * sequences while building the frame; their terminal plan is the
  * claims table by design (see tools/plan_audit_r15/r16.txt).
  */
object ProbeExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("plans/r16/all_plans_sf001.txt")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = new java.io.PrintWriter(new java.io.File(out))
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      w.println(s"\n========== $n ==========")
      try {
        val df = fn(spark, sfDir)
        w.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable =>
        failed += 1
        w.println(s"EXPLAIN FAILED: ${e.getMessage}")
      }
      w.flush()
    }
    w.close()
    println(s"done, failures=$failed")
    spark.stop()
  }
}
