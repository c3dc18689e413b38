package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the k-core peel join (round-16 optimization):
  * semi-join against the survivor set (pre-r16) vs anti-join against
  * the peel set, alternating reps in one JVM. Usage:
  * runMain graft.ProbeKcore <sfDir>.
  */
object ProbeKcore {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = Tables.tune(spark)
    val li = Tables.lineitem(s, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct().localCheckpoint(true)
    val k = 3
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("n"))
        .unionByName(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    def peelSemi(rounds: Int): (Long, Long) = {
      var e = edges
      for (_ <- 1 to rounds) {
        val keep = degrees(e).filter(col("deg") >= k).select(col("n"))
        e = graft.Checkpoints.cut(
          e.join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
            .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
            .select(col("a"), col("b")))
      }
      (e.count(), degrees(e).agg(coalesce(min(col("deg")), lit(0L)))
        .head().getLong(0))
    }
    def peelAnti(rounds: Int): (Long, Long) = {
      var e = edges
      for (_ <- 1 to rounds) {
        val bad = degrees(e).filter(col("deg") < k).select(col("n"))
        e = graft.Checkpoints.cut(
          e.join(bad.select(col("n").as("a")), Seq("a"), "left_anti")
            .join(bad.select(col("n").as("b")), Seq("b"), "left_anti")
            .select(col("a"), col("b")))
      }
      (e.count(), degrees(e).agg(coalesce(min(col("deg")), lit(0L)))
        .head().getLong(0))
    }
    println(s"warm semi=${peelSemi(8)} anti=${peelAnti(8)}")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime(); val a = peelSemi(8)
      val t1 = System.nanoTime(); val b = peelAnti(8)
      val t2 = System.nanoTime()
      println(f"rep$rep semi ${(t1 - t0) / 1e9}%.3f s  anti ${(t2 - t1) / 1e9}%.3f s  ($a/$b)")
    }
    spark.stop()
  }
}
