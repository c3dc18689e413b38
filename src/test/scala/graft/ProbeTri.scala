package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for x112's wedge-pair generation (round-16 optimization):
  * double-posexplode (pre-r16) vs single-explode over a higher-order
  * pair array, alternating reps in ONE JVM so host-throttle drift
  * cancels. Usage: runMain graft.ProbeTri <sfDir>.
  */
object ProbeTri {
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
    val e = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
    val deg = e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("degb")), "b")
    val aLower = struct(col("dega"), col("a")) < struct(col("degb"), col("b"))
    val o = withDeg.select(
        when(aLower, col("a")).otherwise(col("b")).as("src"),
        when(aLower, col("b")).otherwise(col("a")).as("dst"),
        when(aLower, col("degb")).otherwise(col("dega")).as("dst_deg"))
      .localCheckpoint(true)
    val adj = o.groupBy(col("src"))
      .agg(sort_array(collect_list(struct(col("dst_deg").as("d"),
        col("dst").as("v")))).as("ns"))
      .localCheckpoint(true)

    def wOld: DataFrame = adj
      .select(col("ns"), posexplode(col("ns")).as(Seq("i", "xs")))
      .select(col("i"), col("xs"), posexplode(col("ns")).as(Seq("j", "ys")))
      .filter(col("j") > col("i"))
      .select(col("xs.v").as("x"), col("ys.v").as("y"))
    def wNew: DataFrame = adj
      .select(explode(flatten(transform(col("ns"), (x, i) =>
        transform(
          slice(col("ns"), i + lit(2), size(col("ns")) - i - 1),
          y => struct(x.getField("v").as("x"), y.getField("v").as("y")))
      ))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))

    def closing(w: DataFrame): Long =
      w.join(o.as("e3").hint("shuffle_hash"),
          col("x") === col("e3.src") && col("y") === col("e3.dst"))
        .agg(count(lit(1))).head().getLong(0)

    def pairCount(w: DataFrame): Long = w.agg(count(lit(1))).head().getLong(0)

    println(s"pairs old=${pairCount(wOld)} new=${pairCount(wNew)}")
    println(s"tri   old=${closing(wOld)} new=${closing(wNew)}")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime(); val cO = closing(wOld)
      val t1 = System.nanoTime(); val cN = closing(wNew)
      val t2 = System.nanoTime()
      println(f"rep$rep old ${(t1 - t0) / 1e9}%.3f s  new ${(t2 - t1) / 1e9}%.3f s  ($cO/$cN)")
    }
    spark.stop()
  }
}
