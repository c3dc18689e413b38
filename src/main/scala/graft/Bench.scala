package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (codegen compiler, parquet reader classes)
    // so the first timed query doesn't absorb JVM startup costs
    try { Tables.region(spark, sfDir).count() } catch { case _: Throwable => () }
    // same principle for the streaming path: a one-row memory-stream
    // query loads the micro-batch engine, offset/commit logs, and state
    // store classes once, so the first timed st* query measures its own
    // work instead of streaming-engine class init
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
      import spark.implicits._
      val ms = MemoryStream[Long]
      ms.addData(1L)
      val q = ms.toDS().groupBy().count().writeStream
        .outputMode("complete").format("memory").queryName("graft_warmup")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.catalog.dropTempView("graft_warmup")
    } catch { case _: Throwable => () }
    // Optional profiling filter (unset in driver runs): comma-separated
    // regexes over query names (Verify's lever, regex-widened), so a
    // suspect can be re-timed in isolation or as a small matched subset
    // without the 260-query ambient load.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim.r).toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(_.findFirstIn(n).isDefined))
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}""")
    spark.stop()
  }
}
