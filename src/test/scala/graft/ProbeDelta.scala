package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: drive the merge-on-read delta UPDATE/MERGE path (round 16
  * spike; test scope, not shipped). */
object ProbeDelta {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val base = "/tmp/probe_delta_" + System.nanoTime()
    s.conf.set("spark.sql.catalog.pd", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.pd.base", base)
    s.sql("DROP TABLE IF EXISTS pd.t")
    s.sql("CREATE TABLE pd.t TBLPROPERTIES " +
      "('graft.dv.enabled'='true','graft.cdf.enabled'='true') AS " +
      "SELECT id AS k, CAST(id * 10 AS BIGINT) AS v " +
      "FROM range(0, 1000)")
    val dir = new java.io.File(s"$base/t")
    def files(): Set[String] = graft.sources.GraftTxn.dataFiles(dir)
    val before = files()
    println("[probe] files before: " + before.size)

    // --- UPDATE: small slice -> DV path
    s.sql("UPDATE pd.t SET v = v + 1 WHERE k < 20")
    val after = files()
    println("[probe] rewritten=" + (before diff after).size +
      " added=" + (after diff before).size +
      " dvs=" + graft.sources.GraftDv.hasDvs(dir))
    val r = s.table("pd.t").agg(count(lit(1)), sum(col("v"))).collect()(0)
    val expect = (0L until 1000L).map(_ * 10).sum + 20
    println(s"[probe] count=${r.getLong(0)} (want 1000) " +
      s"sum=${r.getLong(1)} (want $expect)")

    // --- repeated update of the same rows (composes over DVs)
    s.sql("UPDATE pd.t SET v = v + 1 WHERE k < 10")
    val r2 = s.table("pd.t").agg(count(lit(1)), sum(col("v"))).collect()(0)
    println(s"[probe] count2=${r2.getLong(0)} (want 1000) " +
      s"sum2=${r2.getLong(1)} (want ${expect + 10})")

    // --- time travel reads v1 state
    val tt = s.sql("SELECT sum(v) FROM pd.t VERSION AS OF 1").collect()(0)
    println(s"[probe] tt_v1_sum=${tt.getLong(0)} (want ${expect - 20})")

    // --- MERGE matched-update + not-matched-insert
    s.sql("SELECT id AS k, CAST(-1 AS BIGINT) AS v FROM range(995, 1005)")
      .createOrReplaceTempView("src")
    s.sql("MERGE INTO pd.t USING src ON pd.t.k = src.k " +
      "WHEN MATCHED THEN UPDATE SET v = src.v " +
      "WHEN NOT MATCHED THEN INSERT *")
    val r3 = s.table("pd.t").agg(count(lit(1)), sum(col("v"))).collect()(0)
    val expect3 = expect + 10 -
      (995L until 1000L).map(_ * 10).sum + (-1L * 10)
    println(s"[probe] count3=${r3.getLong(0)} (want 1005) " +
      s"sum3=${r3.getLong(1)} (want $expect3)")

    // --- CDF classes for the first update (version 2)
    val cdf = graft.sources.GraftCdf.rows(s, dir)
      .filter(col("_commit_version") === 2L)
      .groupBy(col("_change_type")).count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    println(s"[probe] cdf v2: $cdf (want insert->20, delete->20)")

    // --- OPTIMIZE materializes
    s.sql(s"CALL pd.optimize('t', ${1L << 40})")
    println("[probe] dvs after optimize=" +
      graft.sources.GraftDv.hasDvs(dir))
    val r4 = s.table("pd.t").agg(count(lit(1)), sum(col("v"))).collect()(0)
    println(s"[probe] count4=${r4.getLong(0)} sum4=${r4.getLong(1)} " +
      s"(want 1005 / $expect3)")
    s.sql("DROP TABLE IF EXISTS pd.t")
    spark.stop()
  }
}
