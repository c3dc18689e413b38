package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: drive BEGIN/COMMIT session transactions. */
object ProbeTxn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val base = "/tmp/probe_txn_" + System.nanoTime()
    s.conf.set("spark.sql.catalog.pt", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.pt.base", base)
    s.sql("DROP TABLE IF EXISTS pt.fact")
    s.sql("DROP TABLE IF EXISTS pt.audit")
    s.sql("CREATE TABLE pt.fact AS SELECT id AS k, id * 10 AS v " +
      "FROM range(0, 100)")
    s.sql("CREATE TABLE pt.audit (batch BIGINT, n BIGINT)")
    val dirF = new java.io.File(base, "fact")
    val dirA = new java.io.File(base, "audit")
    def vF = graft.sources.GraftTxn.version(dirF)
    def vA = graft.sources.GraftTxn.version(dirA)
    println(s"[txn] v before: fact=$vF audit=$vA")

    // --- transaction: update + insert + merge + audit append
    s.sql("BEGIN")
    s.sql("UPDATE pt.fact SET v = v + 1 WHERE k < 10")
    // read-your-writes mid-txn
    val ryw = s.sql("SELECT sum(v) FROM pt.fact").head().getLong(0)
    println(s"[txn] ryw=$ryw (want ${(0L until 100L).map(_ * 10).sum + 10})")
    // live table untouched mid-txn? (read via a FRESH name bypass —
    // the parser redirects pt.fact, so check the dir version)
    println(s"[txn] live fact version mid-txn=$vF (want 1)")
    s.sql("DELETE FROM pt.fact WHERE k >= 90")
    s.sql("INSERT INTO pt.audit VALUES (1, 10)")
    s.sql("COMMIT")
    val r = s.table("pt.fact").agg(count(lit(1)), sum(col("v"))).head()
    println(s"[txn] after commit: n=${r.getLong(0)} (want 90) " +
      s"sum=${r.getLong(1)} (want ${(0L until 90L).map(_ * 10).sum + 10})")
    println(s"[txn] audit n=${s.table("pt.audit").count()} (want 1) " +
      s"versions: fact=$vF audit=$vA")

    // --- rollback discards
    s.sql("BEGIN")
    s.sql("UPDATE pt.fact SET v = 0 WHERE k < 50")
    s.sql("ROLLBACK")
    val r2 = s.table("pt.fact").agg(sum(col("v"))).head()
    println(s"[txn] after rollback sum=${r2.getLong(0)} " +
      s"(want ${(0L until 90L).map(_ * 10).sum + 10})")

    // --- conflict: concurrent commit between BEGIN and COMMIT
    s.sql("BEGIN")
    s.sql("UPDATE pt.fact SET v = v + 5 WHERE k < 5")
    // a concurrent writer lands directly on the live table (the
    // DataFrame API bypasses the parser, so no txn redirect)
    s.range(1000, 1001).selectExpr("id AS k", "id * 10 AS v")
      .writeTo("pt.fact").append()
    val conflicted =
      try { s.sql("COMMIT"); false }
      catch { case e: Exception =>
        e.getMessage != null || true }
    println(s"[txn] conflict raised=$conflicted (want true)")
    val r3 = s.table("pt.fact").agg(count(lit(1))).head()
    println(s"[txn] rows after conflict=${r3.getLong(0)} (want 91)")
    spark.stop()
  }
}
