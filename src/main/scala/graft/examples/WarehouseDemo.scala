package graft.examples

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, GraftMaintenance, GraftTxn}

/** End-to-end usage example of the transactional warehouse surface on
  * CALLER-OWNED data (nothing here touches the test-corpus loaders):
  * register a graft catalog, CTAS, INSERT / UPDATE / DELETE / MERGE as
  * versioned commits, time travel, version diff, the graft-cdc change
  * feed, RESTORE, clustered OPTIMIZE, and VACUUM. Run:
  *   runMain graft.examples.WarehouseDemo
  */
object WarehouseDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftSparkSessionExtensions].getName).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // 1. a graft catalog is just a conf pair: filesystem IS the metastore
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_wh_demo_${System.nanoTime()}")
    spark.conf.set("spark.sql.catalog.wh", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wh.base", base.getAbsolutePath)

    // 2. every statement below is a VERSIONED commit (lock + snapshot)
    spark.sql("CREATE TABLE wh.accounts AS " +
      "SELECT id AS acct, CAST(100 AS BIGINT) AS balance FROM range(0, 8)")
    spark.sql("INSERT INTO wh.accounts VALUES (100, CAST(5 AS BIGINT))")
    spark.sql("UPDATE wh.accounts SET balance = balance + 50 WHERE acct < 3")
    spark.sql("DELETE FROM wh.accounts WHERE acct = 7")
    GraftTxn.retryOnConflict() { // the multi-writer-safe spelling
      spark.sql("MERGE INTO wh.accounts t USING " +
        "(SELECT CAST(200 AS BIGINT) AS acct, CAST(9 AS BIGINT) AS balance) s " +
        "ON t.acct = s.acct " +
        "WHEN MATCHED THEN UPDATE SET balance = s.balance " +
        "WHEN NOT MATCHED THEN INSERT (acct, balance) VALUES (s.acct, s.balance)")
        .collect(): Unit
    }
    val dir = new File(base, "accounts")
    println(s"current version: ${GraftTxn.version(dir)} (5 commits)")

    // 3. time travel + what-changed
    println("state at v2 (post-INSERT):")
    spark.sql("SELECT * FROM wh.accounts VERSION AS OF 2")
      .orderBy("acct").show(false)
    println("diff v2 -> v5 per key:")
    graft.operators.Dml.versionDiff(spark, "wh.accounts", 2L, 5L, Seq("acct"))
      .filter(col("change_type") =!= "unchanged").orderBy("acct").show(false)

    // 4. the change feed: one row per commit, consumed as a stream
    val q = spark.readStream.format("graft-cdc")
      .option("tableDir", dir.getAbsolutePath).load()
      .writeStream.format("memory").queryName("wh_feed")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println("commit feed (streamed):")
    spark.table("wh_feed").orderBy("version").show(false)

    // 5. maintenance: restore a bad restatement, re-cluster, reclaim
    val restoredTo = GraftMaintenance.restore(dir, 4L) // undo the MERGE
    println(s"restored pre-MERGE state as NEW version $restoredTo; " +
      s"balance sum = " +
      spark.sql("SELECT SUM(balance) FROM wh.accounts").head().getLong(0))
    val (before, after) = GraftMaintenance.compact(spark, dir,
      targetBytes = 1L << 30, clusterBySql = Some("acct"))
    println(s"clustered OPTIMIZE: $before files -> $after")
    val dropped = GraftMaintenance.vacuum(dir, retain = 2)
    println(s"VACUUM dropped $dropped old snapshots; table still reads: " +
      spark.table("wh.accounts").count() + " rows")

    // 6. round-14 surface: a PARTITIONED, CDF-enabled, constrained
    // ledger table — hive layout + directory-pruned reads, CHECK
    // enforced per commit, row-level change feed
    spark.sql("CREATE TABLE wh.ledger " +
      "(acct BIGINT, amount BIGINT, region STRING) " +
      "PARTITIONED BY (region) " +
      "TBLPROPERTIES ('graft.cdf.enabled'='true', " +
      "'graft.check.amount_pos'='amount > 0')")
    spark.sql("INSERT INTO wh.ledger VALUES " +
      "(1, 10, 'emea'), (2, 20, 'amer'), (3, 30, 'emea')")
    try spark.sql("INSERT INTO wh.ledger VALUES (4, -1, 'amer')")
    catch { case e: Throwable
        if graft.sources.GraftConstraints.isViolation(e) =>
      println("CHECK amount_pos rejected the bad commit atomically")
    }
    println("pruned read (region = 'emea' scans only its directory):")
    spark.sql("SELECT * FROM wh.ledger WHERE region = 'emea'")
      .orderBy("acct").show(false)

    // 7. a MULTI-TABLE transaction: restate the ledger and log the
    // batch to an audit table — both-or-neither
    spark.sql("CREATE TABLE wh.audit (batch BIGINT, n BIGINT)")
    val ledgerDir = new File(base, "ledger")
    val restated = spark.table("wh.ledger")
      .selectExpr("acct", "amount * 2 AS amount", "region")
    graft.sources.GraftMultiTxn.run(spark, Seq(
      graft.sources.GraftMultiTxn.TableWrite(ledgerDir, restated,
        overwrite = true),
      graft.sources.GraftMultiTxn.TableWrite(new File(base, "audit"),
        Seq((1L, 3L)).toDF("batch", "n"))))
    println("after the atomic multi-table txn: ledger doubled, audit logged")

    // 8. the native streaming SINK: each micro-batch is one
    // exactly-once commit; the row-level CDC feed sees every change
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    ms.addData(Seq((10L, 5L, "apac"), (11L, 6L, "apac")))
    val sink = ms.toDS().toDF("acct", "amount", "region")
      .writeStream.format("graft")
      .option("tableDir", ledgerDir.getAbsolutePath)
      .option("checkpointLocation", new File(base, "ledger_cp").getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    sink.awaitTermination()
    println("streamed epoch committed; row-level change feed:")
    graft.sources.GraftCdf.rows(spark, ledgerDir)
      .orderBy("_commit_version", "acct")
      .show(20, truncate = false)

    // 9. round-15 surfaces: file skipping, hidden partitioning,
    // deletion vectors, SQL multi-table txn, persistent views
    // -- a range-clustered fact table: commits record footer stats and
    //    range reads open only qualifying files (watch .stats)
    spark.range(0, 8000)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .createOrReplaceTempView("facts_src")
    spark.sql("CREATE TABLE wh.facts " +
      "TBLPROPERTIES ('graft.dv.enabled'='true') AS " +
      "SELECT * FROM facts_src")
    spark.sql("SELECT COUNT(*) AS in_range FROM wh.facts " +
      "WHERE k BETWEEN 1000 AND 1999").show()
    val factsDir = new File(base, "facts")
    val (listed, kept) = graft.sources.GraftStats
      .lastReport(factsDir.getAbsolutePath)
    println(s"file skipping: opened $kept of $listed files for the range")
    // -- a small DELETE takes the deletion-vector path: zero rewrites
    val filesBefore = GraftTxn.dataFiles(factsDir)
    spark.sql("DELETE FROM wh.facts WHERE k >= 100 AND k < 120")
    println(s"DV delete rewrote ${
      (GraftTxn.dataFiles(factsDir) diff filesBefore).size} files; sidecars:")
    spark.sql("SELECT * FROM wh.facts.dvs").show(false)
    spark.sql("CALL wh.optimize('facts', 1073741824)") // folds DVs in
    // -- hidden partitioning: days(ts) dirs, schema stays clean
    spark.sql("CREATE TABLE wh.events (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO wh.events SELECT id, " +
      "timestamp_micros(CAST(1704067200000000 + (id % 3) * 86400000000 " +
      "AS LONG)) FROM range(0, 30)")
    println("events schema (derived day dir is hidden): " +
      spark.table("wh.events").columns.mkString(", "))
    // -- the SQL face of the multi-table transaction
    spark.sql("CREATE OR REPLACE TEMP VIEW v_restate AS " +
      "SELECT acct, amount * 10 AS amount, region FROM wh.ledger")
    spark.sql("CREATE OR REPLACE TEMP VIEW v_audit AS " +
      "SELECT CAST(2 AS BIGINT) AS batch, CAST(5 AS BIGINT) AS n")
    spark.sql("CALL wh.txn('ledger=overwrite:v_restate;" +
      "audit=append:v_audit')").show(false)
    // -- persistent views: saved beside the tables, restart-durable
    spark.sql("CREATE VIEW wh.big_facts AS " +
      "SELECT k, v FROM wh.facts WHERE k >= 4000")
    spark.sql("SHOW VIEWS IN wh").show(false)
    spark.sql("SELECT COUNT(*) AS via_view FROM wh.big_facts").show()
    spark.sql("DROP VIEW wh.big_facts")

    // 10. round-16 surfaces: merge-on-read UPDATE, session
    // transactions, partition-spec evolution, materialized views
    // -- merge-on-read UPDATE on the DV-enabled facts: positions +
    //    an appended file, ZERO rewrites
    val preUpd = GraftTxn.dataFiles(factsDir)
    spark.sql("UPDATE wh.facts SET v = v + 0.5 WHERE k % 1000 = 0")
    println(s"merge-on-read UPDATE rewrote ${
      (preUpd diff GraftTxn.dataFiles(factsDir)).size} files " +
      s"(appended ${(GraftTxn.dataFiles(factsDir) diff preUpd).size})")
    // -- a session transaction: two statements, one atomic commit
    spark.sql("BEGIN")
    spark.sql("UPDATE wh.ledger SET amount = amount + 1 WHERE acct = 1")
    spark.sql("INSERT INTO wh.audit VALUES (3, 1)")
    spark.sql("COMMIT")
    println("session txn committed: " +
      s"ledger v${GraftTxn.version(ledgerDir)}")
    // -- evolve the events table's spec: months instead of days; old
    //    day dirs keep pruning, new writes land month dirs
    spark.sql("CALL wh.evolve_partitions('events', 'months(ts)')").show()
    spark.sql("INSERT INTO wh.events SELECT id, " +
      "timestamp_micros(CAST(1706745600000000 + (id % 2) * 86400000000 " +
      "AS LONG)) FROM range(100, 110)")
    // -- a materialized view over the ledger, refreshed incrementally
    //    from the change feed
    spark.sql("CREATE MATERIALIZED VIEW wh.ledger_mv AS " +
      "SELECT region, count(*) AS n, sum(amount) AS total " +
      "FROM wh.ledger GROUP BY region")
    spark.sql("UPDATE wh.ledger SET amount = amount + 100 WHERE acct = 2")
    spark.sql("CALL wh.refresh_mv('ledger_mv')").show()
    spark.sql("SELECT * FROM wh.ledger_mv ORDER BY region").show()
    spark.sql("DROP MATERIALIZED VIEW wh.ledger_mv")

    spark.sql("DROP TABLE IF EXISTS wh.facts")
    spark.sql("DROP TABLE IF EXISTS wh.events")
    spark.sql("DROP TABLE IF EXISTS wh.ledger")
    spark.sql("DROP TABLE IF EXISTS wh.audit")
    spark.sql("DROP TABLE IF EXISTS wh.accounts")
    spark.stop()
  }
}
