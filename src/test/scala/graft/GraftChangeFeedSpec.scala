package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{GraftCatalog, GraftMaintenance, GraftTxn}

/** The graft-cdc streaming source (round 13): offsets are table
  * versions read from the commit log. The contract row (st28) pins
  * the diff semantics; this spec pins the SOURCE properties the
  * oracle can't see — checkpoint restart resumes at the next commit
  * (no re-emission, no gaps), admission control paces one version per
  * micro-batch, and the batch face returns the full history. */
class GraftChangeFeedSpec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val base = new File(sys.props("java.io.tmpdir"),
      s"graft_cdc_${tag}_${System.nanoTime()}")
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.base", base.getAbsolutePath)
    base.getAbsolutePath
  }

  /** Drain the feed AvailableNow into a parquet sink; returns the
    * emitted (version, batchId) pairs. */
  private def drain(dir: File, chk: String, out: String): Seq[(Long, Long)] = {
    val q = spark.readStream.format("graft-cdc")
      .option("tableDir", dir.getAbsolutePath)
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    if (!new File(out).isDirectory) Seq.empty
    else spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[Long]("batch_id")))
      .toSeq.sortBy(_._1)
  }

  test("checkpoint restart resumes at the next commit: no re-emission, no gaps") {
    val base = freshCatalog("rs")
    spark.sql("DROP TABLE IF EXISTS rs.t")
    spark.sql("CREATE TABLE rs.t AS SELECT id AS k FROM range(0, 5)") // v1
    spark.sql("UPDATE rs.t SET k = k + 100 WHERE k = 0") // v2
    val dir = new File(base, "t")
    val scratch = new File(sys.props("java.io.tmpdir"),
      s"graft_cdc_rs_${System.nanoTime()}")
    val chk = new File(scratch, "chk").getAbsolutePath
    val out = new File(scratch, "out").getAbsolutePath

    val run1 = drain(dir, chk, out)
    assert(run1.map(_._1) == Seq(1L, 2L),
      s"first drain must emit every commit so far: $run1")
    // one version per micro-batch (admission control)
    assert(run1.map(_._2).distinct.size == run1.size,
      s"each version must arrive in its own micro-batch: $run1")

    // new commits land while the stream is down...
    spark.sql("UPDATE rs.t SET k = k + 100 WHERE k = 1") // v3
    spark.sql("DELETE FROM rs.t WHERE k = 2") // v4

    // ...the restarted query (same checkpoint) emits EXACTLY v3, v4
    val run2 = drain(dir, chk, out)
    assert(run2.map(_._1) == Seq(1L, 2L, 3L, 4L),
      s"sink after restart must hold each version exactly once: $run2")
    spark.sql("DROP TABLE IF EXISTS rs.t"): Unit
  }

  test("batch face returns the full commit history with monotonic times") {
    val base = freshCatalog("bf")
    spark.sql("DROP TABLE IF EXISTS bf.t")
    spark.sql("CREATE TABLE bf.t AS SELECT id AS k FROM range(0, 3)") // v1
    spark.sql("UPDATE bf.t SET k = k + 10 WHERE k = 0") // v2
    spark.sql("DELETE FROM bf.t WHERE k = 1") // v3
    val dir = new File(base, "t")
    val hist = spark.read.format("graft-cdc")
      .option("tableDir", dir.getAbsolutePath).load()
      .orderBy(col("version")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(hist.map(_._2).toSeq == hist.map(_._2).sorted.toSeq,
      "commit times must be non-decreasing (monotonic stamps)")
    assert(GraftTxn.version(dir) == 3L)
    // startVersion skips already-consumed history
    val tail = spark.read.format("graft-cdc")
      .option("tableDir", dir.getAbsolutePath)
      .option("startVersion", "2").load()
      .collect().map(_.getLong(0)).sorted
    assert(tail.toSeq == Seq(3L))
    // startTimestampUs resolves through the commit log: feeding from
    // v2's commit instant yields exactly the commits AFTER v2
    val t2 = hist(1)._2
    val fromTs = spark.read.format("graft-cdc")
      .option("tableDir", dir.getAbsolutePath)
      .option("startTimestampUs", t2.toString).load()
      .collect().map(_.getLong(0)).sorted
    assert(fromTs.toSeq == Seq(3L), s"from t(v2) expected [3]: ${fromTs.toSeq}")
    spark.sql("DROP TABLE IF EXISTS bf.t"): Unit
  }

  test("tableChanges returns every per-commit change in a version range") {
    val base = freshCatalog("tc")
    spark.sql("DROP TABLE IF EXISTS tc.t")
    spark.sql("CREATE TABLE tc.t AS " +
      "SELECT id AS k, id * 10 AS v FROM range(0, 6)") // v1
    spark.sql("UPDATE tc.t SET v = v + 1 WHERE k < 2") // v2: changed 0,1
    spark.sql("DELETE FROM tc.t WHERE k = 5") // v3: deleted 5
    spark.sql("INSERT INTO tc.t VALUES (9, 90)") // v4: inserted 9
    val got = graft.operators.Dml
      .tableChanges(spark, "tc.t", 1L, 4L, Seq("k"))
      .collect().map(r => (r.getAs[Long]("version"), r.getAs[Long]("k"),
        r.getAs[String]("change_type"))).toSet
    val want = Set((2L, 0L, "changed"), (2L, 1L, "changed"),
      (3L, 5L, "deleted"), (4L, 9L, "inserted"))
    assert(got == want, s"got $got")
    // the range is snapshot-gated exactly like time travel
    GraftMaintenance.vacuum(new File(base, "t"), retain = 1): Unit
    val e = intercept[Exception] {
      graft.operators.Dml.tableChanges(spark, "tc.t", 1L, 4L, Seq("k"))
        .collect()
    }
    assert(e.getMessage != null)
    spark.sql("DROP TABLE IF EXISTS tc.t"): Unit
  }
}
