package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: debug sql66 pruning numbers. */
object ProbeSpecEvo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = Tables.tune(spark)
    val sfDir = "/root/testdata/sf0.01"
    val cat = Tables.graftCatalog(s, "sql66p", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.events_se")
    s.sql(s"CREATE TABLE $cat.events_se " +
      "(event_id BIGINT, ets TIMESTAMP, user_id BIGINT, value DOUBLE)")
    Tables.eventsUs(s, sfDir)
      .selectExpr("event_id", "timestamp_micros(ts) AS ets", "user_id",
        "value")
      .createOrReplaceTempView("events_src66")
    s.table("events_src66").filter(col("event_id") % 2 === 0)
      .repartitionByRange(8, col("ets"))
      .createOrReplaceTempView("events_src66_even")
    s.sql(s"INSERT INTO $cat.events_se SELECT * FROM events_src66_even")
    val dir = new java.io.File(
      s"${Tables.scratchDir("sql66p_cat", sfDir)}/events_se")
    println("[se] files after v2: " +
      graft.sources.GraftTxn.dataFiles(dir).size)
    val sid = s.sql(s"CALL $cat.evolve_partitions('events_se', " +
      "'days(ets)')").head().getLong(0)
    println("[se] sid=" + sid)
    s.sql(s"INSERT INTO $cat.events_se SELECT * FROM events_src66 " +
      "WHERE event_id % 2 = 1")
    val files = graft.sources.GraftTxn.dataFiles(dir)
    val (oldFiles, newFiles) = files.partition(!_.contains("/"))
    println(s"[se] old=${oldFiles.size} new=${newFiles.size}")
    println("[se] newdirs=" + newFiles.map(_.split("/")(0)).toSeq
      .distinct.sorted.take(40))
    val loDay = java.time.LocalDate.of(2024, 1, 8).toEpochDay
    val qualifyingNew = newFiles.count { f =>
      f.split("=")(1).split("/")(0).toLongOption
        .exists(d => d >= loDay && d < loDay + 7)
    }
    val r = s.table(s"$cat.events_se")
      .filter(col("ets") >= lit("2024-01-08 00:00:00").cast("timestamp")
        && col("ets") < lit("2024-01-15 00:00:00").cast("timestamp"))
      .agg(count(lit(1))).head()
    val (listed, kept) = graft.sources.GraftStats.lastReport(
      dir.getAbsolutePath)
    println(s"[se] n=${r.getLong(0)} listed=$listed kept=$kept " +
      s"qualNew=$qualifyingNew oldKept=${kept - qualifyingNew} " +
      s"oldHalf=${oldFiles.size / 2}")
    val ledger = graft.sources.GraftStats.load(dir)
    oldFiles.toSeq.sorted.foreach { f =>
      val st = ledger.get(f).flatMap(_.get("ets"))
      println(s"[se] old $f ets=" + st.map(x => (x.min, x.max)))
    }
    s.sql(s"DROP TABLE IF EXISTS $cat.events_se")
    spark.stop()
  }
}
