package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** DML / DDL theme module (round 11 — the ExtrasN naming-debt
  * retirement, VERDICT r10 #7): the SQL statement surface against
  * catalog tables, moved verbatim from Extras11/12. sql42 catalog DDL
  * (CREATE/DROP DATABASE, catalog listings), sql43 the INSERT family,
  * sql44 CTAS, sql45 DELETE/TRUNCATE/INSERT OVERWRITE through the
  * graft DSv2 catalog, sql46 UPDATE/MERGE through the group-based
  * row-level operation support (with round-11's runtime MERGE group
  * filtering underneath — see [[graft.sources.GraftCatalog]]).
  */
object Dml {

  /** SQL42 — catalog DDL (the capability analog of the reference's
    * CREATE/DROP DATABASE + CREATE TABLE surface, §2.10): a namespace
    * created at an explicit scratch location, a table persisted into
    * it, both visible through `spark.catalog` listings, the data read
    * back through the catalog name — then DROP DATABASE CASCADE leaves
    * the session catalog clean (claims collected eagerly first, so the
    * returned frame survives the drop). What the reference does with
    * its own page files, this does with a warehouse path + parquet —
    * same user capability, lake-native storage. */
  def sql42CatalogDdl(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val loc = Tables.scratchDir("sql42_db", sfDir)
    s.sql("DROP DATABASE IF EXISTS graft_db CASCADE")
    ScaleOps.dropTableAt(s, "graft_db.nation_copy", s"$loc/nation_copy")
    s.sql(s"CREATE DATABASE graft_db LOCATION '$loc'")
    try {
      Tables.nation(s, sfDir).write.mode("overwrite")
        .saveAsTable("graft_db.nation_copy")
      val dbListed = s.catalog.listDatabases().collect()
        .exists(_.name == "graft_db")
      val tListed = s.catalog.listTables("graft_db").collect()
        .exists(_.name == "nation_copy")
      val n = s.table("graft_db.nation_copy").count()
      val nDirect = Tables.nation(s, sfDir).count()
      import s.implicits._
      Seq((dbListed, tListed, n, n == nDirect))
        .toDF("db_listed", "table_listed", "n_rows", "roundtrip_ok")
    } finally { s.sql("DROP DATABASE IF EXISTS graft_db CASCADE"): Unit }
  }

  /** SQL43 — the INSERT statement family on a catalog parquet table:
    * seed via `INSERT INTO ... SELECT`, append literals via `INSERT
    * INTO ... VALUES`, bulk-append a transformed SELECT, then restate
    * the table with `INSERT OVERWRITE`. Claims collected eagerly after
    * each statement (sql42's pattern) so the returned frame survives
    * the cleanup drop: row count after every statement plus a
    * key-sum after the appends (which pins the VALUES/SELECT row
    * CONTENTS, not just their count) and after the overwrite.
    *
    * Scale note: each INSERT is one distributed write job appending
    * files to the table location — no read-modify-write of existing
    * data; INSERT OVERWRITE replaces the table's file set atomically at
    * commit, which at warehouse scale is the s14 dynamic-overwrite
    * story with statement-level scope. */
  def sql43InsertDml(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val t = "graft_nation_dml"
    val loc = s"${Tables.scratchDir("sql43_tbl", sfDir)}/$t"
    ScaleOps.dropTableAt(s, t, loc)
    // pre-create the location: CREATE TABLE at a missing dir logs a
    // noisy (benign) FileNotFound WARN from the sink-metadata probe
    new java.io.File(loc).mkdirs()
    Tables.nation(s, sfDir).createOrReplaceTempView("nation_src43")
    s.sql(s"CREATE TABLE $t (n_nationkey INT, n_name STRING, " +
      s"n_regionkey INT) USING parquet LOCATION '$loc'")
    try {
      def snap(): (Long, Long) = {
        val r = s.table(t).agg(count(lit(1)).as("n"),
          coalesce(sum(col("n_nationkey").cast("long")), lit(0L)).as("ks"))
          .head()
        (r.getLong(0), r.getLong(1))
      }
      s.sql(s"INSERT INTO $t SELECT n_nationkey, n_name, n_regionkey " +
        "FROM nation_src43")
      val (nSeed, _) = snap()
      s.sql(s"INSERT INTO $t VALUES (900, 'ATLANTIS', 0), " +
        "(901, 'LEMURIA', 1)")
      val (nValues, _) = snap()
      s.sql(s"INSERT INTO $t SELECT n_nationkey + 1000, " +
        "concat(n_name, '_COPY'), n_regionkey FROM nation_src43 " +
        "WHERE n_regionkey < 2")
      val (nInsSel, sumInsSel) = snap()
      s.sql(s"INSERT OVERWRITE $t SELECT n_nationkey, n_name, " +
        "n_regionkey FROM nation_src43 WHERE n_regionkey IN (0, 1)")
      val (nOver, sumOver) = snap()
      import s.implicits._
      Seq((nSeed, nValues, nInsSel, sumInsSel, nOver, sumOver))
        .toDF("after_seed", "after_values", "after_insert_select",
          "keysum_after_appends", "after_overwrite", "keysum_after_overwrite")
    } finally ScaleOps.dropTableAt(s, t, loc)
  }

  /** SQL44 — `CREATE TABLE ... AS SELECT` (CTAS): a revenue-by-segment
    * aggregate materialized as a catalog parquet table in ONE statement,
    * then read back BY CATALOG NAME — the one-shot
    * produce-and-register step every warehouse pipeline leans on
    * (sql42 covers DDL+copy; this is DDL+transform). The read-back
    * frame is materialized eagerly so it survives the cleanup drop.
    * Money aggregates run through the Det decimal policy inside the
    * SQL text, so the persisted doubles hash-match the oracle. */
  def sql44Ctas(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val t = "graft_ctas_seg"
    val loc = s"${Tables.scratchDir("sql44_tbl", sfDir)}/$t"
    ScaleOps.dropTableAt(s, t, loc)
    new java.io.File(loc).mkdirs()
    Tables.customer(s, sfDir).createOrReplaceTempView("customer_src44")
    Tables.orders(s, sfDir).createOrReplaceTempView("orders_src44")
    s.sql(s"CREATE TABLE $t USING parquet LOCATION '$loc' AS " +
      "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
      "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
      "FROM orders_src44 JOIN customer_src44 ON o_custkey = c_custkey " +
      "GROUP BY c_mktsegment")
    try
      s.table(t).orderBy(col("c_mktsegment")).localCheckpoint(true)
    finally ScaleOps.dropTableAt(s, t, loc)
  }

  /** SQL45 — row-level SQL through the graft DSv2 catalog
    * ([[graft.sources.GraftCatalog]], VERDICT r8 #8): `CREATE TABLE AS
    * SELECT` INTO the catalog, two `DELETE FROM ... WHERE` statements
    * (equality + compound predicate), `INSERT OVERWRITE` (the DSv2
    * truncate-write path — free from FileWriteBuilder), `TRUNCATE
    * TABLE` — statements stock parquet tables reject outright. Deletes
    * run copy-on-write (retained rows rewrite, then swap — what a
    * group-based format's ReplaceData does at table grain); claims
    * collected after every statement, key-sums pinning which rows
    * survived. (UPDATE/MERGE SQL — once this row's documented
    * boundary — landed in round 9+ as sql46/sql51 through
    * SupportsRowLevelOperations; since round 13 the INSERTs here run
    * as V2 protocol commits too, [[graft.sources.GraftTable]].) */
  def sql45RowLevelSql(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.base",
      Tables.scratchDir("sql45_cat", sfDir))
    s.sql("DROP TABLE IF EXISTS graft.nation_rl")
    Tables.nation(s, sfDir).createOrReplaceTempView("nation_src45")
    s.sql("CREATE TABLE graft.nation_rl AS SELECT * FROM nation_src45")
    try {
      def cnt(): Long = s.table("graft.nation_rl").count()
      val n0 = cnt()
      s.sql("DELETE FROM graft.nation_rl WHERE n_regionkey = 0")
      val n1 = cnt()
      s.sql("DELETE FROM graft.nation_rl " +
        "WHERE n_nationkey > 15 AND n_regionkey <> 3")
      val n2 = cnt()
      val ks = s.table("graft.nation_rl")
        .agg(coalesce(sum(col("n_nationkey").cast("long")), lit(0L)))
        .head().getLong(0)
      s.sql("INSERT OVERWRITE graft.nation_rl " +
        "SELECT n_nationkey + 100, n_name, n_regionkey " +
        "FROM nation_src45 WHERE n_regionkey = 2")
      val nOver = cnt()
      val ksOver = s.table("graft.nation_rl")
        .agg(coalesce(sum(col("n_nationkey").cast("long")), lit(0L)))
        .head().getLong(0)
      s.sql("TRUNCATE TABLE graft.nation_rl")
      val n3 = cnt()
      import s.implicits._
      Seq((n0, n1, n2, ks, nOver, ksOver, n3))
        .toDF("n_created", "after_delete_eq", "after_delete_compound",
          "keysum_surviving", "after_overwrite", "keysum_after_overwrite",
          "after_truncate")
    } finally s.sql("DROP TABLE IF EXISTS graft.nation_rl"): Unit
  }

  /** SQL46 — UPDATE and MERGE INTO as real SQL statements through the
    * graft DSv2 catalog's row-level operation support
    * ([[graft.sources.GraftParquetTable.newRowLevelOperationBuilder]]):
    * Spark's group-based RewriteUpdateTable / RewriteMergeIntoTable
    * plans compute the post-statement row set against the table's own
    * pushdown scan and the replace-data write swaps the file set at
    * commit. Exercised end to end: an UPDATE with arithmetic SET, a
    * MERGE with both MATCHED-UPDATE and NOT-MATCHED-INSERT branches,
    * and a computed-predicate DELETE (the rewrite path translatable
    * deletes skip). Claims after every statement (counts + decimal
    * price sums + key sums) recomputed from the base table by the
    * oracle; money arithmetic is the same IEEE multiply on both sides
    * then decimal-cast, so sums are order-free exact. */
  def sql46UpdateMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.base",
      Tables.scratchDir("sql46_cat", sfDir))
    s.sql("DROP TABLE IF EXISTS graft.orders_rl")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .createOrReplaceTempView("orders_src46")
    s.sql("CREATE TABLE graft.orders_rl AS " +
      "SELECT * FROM orders_src46 WHERE o_orderkey <= 2000")
    try {
      def snap(): (Long, java.math.BigDecimal, Long) = {
        val r = s.table("graft.orders_rl").agg(count(lit(1)),
          coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
            lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
          coalesce(sum(col("o_custkey")), lit(0L))).head()
        (r.getLong(0), r.getDecimal(1), r.getLong(2))
      }
      s.sql("UPDATE graft.orders_rl " +
        "SET o_totalprice = o_totalprice * 1.1 WHERE o_custkey % 10 = 0")
      val (nUpd, sumUpd, _) = snap()
      s.sql("MERGE INTO graft.orders_rl t USING (" +
        "SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice " +
        "FROM orders_src46 " +
        "WHERE o_orderkey > 1000 AND o_orderkey <= 3000) m " +
        "ON t.o_orderkey = m.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET t.o_totalprice = m.o_totalprice " +
        "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, " +
        "o_totalprice) VALUES (m.o_orderkey, m.o_custkey, m.o_totalprice)")
      val (nMerge, sumMerge, keysum) = snap()
      s.sql("DELETE FROM graft.orders_rl WHERE o_orderkey % 7 = 3")
      val (nDel, sumDel, _) = snap()
      import s.implicits._
      Seq((nUpd, nMerge, nDel))
        .toDF("n_after_update", "n_after_merge", "n_after_delete")
        .withColumn("price_after_update",
          lit(sumUpd).cast(graft.Det.Money).cast("double"))
        .withColumn("price_after_merge",
          lit(sumMerge).cast(graft.Det.Money).cast("double"))
        .withColumn("price_after_delete",
          lit(sumDel).cast(graft.Det.Money).cast("double"))
        .withColumn("custkeysum_after_merge", lit(keysum))
    } finally s.sql("DROP TABLE IF EXISTS graft.orders_rl"): Unit
  }

  /** SQL51 — MERGE with `WHEN NOT MATCHED BY SOURCE` arms (round 11;
    * the third MERGE clause family, completing sql46): target rows
    * with NO source match take their own action — the
    * "synchronize the table to the feed" statement (conditional
    * BY-SOURCE DELETE here, the retention sweep every
    * mirror-a-changefeed pipeline runs). Contract pins the statement
    * end to end through the graft catalog's row-level machinery AND
    * the shape's scale boundary: a BY SOURCE arm makes EVERY target
    * row a potential participant, so the rewrite group is soundly the
    * whole table — the runtime (join-driven) group filter MUST NOT
    * fire (Spark only plans its group-filter subquery for shapes
    * where pruning is sound; the spec pins that rows outside the
    * source-matched files still take the BY SOURCE action). Claims:
    * count + Det-decimal price sum + keysum after the statement,
    * restated by the oracle as plain state algebra over the base
    * table. */
  def sql51MergeBySource(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.base",
      Tables.scratchDir("sql51_cat", sfDir))
    s.sql("DROP TABLE IF EXISTS graft.orders_bs")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .createOrReplaceTempView("orders_src51")
    s.sql("CREATE TABLE graft.orders_bs AS " +
      "SELECT * FROM orders_src51 WHERE o_orderkey <= 2000")
    try {
      s.sql("MERGE INTO graft.orders_bs t USING (" +
        "SELECT o_orderkey, o_totalprice FROM orders_src51 " +
        "WHERE o_orderkey <= 1000) m " +
        "ON t.o_orderkey = m.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET t.o_totalprice = " +
        "m.o_totalprice * 1.5 " +
        "WHEN NOT MATCHED BY SOURCE AND t.o_custkey % 2 = 0 " +
        "THEN DELETE")
      val r = s.table("graft.orders_bs").agg(count(lit(1)),
        coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("o_custkey")), lit(0L))).head()
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2)))
        .toDF("n_after_merge", "custkeysum_after_merge")
        .withColumn("price_after_merge",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_after_merge"), col("price_after_merge"),
          col("custkeysum_after_merge"))
    } finally s.sql("DROP TABLE IF EXISTS graft.orders_bs"): Unit
  }

  /** SQL52 — TIME TRAVEL over graft tables (round 12; the snapshot
    * half of what VERDICT r11 #1's commit protocol enables): every
    * transactional commit captures its PRE-state as hard links under
    * `_snapshots/v<N>` ([[graft.sources.GraftTxn]]), and
    * `VERSION AS OF n` resolves through the catalog's versioned
    * loadTable to that snapshot — CREATE (v1), UPDATE (v2), DELETE
    * (v3 = current) each probed side by side in one statement sequence,
    * including v0 (the empty pre-CTAS table). s21 is this capability's
    * hand-rolled directory convention; this row is the REAL SQL
    * surface over the same filesystem mechanics. Claims are exact
    * integer counts/sums per version; the oracle restates each
    * version's state from the base table. */
  def sql52TimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.base",
      Tables.scratchDir("sql52_cat", sfDir))
    s.sql("DROP TABLE IF EXISTS graft.nation_tt")
    Tables.nation(s, sfDir).select(col("n_nationkey"))
      .createOrReplaceTempView("nation_src52")
    s.sql("CREATE TABLE graft.nation_tt AS " +
      "SELECT n_nationkey AS k, CAST(n_nationkey * 10 AS BIGINT) AS v " +
      "FROM nation_src52") // commit 1
    try {
      s.sql("UPDATE graft.nation_tt SET v = v + 1000 WHERE k % 5 = 0") // 2
      s.sql("DELETE FROM graft.nation_tt WHERE k % 3 = 0") // 3 (swap path)
      def st(ver: Long): (Long, Long, Long) = {
        val r = s.sql("SELECT COUNT(*), COALESCE(SUM(k), 0), " +
          s"COALESCE(SUM(v), 0) FROM graft.nation_tt VERSION AS OF $ver")
          .head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val v0 = st(0); val v1 = st(1); val v2 = st(2); val v3 = st(3)
      val cur = s.sql("SELECT COUNT(*) FROM graft.nation_tt")
        .head().getLong(0)
      import s.implicits._
      Seq((v0._1, v1._1, v1._2, v1._3, v2._1, v2._3, v3._1, v3._2,
          v3._3, cur == v3._1))
        .toDF("n_v0", "n_v1", "ksum_v1", "vsum_v1", "n_v2", "vsum_v2",
          "n_v3", "ksum_v3", "vsum_v3", "current_is_v3")
    } finally s.sql("DROP TABLE IF EXISTS graft.nation_tt"): Unit
  }

  /** PUBLIC version-diff kernel: classify every key of a graft table
    * between two retained versions — inserted / deleted / changed /
    * unchanged — through the time-travel surface (one full-outer join
    * of the two snapshots; the x78 release-diff pattern applied to
    * table history instead of md5 fingerprints). This is the "what
    * did that commit change" CDC query a warehouse owner runs before
    * publishing a restatement; at 100 TB both sides are plain
    * parquet scans of their snapshot dirs and the join shuffles on
    * the key. */
  def versionDiff(spark: SparkSession, table: String, vOld: Long,
      vNew: Long, keyCols: Seq[String]): DataFrame = {
    val o = spark.sql(s"SELECT * FROM $table VERSION AS OF $vOld")
    val n = spark.sql(s"SELECT * FROM $table VERSION AS OF $vNew")
    val valueCols = o.columns.filterNot(keyCols.contains).toSeq
    // EXPLICIT presence markers (round 14, VERDICT r13 #5): each side
    // carries lit(true) before the join, so side membership after the
    // full-outer is the marker's null-ness — NEVER inferred from value
    // columns, which may legitimately hold nulls (the old inference
    // read an all-null-valued key as "absent" and misclassified it)
    val oR = o.select(keyCols.map(col) ++
      (valueCols.map(c => col(c).as(s"__old_$c")) :+
        lit(true).as("__old_present")): _*)
    val nR = n.select(keyCols.map(col) ++
      (valueCols.map(c => col(c).as(s"__new_$c")) :+
        lit(true).as("__new_present")): _*)
    val inOld = coalesce(col("__old_present"), lit(false))
    val inNew = coalesce(col("__new_present"), lit(false))
    val changed = valueCols.map(c =>
      !(col(s"__old_$c") <=> col(s"__new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    oR.join(nR, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(!inOld, lit("inserted"))
          .when(!inNew, lit("deleted"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"): _*)
  }

  /** PUBLIC batch change-range face (round 13; the `table_changes`
    * TVF analog, completing the CDC family: sql52 reads a version,
    * x180 diffs two versions, st28 streams commits — this returns
    * EVERY per-commit change in a version range as one frame):
    * union of [[versionDiff]](v-1, v) for v in (vFrom, vTo], each
    * tagged with its version, unchanged keys dropped. Requires the
    * range's snapshots to be retained (same retention contract as
    * time travel). At 100 TB each term is two snapshot scans joined
    * on the key; the union is plan-level (no materialization). */
  def tableChanges(spark: SparkSession, table: String, vFrom: Long,
      vTo: Long, keyCols: Seq[String]): DataFrame = {
    require(vFrom < vTo, s"empty version range ($vFrom, $vTo]")
    ((vFrom + 1) to vTo).map { v =>
      versionDiff(spark, table, v - 1, v, keyCols)
        .filter(col("change_type") =!= "unchanged")
        .withColumn("version", lit(v))
    }.reduce(_ unionByName _)
  }

  /** X180 — version diff as a contract row: the sql52 history (CTAS
    * v1 → UPDATE v2 → DELETE v3) diffed v1 → v3 through
    * [[versionDiff]], aggregated per change class with exact key
    * sums. Oracle restates the classification as state algebra over
    * the base table (deleted ⇔ k%3=0; changed ⇔ k%5=0 surviving;
    * inserted impossible in this history). */
  def x180VersionDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.base",
      Tables.scratchDir("x180_cat", sfDir))
    s.sql("DROP TABLE IF EXISTS graft.nation_vd")
    Tables.nation(s, sfDir).select(col("n_nationkey"))
      .createOrReplaceTempView("nation_src180")
    s.sql("CREATE TABLE graft.nation_vd AS " +
      "SELECT n_nationkey AS k, CAST(n_nationkey * 10 AS BIGINT) AS v " +
      "FROM nation_src180") // v1
    try {
      s.sql("UPDATE graft.nation_vd SET v = v + 1000 WHERE k % 5 = 0") // 2
      s.sql("DELETE FROM graft.nation_vd WHERE k % 3 = 0") // 3
      versionDiff(s, "graft.nation_vd", 1L, 3L, Seq("k"))
        .groupBy(col("change_type"))
        .agg(count(lit(1)).as("n_keys"),
          coalesce(sum(col("k")), lit(0L)).as("ksum"))
        .orderBy(col("change_type"))
        // the aggregate must materialize before the finally-DROP
        .localCheckpoint(true)
    } finally s.sql("DROP TABLE IF EXISTS graft.nation_vd"): Unit
  }

  /** X181 — transactional OPTIMIZE (round 12; s18's bin-packing as a
    * COMMIT-PROTOCOL table operation,
    * [[graft.sources.GraftMaintenance.compact]]): a 64-file CTAS
    * layout compacts to ceil(bytes/target) files under the table's
    * commit lock — read-snapshot validated (a concurrent commit
    * conflicts instead of losing its write), pre-state snapshotted
    * (claimed HERE via time travel: the pre-compaction version still
    * reads and agrees), version bumped. Claims: exact row/key counts
    * + Det-decimal revenue after compaction, `compacted` (file count
    * really dropped), `pre_version_equal` (maintenance is
    * value-neutral AND history survives it). */
  def x181CompactTable(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    // per-corpus catalog name (round 13): the scale rehearsal runs this
    // row against TWO corpora in one session, and catalog instances are
    // cached by name with their first base — see Tables.graftCatalog
    val cat = Tables.graftCatalog(s, "x181", sfDir)
    val base = Tables.scratchDir("x181_cat", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_ct")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .repartition(64)
      .createOrReplaceTempView("orders_src181")
    s.sql(s"CREATE TABLE $cat.orders_ct AS SELECT * FROM orders_src181")
    try {
      val dir = new java.io.File(s"$base/orders_ct")
      val vPre = graft.sources.GraftTxn.version(dir)
      val (nBefore, nAfter) =
        graft.sources.GraftMaintenance.compact(s, dir)
      val r = s.table(s"$cat.orders_ct").agg(count(lit(1)),
        coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        countDistinct(col("o_orderkey"))).head()
      val nPre = s.sql(s"SELECT COUNT(*) FROM $cat.orders_ct " +
        s"VERSION AS OF $vPre").head().getLong(0)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), nBefore > nAfter,
          nPre == r.getLong(0)))
        .toDF("n_rows", "n_keys", "compacted", "pre_version_equal")
        .withColumn("revenue",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("revenue"), col("n_keys"),
          col("compacted"), col("pre_version_equal"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.orders_ct"): Unit
  }

  /** SQL53 — RESTORE TABLE ... TO VERSION (round 13, VERDICT r12 #1):
    * the rollback a warehouse owner runs after a bad restatement,
    * through [[graft.sources.GraftMaintenance.restore]] — a retained
    * snapshot promoted back to live as a NEW validated commit under
    * the table's lock. History: CTAS v1 → UPDATE v2 → DELETE v3 →
    * RESTORE(1) = v4. Claims: post-restore state equals v1 exactly
    * (count + key/value sums), the PRE-restore state (v3) is still
    * readable through time travel (history moved forward, nothing
    * rewound), and the current version really is 4. The oracle
    * restates v1 and v3 as state algebra over the base table. */
  def sql53Restore(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    s.conf.set("spark.sql.catalog.graft53",
      classOf[graft.sources.GraftCatalog].getName)
    val base = Tables.scratchDir("sql53_cat", sfDir)
    s.conf.set("spark.sql.catalog.graft53.base", base)
    s.sql("DROP TABLE IF EXISTS graft53.nation_rs")
    Tables.nation(s, sfDir).select(col("n_nationkey"))
      .createOrReplaceTempView("nation_src53")
    s.sql("CREATE TABLE graft53.nation_rs AS " +
      "SELECT n_nationkey AS k, CAST(n_nationkey * 10 AS BIGINT) AS v " +
      "FROM nation_src53") // v1
    try {
      s.sql("UPDATE graft53.nation_rs SET v = v + 1000 WHERE k % 5 = 0") // 2
      s.sql("DELETE FROM graft53.nation_rs WHERE k % 3 = 0") // 3 (swap)
      val dir = new java.io.File(s"$base/nation_rs")
      val vNew = graft.sources.GraftMaintenance.restore(dir, 1L)
      val r = s.table("graft53.nation_rs").agg(count(lit(1)),
        coalesce(sum(col("k")), lit(0L)),
        coalesce(sum(col("v")), lit(0L))).head()
      val r3 = s.sql("SELECT COUNT(*), COALESCE(SUM(v), 0) " +
        "FROM graft53.nation_rs VERSION AS OF 3").head()
      import s.implicits._
      Seq((r.getLong(0), r.getLong(1), r.getLong(2), r3.getLong(0),
          r3.getLong(1), vNew == 4L))
        .toDF("n_after_restore", "ksum_after_restore", "vsum_after_restore",
          "n_v3", "vsum_v3", "restored_as_v4")
    } finally s.sql("DROP TABLE IF EXISTS graft53.nation_rs"): Unit
  }

  /** SQL54 — SCHEMA EVOLUTION on graft tables (round 13, VERDICT r12
    * #6): `ALTER TABLE ... ADD COLUMN` updates the schema pin under
    * the commit lock as its own version; pre-alter files read NULL
    * for the new column (metadata-only evolution — no data rewrite),
    * post-alter writes carry it, a row-level UPDATE backfills across
    * the MIXED file population, and time travel to the pre-alter
    * version reads the OLD two-column schema (each snapshot keeps its
    * pinned schema across the boundary). Claims are counts the oracle
    * restates from the base table plus schema-width booleans. */
  def sql54SchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    s.conf.set("spark.sql.catalog.graft54",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft54.base",
      Tables.scratchDir("sql54_cat", sfDir))
    s.sql("DROP TABLE IF EXISTS graft54.nation_se")
    Tables.nation(s, sfDir).select(col("n_nationkey"))
      .createOrReplaceTempView("nation_src54")
    s.sql("CREATE TABLE graft54.nation_se AS " +
      "SELECT n_nationkey AS k, CAST(n_nationkey * 10 AS BIGINT) AS v " +
      "FROM nation_src54") // v1
    try {
      s.sql("ALTER TABLE graft54.nation_se ADD COLUMN tag STRING") // v2
      val widthNew = s.table("graft54.nation_se").schema.length
      val nullsAfterAlter = s.table("graft54.nation_se")
        .filter(col("tag").isNull).count()
      s.sql("INSERT INTO graft54.nation_se VALUES " +
        "(900, CAST(9000 AS BIGINT), 'fresh'), " +
        "(901, CAST(9010 AS BIGINT), 'fresh')")
      s.sql("UPDATE graft54.nation_se SET tag = 'legacy' " +
        "WHERE tag IS NULL") // backfill across mixed files
      val r = s.table("graft54.nation_se").agg(count(lit(1)),
        count(when(col("tag") === "legacy", 1)),
        count(when(col("tag") === "fresh", 1)),
        coalesce(sum(col("k")), lit(0L))).head()
      val widthOld =
        s.sql("SELECT * FROM graft54.nation_se VERSION AS OF 1")
          .schema.length
      // RENAME COLUMN (round 14, VERDICT r13 #6): metadata-only pin
      // rewrite over stable field ids — every pre-rename file reads
      // its values under the NEW name (id resolution), and time travel
      // to the pre-rename version reads under the OLD name
      val vPreRen = graft.sources.GraftTxn.version(new java.io.File(
        s"${Tables.scratchDir("sql54_cat", sfDir)}/nation_se"))
      s.sql("ALTER TABLE graft54.nation_se RENAME COLUMN tag TO label")
      val nLabelLegacy = s.table("graft54.nation_se")
        .filter(col("label") === "legacy").count()
      val preRen =
        s.sql(s"SELECT * FROM graft54.nation_se VERSION AS OF $vPreRen")
      val renameOk =
        s.table("graft54.nation_se").schema.fieldNames.contains("label") &&
          preRen.schema.fieldNames.contains("tag") &&
          preRen.filter(col("tag") === "legacy").count() == r.getLong(1)
      // TYPE WIDENING (round 16, VERDICT r15 ask #6): k INT → BIGINT
      // is a metadata-only pin rewrite; a value only a BIGINT can
      // hold then appends, and the aggregate spans MIXED physical
      // files (old int32 + new int64) through the readers' native
      // upcast. Time travel to the pre-widen version reads INT;
      // narrowing (v BIGINT → INT) rejects.
      val vPreWide = graft.sources.GraftTxn.version(new java.io.File(
        s"${Tables.scratchDir("sql54_cat", sfDir)}/nation_se"))
      s.sql("ALTER TABLE graft54.nation_se ALTER COLUMN k TYPE BIGINT")
      s.sql("INSERT INTO graft54.nation_se VALUES " +
        "(CAST(5000000000 AS BIGINT), CAST(1 AS BIGINT), 'wide')")
      val rw = s.table("graft54.nation_se")
        .agg(count(lit(1)), coalesce(sum(col("k")), lit(0L))).head()
      val narrowRejected =
        try {
          s.sql("ALTER TABLE graft54.nation_se ALTER COLUMN v TYPE INT")
          false
        } catch { case _: Exception => true }
      val widenOk = s.table("graft54.nation_se").schema("k").dataType ==
          org.apache.spark.sql.types.LongType &&
        s.sql(s"SELECT * FROM graft54.nation_se VERSION AS OF $vPreWide")
          .schema("k").dataType ==
          org.apache.spark.sql.types.IntegerType &&
        narrowRejected
      import s.implicits._
      Seq((r.getLong(0), nullsAfterAlter, r.getLong(1), r.getLong(2),
          r.getLong(3), widthOld == 2 && widthNew == 3, nLabelLegacy,
          renameOk, rw.getLong(0), rw.getLong(1), widenOk))
        .toDF("n_total", "n_nulls_after_alter", "n_legacy", "n_fresh",
          "ksum_total", "schema_widths_ok", "n_label_legacy", "rename_ok",
          "n_total_w", "ksum_w", "widen_ok")
    } finally s.sql("DROP TABLE IF EXISTS graft54.nation_se"): Unit
  }

  /** X182 — PARTITION-SCOPED transactional OPTIMIZE (round 13,
    * VERDICT r12 #7 — the `OPTIMIZE ... WHERE <partition>` surface,
    * the 100-TB form x181's whole-table compact names in its
    * scaladoc): a hive-partitioned orders layout (4 `pbucket=` dirs ×
    * 16 files) compacts ONLY the two qualifying partitions, under one
    * table lock with PER-PARTITION set validation
    * ([[graft.sources.GraftMaintenance.compactPartitions]]). Claims:
    * whole-table counts and Det-decimal revenue unchanged
    * (value-neutral), both targets really packed, and the untouched
    * partitions BYTE-IDENTICAL (file name + size signature compared
    * before/after — never rewritten, never moved). */
  def x182CompactPartitions(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val dir = new java.io.File(Tables.scratchDir("x182_part", sfDir))
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("o_orderkey") % 4).cast("int").as("pbucket"))
      .repartition(16)
      .write.partitionBy("pbucket").mode("overwrite")
      .parquet(dir.getAbsolutePath)
    def sig(name: String): Map[String, Long] = {
      val p = new java.io.File(dir, name)
      graft.sources.GraftTxn.dataFiles(p)
        .map(n => n -> new java.io.File(p, n).length()).toMap
    }
    val untouchedBefore = Seq("pbucket=2", "pbucket=3").map(sig)
    val res = graft.sources.GraftMaintenance.compactPartitions(s, dir,
      where = n => n == "pbucket=0" || n == "pbucket=1",
      targetBytes = 1L << 40)
    val untouchedSame =
      Seq("pbucket=2", "pbucket=3").map(sig) == untouchedBefore
    val packed = res.size == 2 &&
      res.values.forall { case (b, a) => b > a && a == 1 }
    val r = s.read.parquet(dir.getAbsolutePath).agg(count(lit(1)),
      coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
        lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
      countDistinct(col("o_orderkey"))).head()
    import s.implicits._
    Seq((r.getLong(0), r.getLong(2), packed, untouchedSame))
      .toDF("n_rows", "n_keys", "packed", "untouched_identical")
      .withColumn("revenue",
        lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
      .select(col("n_rows"), col("revenue"), col("n_keys"),
        col("packed"), col("untouched_identical"))
  }

  /** X183 — transactional CLUSTERED OPTIMIZE (round 13; the
    * `OPTIMIZE ... ZORDER BY` analog — x26's Morton layout brought
    * under the commit protocol, the "transactional clustering"
    * surface VERDICT r12's missing-list #4 names): a 16-file
    * unordered orders CTAS rewrites under
    * [[graft.sources.GraftMaintenance.compact]] with
    * `clusterBySql` = the 8×8-bit Morton interleave of
    * (custkey bucket, price bucket) — range-repartitioned AND sorted
    * by the curve, so every output file owns a DISJOINT z-slice and
    * min/max stats prune on either dimension. Claims: value-neutral
    * counts/revenue, version bumped with the pre-layout version still
    * readable, and `z_disjoint` — the per-file [z_min, z_max] ranges
    * verified pairwise non-overlapping from the written layout
    * itself. */
  def x183ClusteredOptimize(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    // per-corpus catalog name — same rehearsal rationale as x181
    val cat = Tables.graftCatalog(s, "x183", sfDir)
    val base = Tables.scratchDir("x183_cat", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_zo")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartition(16)
      .createOrReplaceTempView("orders_src183")
    s.sql(s"CREATE TABLE $cat.orders_zo AS SELECT * FROM orders_src183")
    try {
      val dir = new java.io.File(s"$base/orders_zo")
      val vPre = graft.sources.GraftTxn.version(dir)
      val zSql = ScaleOps.zInterleaveSql(
        "CAST(pmod(o_custkey, 256) AS BIGINT)",
        "CAST(floor(o_totalprice / 2000.0) AS BIGINT)")
      val totalBytes = graft.sources.GraftTxn.dataFiles(dir).toSeq
        .map(n => new java.io.File(dir, n).length()).sum
      val (nBefore, nAfter) = graft.sources.GraftMaintenance.compact(
        s, dir, targetBytes = math.max(1L, totalBytes / 4), Some(zSql))
      // disjointness audited from the WRITTEN layout: per-file z
      // ranges, sorted by min, must never overlap (ties at the
      // boundary allowed — equal z-values may split across files)
      val ranges = s.table(s"$cat.orders_zo")
        .groupBy(input_file_name().as("f"))
        .agg(min(expr(zSql)).as("zmin"), max(expr(zSql)).as("zmax"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val zDisjoint = ranges.length > 1 &&
        ranges.sliding(2).forall(p => p(0)._2 <= p(1)._1)
      val r = s.table(s"$cat.orders_zo").agg(count(lit(1)),
        coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        countDistinct(col("o_orderkey"))).head()
      val nPre = s.sql(s"SELECT COUNT(*) FROM $cat.orders_zo " +
        s"VERSION AS OF $vPre").head().getLong(0)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), nBefore == 16 && nAfter < 16,
          zDisjoint, nPre == r.getLong(0)))
        .toDF("n_rows", "n_keys", "packed", "z_disjoint",
          "pre_version_equal")
        .withColumn("revenue",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("revenue"), col("n_keys"),
          col("packed"), col("z_disjoint"), col("pre_version_equal"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.orders_zo"): Unit
  }

  /** SQL55 — stored-procedure CALL surface (round 13): the whole
    * maintenance lifecycle as pure SQL through the catalog's DSv2
    * ProcedureCatalog ([[graft.sources.GraftProcedures]]) — `CALL
    * cat.history(t)` (the DESCRIBE HISTORY analog), `CALL
    * cat.restore(table => t, version => 1)` (named args), `CALL
    * cat.optimize(t, bytes, 'key')` (clustered bin-pack), `CALL
    * cat.vacuum(t, 1)`. Claims: post-restore state equals v1 exactly
    * (count + Det revenue + keysum recomputed by the oracle from
    * orders), optimize really packed 8→1 value-neutrally, history saw
    * all five commits, vacuum reclaimed snapshots — every effect
    * observed through SQL faces only. sql53/x181/x183 exercise the
    * same machinery programmatically; this row is the SQL-only
    * user's path. */
  def sql55CallProcedures(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql55", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_mt")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartition(8)
      .createOrReplaceTempView("orders_src55")
    s.sql(s"CREATE TABLE $cat.orders_mt AS SELECT * FROM orders_src55") // 1
    try {
      s.sql(s"UPDATE $cat.orders_mt SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_custkey % 3 = 0") // v2
      s.sql(s"DELETE FROM $cat.orders_mt WHERE o_orderkey % 2 = 0") // v3
      val restoredTo = s.sql(
        s"CALL $cat.restore(`table` => 'orders_mt', version => 1)")
        .head().getLong(0) // v4
      val opt = s.sql(
        s"CALL $cat.optimize('orders_mt', ${1L << 40}, 'o_orderkey')")
        .head() // v5
      val nCommits = s.sql(s"CALL $cat.history('orders_mt')").count()
      val removed = s.sql(s"CALL $cat.vacuum('orders_mt', 1)")
        .head().getLong(0)
      val r = s.table(s"$cat.orders_mt").agg(count(lit(1)),
        coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("o_orderkey")), lit(0L))).head()
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), restoredTo == 4L,
          opt.getLong(0) == 8L && opt.getLong(1) == 1L, nCommits,
          removed >= 1L))
        .toDF("n_rows", "keysum", "restored_as_v4", "packed_8_to_1",
          "n_commits", "vacuumed")
        .withColumn("revenue",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("revenue"), col("keysum"),
          col("restored_as_v4"), col("packed_8_to_1"), col("n_commits"),
          col("vacuumed"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.orders_mt"): Unit
  }

  /** SQL56 — PARTITIONED graft tables (round 14, VERDICT r13 #1): a
    * `CREATE TABLE ... PARTITIONED BY (pbucket) AS SELECT` lands the
    * orders projection in hive-layout `pbucket=N/` dirs under the
    * commit protocol (the catalog's V2 write splits its flat stage by
    * the declared spec before promoting), an `INSERT INTO ... VALUES`
    * appends into one partition, and a partition-scoped UPDATE
    * rewrites ONLY that partition's files (its rewrite group is the
    * partition — the partition-grain conflict story GraftTxnSpec pins
    * with racing writers). Claims: final count / Det-decimal revenue /
    * keysum the oracle restates from orders, plus engine booleans —
    * `layout_ok` (all data below partition dirs, none at the root),
    * `pruned_scan_ok` (a pbucket=1 read touches pbucket=1 files ONLY —
    * directory pruning, the 100-TB property: predicates on the
    * partition column never pay I/O outside qualifying partitions) and
    * `time_travel_ok` (the pre-insert version still reads, partitioned
    * snapshots included). */
  def sql56PartitionedTable(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql56", sfDir)
    val base = Tables.scratchDir("sql56_cat", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_pt")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        pmod(col("o_custkey"), lit(4)).cast("int").as("pbucket"))
      .createOrReplaceTempView("orders_src56")
    s.sql(s"CREATE TABLE $cat.orders_pt PARTITIONED BY (pbucket) AS " +
      "SELECT * FROM orders_src56") // v1
    try {
      val dir = new java.io.File(s"$base/orders_pt")
      val layoutOk = {
        val top = Option(dir.listFiles()).getOrElse(Array.empty)
        top.exists(f => f.isDirectory && f.getName.startsWith("pbucket=")) &&
          !top.exists(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith("."))
      }
      s.sql(s"INSERT INTO $cat.orders_pt VALUES " +
        "(CAST(9000001 AS BIGINT), CAST(5 AS BIGINT), " +
        "CAST(11.0 AS DOUBLE), 1), " +
        "(CAST(9000002 AS BIGINT), CAST(9 AS BIGINT), " +
        "CAST(13.0 AS DOUBLE), 1)") // v2
      s.sql(s"UPDATE $cat.orders_pt SET o_totalprice = o_totalprice * 2 " +
        "WHERE pbucket = 3") // v3 — partition-scoped rewrite group
      val p1Files = s.table(s"$cat.orders_pt")
        .filter(col("pbucket") === 1)
        .select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0))
      val prunedOk = p1Files.nonEmpty &&
        p1Files.forall(_.contains("pbucket=1"))
      val r = s.table(s"$cat.orders_pt").agg(count(lit(1)),
        coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("o_orderkey")), lit(0L)),
        count(when(col("pbucket") === 1, 1))).head()
      val nPre = s.sql(s"SELECT COUNT(*) FROM $cat.orders_pt " +
        "VERSION AS OF 1").head().getLong(0)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), r.getLong(3), prunedOk, layoutOk,
          nPre == r.getLong(0) - 2))
        .toDF("n_rows", "keysum", "n_p1", "pruned_scan_ok", "layout_ok",
          "time_travel_ok")
        .withColumn("revenue",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("revenue"), col("keysum"),
          col("n_p1"), col("pruned_scan_ok"), col("layout_ok"),
          col("time_travel_ok"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.orders_pt"): Unit
  }

  /** SQL58 — CHECK / NOT NULL constraints enforced ON WRITE (round 14,
    * VERDICT r13 #7): a table declared with
    * `TBLPROPERTIES('graft.check.<name>'='<expr>')` and a NOT NULL
    * column rejects any commit whose staged rows violate a constraint —
    * the COMMIT, not the row: the violating INSERT and the violating
    * UPDATE both fail atomically (state, version, file set all
    * unchanged — [[graft.sources.GraftConstraints]] validates the
    * staged files before promotion, O(commit) not O(table)), while the
    * valid seed INSERT and a valid UPDATE pass. Claims: final
    * count/revenue/keysum the oracle restates from orders, plus the
    * constraint-audit counts the engine extracted from the rejections
    * (violating-row counts per constraint) and the atomicity
    * booleans. */
  def sql58CheckConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql58", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_cc")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .createOrReplaceTempView("orders_src58")
    s.sql(s"CREATE TABLE $cat.orders_cc " +
      "(o_orderkey BIGINT NOT NULL, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('graft.check.price_positive'='o_totalprice > 0')")
    try {
      val dir = new java.io.File(
        s"${Tables.scratchDir("sql58_cat", sfDir)}/orders_cc")
      s.sql(s"INSERT INTO $cat.orders_cc SELECT * FROM orders_src58")
      val vSeed = graft.sources.GraftTxn.version(dir)
      val filesSeed = graft.sources.GraftTxn.dataFiles(dir)
      def violationRows(t: Throwable): Long = {
        @annotation.tailrec
        def walk(x: Throwable, d: Int): Long = x match {
          case v: graft.sources.GraftConstraints.ConstraintViolationException =>
            v.violations.map(_._2).sum
          case null => -1L
          case _ if d >= 20 => -1L
          case _ => walk(x.getCause, d + 1)
        }
        walk(t, 0)
      }
      // a violating row among valid ones rejects the WHOLE insert
      val insViolations =
        try {
          s.sql(s"INSERT INTO $cat.orders_cc VALUES " +
            "(CAST(1 AS BIGINT), CAST(-5.0 AS DOUBLE)), " +
            "(CAST(2 AS BIGINT), CAST(5.0 AS DOUBLE))")
          -1L
        } catch { case e: Throwable
            if graft.sources.GraftConstraints.isViolation(e) =>
          violationRows(e)
        }
      // an UPDATE that would write violating rows rejects atomically
      val updViolated =
        try {
          s.sql(s"UPDATE $cat.orders_cc " +
            "SET o_totalprice = o_totalprice - 1000000000.0 " +
            "WHERE o_orderkey % 100 = 0")
          false
        } catch { case e: Throwable =>
          if (graft.sources.GraftConstraints.isViolation(e)) true
          else throw e
        }
      // a NULL into the NOT NULL column rejects too (Spark's own write
      // null-check or graft's stage validation — either way the commit
      // never lands)
      val nullRejected =
        try {
          s.sql(s"INSERT INTO $cat.orders_cc VALUES " +
            "(CAST(NULL AS BIGINT), CAST(7.0 AS DOUBLE))")
          false
        } catch { case _: Throwable => true }
      // atomicity: after three REJECTED statements the table is
      // bit-identical — same version, same file set
      val atomic = graft.sources.GraftTxn.version(dir) == vSeed &&
        graft.sources.GraftTxn.dataFiles(dir) == filesSeed
      val r = s.table(s"$cat.orders_cc").agg(count(lit(1)),
        coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("o_orderkey")), lit(0L))).head()
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), insViolations, updViolated,
          nullRejected, atomic))
        .toDF("n_rows", "keysum", "insert_violation_rows",
          "update_rejected", "null_insert_rejected", "rejections_atomic")
        .withColumn("revenue",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("revenue"), col("keysum"),
          col("insert_violation_rows"), col("update_rejected"),
          col("null_insert_rejected"), col("rejections_atomic"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.orders_cc"): Unit
  }

  /** SQL57 — MULTI-TABLE atomic commit (round 14, VERDICT r13 #2): a
    * fact-table UPSERT RESTATEMENT and its audit-log APPEND land as
    * ONE transaction through [[graft.sources.GraftMultiTxn]] — both
    * locks in canonical order, both read snapshots validated, both
    * stages promoted, ONE atomic manifest rename as the commit point,
    * both versions bumped before release. The crash-atomicity story
    * (a crash between the two promotes leaves NEITHER visible;
    * recovery rolls back from the pending manifest) is pinned by the
    * Round14 spec; this row drives the API end to end and claims the
    * post-txn state of BOTH tables: the fact upsert algebra restated
    * from orders by the oracle, the audit row's content, and both
    * tables' version counters. */
  def sql57MultiTableTxn(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql57", sfDir)
    val base = Tables.scratchDir("sql57_cat", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.fact_mt")
    s.sql(s"DROP TABLE IF EXISTS $cat.audit_mt")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .createOrReplaceTempView("orders_src57")
    s.sql(s"CREATE TABLE $cat.fact_mt AS SELECT o_orderkey AS k, " +
      "o_totalprice AS p FROM orders_src57 WHERE o_orderkey <= 2000") // v1
    s.sql(s"CREATE TABLE $cat.audit_mt (batch_id BIGINT, n_upserts BIGINT)")
    try {
      val factDir = new java.io.File(s"$base/fact_mt")
      val auditDir = new java.io.File(s"$base/audit_mt")
      // the upsert batch: keys (1000, 3000] at 2x price — matched fact
      // rows take the new price, unmatched batch rows insert (the
      // MERGE shape computed as a full-outer restatement)
      val updates = Tables.orders(s, sfDir)
        .filter(col("o_orderkey") > 1000 && col("o_orderkey") <= 3000)
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice") * 2).as("np"))
      val restated = s.table(s"$cat.fact_mt")
        .join(updates, Seq("k"), "full_outer")
        .select(col("k"), coalesce(col("np"), col("p")).as("p"))
      val nUpserts = updates.count()
      import s.implicits._
      val auditRow = Seq((1L, nUpserts)).toDF("batch_id", "n_upserts")
      graft.sources.GraftMultiTxn.run(s, Seq(
        graft.sources.GraftMultiTxn.TableWrite(factDir, restated,
          overwrite = true),
        graft.sources.GraftMultiTxn.TableWrite(auditDir, auditRow)))
      val r = s.table(s"$cat.fact_mt").agg(count(lit(1)),
        coalesce(sum(col("p").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("k")), lit(0L))).head()
      val a = s.table(s"$cat.audit_mt")
        .agg(count(lit(1)), coalesce(sum(col("n_upserts")), lit(0L)))
        .head()
      val versionsOk =
        graft.sources.GraftTxn.version(factDir) == 2L &&
          graft.sources.GraftTxn.version(auditDir) == 1L
      Seq((r.getLong(0), r.getLong(2), a.getLong(0), a.getLong(1),
          versionsOk))
        .toDF("n_fact", "keysum_fact", "n_audit", "upserts_logged",
          "versions_ok")
        .withColumn("revenue_fact",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_fact"), col("revenue_fact"), col("keysum_fact"),
          col("n_audit"), col("upserts_logged"), col("versions_ok"))
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $cat.fact_mt")
      s.sql(s"DROP TABLE IF EXISTS $cat.audit_mt"): Unit
    }
  }

  /** SQL59 — Iceberg-style METADATA TABLES (round 14): a graft
    * table's bookkeeping as SQL relations — `cat.t.history` (one row
    * per commit, from the commit log), `cat.t.files` (live files with
    * partition + size), `cat.t.snapshots` (retained time-travel
    * state), `cat.t.partitions` (per-partition footprint) — resolved
    * by [[graft.sources.GraftCatalog.loadTable]] when the namespace is
    * a graft table ([[graft.sources.GraftMetaTables]]; a real table
    * named `history` shadows the relation). Contract: a partitioned
    * history (CTAS v1 → INSERT v2 → partition-scoped UPDATE v3)
    * inspected ONLY through the metadata relations, cross-checked
    * against the filesystem; the one data-derived claim (current row
    * count) restates from orders. */
  def sql59MetadataTables(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql59", sfDir)
    val base = Tables.scratchDir("sql59_cat", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_md")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"),
        pmod(col("o_custkey"), lit(4)).cast("int").as("pbucket"))
      .createOrReplaceTempView("orders_src59")
    s.sql(s"CREATE TABLE $cat.orders_md PARTITIONED BY (pbucket) AS " +
      "SELECT * FROM orders_src59") // v1
    try {
      s.sql(s"INSERT INTO $cat.orders_md VALUES " +
        "(CAST(9000001 AS BIGINT), CAST(1.0 AS DOUBLE), 1), " +
        "(CAST(9000002 AS BIGINT), CAST(2.0 AS DOUBLE), 1)") // v2
      s.sql(s"UPDATE $cat.orders_md SET o_totalprice = o_totalprice " +
        "WHERE pbucket = 0") // v3 (identity rewrite of one partition)
      val dir = new java.io.File(s"$base/orders_md")
      val hist = s.sql(s"SELECT COUNT(*), MAX(version) " +
        s"FROM $cat.orders_md.history").head()
      val filesDf = s.sql(
        s"SELECT file, partition, size_bytes FROM $cat.orders_md.files")
      val files = filesDf.collect()
      val real = graft.sources.GraftTxn.dataFiles(dir)
      val filesOk = files.length == real.size && files.forall { r =>
        real.contains(r.getString(0)) &&
          r.getString(1).startsWith("pbucket=") &&
          r.getLong(2) == new java.io.File(dir, r.getString(0)).length()
      }
      val parts = s.sql(s"SELECT partition, n_files FROM " +
        s"$cat.orders_md.partitions").collect()
      val partsOk = parts.length == 4 &&
        parts.map(_.getLong(1)).sum == real.size &&
        parts.forall(_.getString(0).startsWith("pbucket="))
      val nSnaps = s.sql(
        s"SELECT COUNT(*) FROM $cat.orders_md.snapshots")
        .head().getLong(0)
      val nRows = s.table(s"$cat.orders_md").count()
      import s.implicits._
      Seq((nRows, hist.getLong(0), hist.getLong(1), nSnaps, filesOk,
          partsOk))
        .toDF("n_rows", "n_commits", "max_version", "n_snapshots",
          "files_ok", "partitions_ok")
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.orders_md"): Unit
  }

  /** SQL60 — MANIFEST-LEVEL FILE SKIPPING (round 15, VERDICT r14 ask
    * #1): the orders projection lands as 8 RANGE-DISJOINT files
    * (range-repartitioned CTAS through the commit protocol, which
    * records every promoted file's parquet-footer min/max into the
    * table's `_graft_filestats` ledger — [[graft.sources.GraftStats]]).
    * A range aggregate over the bottom 1/8 of the key space then
    * opens ≤3 of the 8 files: the graft scan prunes its FILE LIST
    * against the pushed predicates before any footer or data I/O —
    * the 100-TB property composing with sql56's partition pruning
    * (directory pruning first, then per-file range pruning inside
    * qualifying directories). `CALL optimize(..., cluster_by)` then
    * repacks the table into new range-disjoint files and the SAME
    * query still prunes — stats are maintained through maintenance,
    * not just first write. Claims: the range aggregate the oracle
    * restates from orders (count / Det revenue / keysum), plus engine
    * counters (files_listed = 8; pruned + post-optimize pruned). */
  def sql60FileSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql60", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_fs")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .createOrReplaceTempView("orders_src60")
    s.sql(s"CREATE TABLE $cat.orders_fs AS SELECT * FROM orders_src60")
    try {
      val dir = new java.io.File(
        s"${Tables.scratchDir("sql60_cat", sfDir)}/orders_fs")
      val nFiles = graft.sources.GraftTxn.dataFiles(dir).size
      // the SAME threshold arithmetic the oracle restates: integer
      // floor of max/8 (exact in both engines — /8 is a binary shift)
      val maxKey = Tables.orders(s, sfDir)
        .agg(max(col("o_orderkey"))).head().getLong(0)
      val thresh = maxKey / 8
      def rangeAgg() = s.table(s"$cat.orders_fs")
        .filter(col("o_orderkey") <= thresh)
        .agg(count(lit(1)),
          coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
            lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
          coalesce(sum(col("o_orderkey")), lit(0L))).head()
      val r = rangeAgg()
      val (listed, kept) = graft.sources.GraftStats.lastReport(
        dir.getAbsolutePath)
      // stats maintained through OPTIMIZE: repack into ~4 clustered
      // files, the same range query still prunes and agrees
      val total = graft.sources.GraftTxn.dataFiles(dir).toSeq
        .map(n => new java.io.File(dir, n).length()).sum
      s.sql(s"CALL $cat.optimize('orders_fs', ${math.max(1L, total / 4)}, " +
        "'o_orderkey')")
      val r2 = rangeAgg()
      val (l2, k2) = graft.sources.GraftStats.lastReport(
        dir.getAbsolutePath)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), nFiles.toLong,
          listed == 8 && kept <= 3,
          l2 > 1 && k2 < l2,
          r2.getLong(0) == r.getLong(0) &&
            r2.getDecimal(1) == r.getDecimal(1) &&
            r2.getLong(2) == r.getLong(2)))
        .toDF("n_rows", "keysum", "files_listed", "pruned_scan_ok",
          "optimize_keeps_pruning", "stable_after_optimize")
        .withColumn("revenue",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("revenue"), col("keysum"),
          col("files_listed"), col("pruned_scan_ok"),
          col("optimize_keeps_pruning"), col("stable_after_optimize"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.orders_fs"): Unit
  }

  /** SQL61 — TRANSFORM (hidden) PARTITIONING (round 15, VERDICT r14
    * ask #2): an events table declared `PARTITIONED BY (days(ets))`
    * lands every write in hive-layout `ets_day=<epochDay>/` dirs with
    * the DERIVED value in the path and the source timestamp still a
    * data column — the user-visible schema never shows the derived
    * column (Iceberg-style hidden partitioning,
    * [[graft.sources.GraftPartitions]]). A date-range aggregate over
    * 7 of the corpus's 30 days then reads ONLY the qualifying day
    * directories: the graft scan translates the predicate on the
    * SOURCE column into per-file day-ordinal ranges from the path and
    * prunes before any I/O. Claims: the 7-day aggregate the oracle
    * restates from events (count / Det value sum / keysum), plus
    * engine booleans — hive layout on the derived ordinal, derived
    * column hidden from the schema, and the pruned read touching
    * exactly the qualifying dirs' files. */
  def sql61TransformPartitions(spark: SparkSession,
      sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql61", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.events_tp")
    s.sql(s"CREATE TABLE $cat.events_tp " +
      "(event_id BIGINT, ets TIMESTAMP, user_id BIGINT, value DOUBLE) " +
      "PARTITIONED BY (days(ets))")
    Tables.eventsUs(s, sfDir)
      .selectExpr("event_id", "timestamp_micros(ts) AS ets", "user_id",
        "value")
      .createOrReplaceTempView("events_src61")
    s.sql(s"INSERT INTO $cat.events_tp SELECT * FROM events_src61")
    try {
      val dir = new java.io.File(
        s"${Tables.scratchDir("sql61_cat", sfDir)}/events_tp")
      val files = graft.sources.GraftTxn.dataFiles(dir)
      val layoutOk = files.nonEmpty &&
        files.forall(_.matches("ets_day=\\d+/.*"))
      val hiddenOk = !s.table(s"$cat.events_tp").columns.contains("ets_day")
      // 7 qualifying days: 2024-01-08 (epochDay 19730) .. 01-14 (19736)
      val loDay = java.time.LocalDate.of(2024, 1, 8).toEpochDay
      val qualifying = files.count { f =>
        f.split("=")(1).split("/")(0).toLongOption
          .exists(d => d >= loDay && d < loDay + 7)
      }
      val r = s.table(s"$cat.events_tp")
        .filter(col("ets") >= lit("2024-01-08 00:00:00").cast("timestamp")
          && col("ets") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .agg(count(lit(1)),
          coalesce(sum(col("value").cast(graft.Det.Money)),
            lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
          coalesce(sum(col("event_id")), lit(0L))).head()
      val (listed, kept) = graft.sources.GraftStats.lastReport(
        dir.getAbsolutePath)
      val prunedOk = kept < listed && kept == qualifying
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), layoutOk, hiddenOk, prunedOk))
        .toDF("n_rows", "keysum", "layout_ok", "hidden_ok",
          "pruned_scan_ok")
        .withColumn("value_sum",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("value_sum"), col("keysum"),
          col("layout_ok"), col("hidden_ok"), col("pruned_scan_ok"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.events_tp"): Unit
  }

  /** SQL63 — the SQL FACE of the multi-table transaction (round 15,
    * VERDICT r14 ask #5): sql57's fact-restatement + audit-append
    * scenario expressed with ZERO Scala API calls — the staged states
    * are temp VIEWS (`CREATE TEMP VIEW`), and
    * `CALL cat.txn('fact=overwrite:v1;audit=append:v2')` commits both
    * atomically through [[graft.sources.GraftMultiTxn]] (locks in
    * canonical order, snapshot validation, one manifest rename as the
    * commit point, `CALL recover` crash recovery — the Round15 spec
    * re-runs the crash story through this face). Claims: identical
    * algebra to sql57, restated from orders by the oracle, plus the
    * per-table versions the CALL returned. */
  def sql63SqlTxnFace(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql63", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.fact_st")
    s.sql(s"DROP TABLE IF EXISTS $cat.audit_st")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .createOrReplaceTempView("orders_src63")
    s.sql(s"CREATE TABLE $cat.fact_st AS SELECT o_orderkey AS k, " +
      "o_totalprice AS p FROM orders_src63 WHERE o_orderkey <= 2000") // v1
    s.sql(s"CREATE TABLE $cat.audit_st (batch_id BIGINT, n_upserts BIGINT)")
    try {
      s.sql("CREATE OR REPLACE TEMP VIEW v63_upserts AS " +
        "SELECT o_orderkey AS k, o_totalprice * 2 AS np " +
        "FROM orders_src63 WHERE o_orderkey > 1000 AND o_orderkey <= 3000")
      s.sql(s"CREATE OR REPLACE TEMP VIEW v63_restated AS " +
        s"SELECT COALESCE(u.k, f.k) AS k, COALESCE(u.np, f.p) AS p " +
        s"FROM $cat.fact_st f FULL OUTER JOIN v63_upserts u ON f.k = u.k")
      s.sql("CREATE OR REPLACE TEMP VIEW v63_audit AS " +
        "SELECT CAST(1 AS BIGINT) AS batch_id, " +
        "(SELECT COUNT(*) FROM v63_upserts) AS n_upserts")
      val versions = s.sql(s"CALL $cat.txn(" +
        "'fact_st=overwrite:v63_restated;audit_st=append:v63_audit')")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val r = s.table(s"$cat.fact_st").agg(count(lit(1)),
        coalesce(sum(col("p").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("k")), lit(0L))).head()
      val a = s.table(s"$cat.audit_st")
        .agg(count(lit(1)), coalesce(sum(col("n_upserts")), lit(0L)))
        .head()
      val versionsOk = versions == Map("fact_st" -> 2L, "audit_st" -> 1L)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), a.getLong(0), a.getLong(1),
          versionsOk))
        .toDF("n_fact", "keysum_fact", "n_audit", "upserts_logged",
          "versions_ok")
        .withColumn("revenue_fact",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_fact"), col("revenue_fact"), col("keysum_fact"),
          col("n_audit"), col("upserts_logged"), col("versions_ok"))
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $cat.fact_st")
      s.sql(s"DROP TABLE IF EXISTS $cat.audit_st"): Unit
    }
  }

  /** SQL64 — PERSISTENT VIEWS (round 15, VERDICT r14 ask #6):
    * `CREATE VIEW cat.v AS SELECT ...` against a graft catalog persists
    * the view (SQL text + schema + capture context) as a `.graftview`
    * file beside the table directories, through the DSv2 ViewCatalog
    * face with the parser-level SQL surface
    * ([[graft.sources.GraftViewSql]] — Spark 4.1 core still
    * session-routes view DDL, so graft intercepts like every lakehouse
    * format). Contract: an aggregate THROUGH the view the oracle
    * restates from orders; `SHOW VIEWS` lists it; and a SECOND catalog
    * instance pointed at the same base resolves the view from disk —
    * the restart-durability story (no session state involved). */
  def sql64PersistentViews(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql64", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_pv")
    s.sql(s"DROP VIEW IF EXISTS $cat.big_orders")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .createOrReplaceTempView("orders_src64")
    s.sql(s"CREATE TABLE $cat.orders_pv AS SELECT * FROM orders_src64")
    try {
      s.sql(s"CREATE VIEW $cat.big_orders AS " +
        s"SELECT o_orderkey, o_totalprice FROM $cat.orders_pv " +
        "WHERE o_orderkey % 10 = 0")
      // view reads go through SQL (the parser is the view-expansion
      // seam — spark.table() bypasses it, like every parser-level
      // lakehouse SQL surface)
      val r = s.sql(s"SELECT * FROM $cat.big_orders").agg(count(lit(1)),
        coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("o_orderkey")), lit(0L))).head()
      val shown = s.sql(s"SHOW VIEWS IN $cat").collect()
        .map(_.getString(1)).toSet
      // restart durability: a FRESH catalog instance over the same
      // base resolves the view from its file, no session state
      val base = Tables.scratchDir(s"sql64_cat", sfDir)
      s.conf.set(s"spark.sql.catalog.${cat}b",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.${cat}b.base", base)
      val n2 = s.sql(s"SELECT COUNT(*) FROM ${cat}b.big_orders")
        .head().getLong(0)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), shown.contains("big_orders"),
          n2 == r.getLong(0)))
        .toDF("n_rows", "keysum", "show_views_ok", "durable_ok")
        .withColumn("revenue",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("revenue"), col("keysum"),
          col("show_views_ok"), col("durable_ok"))
    } finally {
      s.sql(s"DROP VIEW IF EXISTS $cat.big_orders")
      s.sql(s"DROP TABLE IF EXISTS $cat.orders_pv"): Unit
    }
  }

  /** SQL62 — DELETION VECTORS / merge-on-read DELETE (round 15,
    * VERDICT r14 ask #4): on a table with `graft.dv.enabled = true`, a
    * small translatable DELETE records the matched ROW POSITIONS as
    * per-file sidecars ([[graft.sources.GraftDv]]) instead of
    * rewriting the affected files — `files_rewritten = 0`, write
    * amplification ∝ deleted rows — and every scan applies the
    * positions as a reader-side skip. Claims: the post-delete
    * aggregate the oracle restates from orders, plus engine booleans —
    * the data-file set is BIT-IDENTICAL across the delete (zero
    * rewrites), sidecars exist, time travel to the pre-delete version
    * still reads every row (DV state rides snapshots), and a
    * `CALL optimize` MATERIALIZES the DVs (sidecars folded in, values
    * unchanged, files rewritten). */
  def sql62DeletionVectors(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql62", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_dv")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartition(8)
      .createOrReplaceTempView("orders_src62")
    s.sql(s"CREATE TABLE $cat.orders_dv " +
      "TBLPROPERTIES ('graft.dv.enabled'='true') AS " +
      "SELECT * FROM orders_src62") // v1
    try {
      val dir = new java.io.File(
        s"${Tables.scratchDir("sql62_cat", sfDir)}/orders_dv")
      val files1 = graft.sources.GraftTxn.dataFiles(dir)
      val nAll = s.table(s"$cat.orders_dv").count()
      // a ~1.5% translatable slice → the DV path (ratio default 0.2)
      val maxKey = Tables.orders(s, sfDir)
        .agg(max(col("o_orderkey"))).head().getLong(0)
      val cut = maxKey / 64
      s.sql(s"DELETE FROM $cat.orders_dv WHERE o_orderkey <= $cut") // v2
      val noRewrite = graft.sources.GraftTxn.dataFiles(dir) == files1
      val dvPresent = graft.sources.GraftDv.hasDvs(dir)
      val r = s.table(s"$cat.orders_dv").agg(count(lit(1)),
        coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("o_orderkey")), lit(0L))).head()
      val ttOk = s.sql(s"SELECT COUNT(*) FROM $cat.orders_dv " +
        "VERSION AS OF 1").head().getLong(0) == nAll
      // OPTIMIZE materializes: sidecars gone, values stable, rewritten
      s.sql(s"CALL $cat.optimize('orders_dv', ${1L << 40})")
      val matOk = !graft.sources.GraftDv.hasDvs(dir) &&
        graft.sources.GraftTxn.dataFiles(dir) != files1
      val r2 = s.table(s"$cat.orders_dv").agg(count(lit(1)),
        coalesce(sum(col("o_orderkey")), lit(0L))).head()
      val stable = r2.getLong(0) == r.getLong(0) &&
        r2.getLong(1) == r.getLong(2)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), noRewrite && dvPresent, ttOk,
          matOk && stable))
        .toDF("n_rows", "keysum", "zero_rewrite_dv_ok",
          "time_travel_ok", "optimize_materializes_ok")
        .withColumn("revenue",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("revenue"), col("keysum"),
          col("zero_rewrite_dv_ok"), col("time_travel_ok"),
          col("optimize_materializes_ok"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.orders_dv"): Unit
  }

  /** SQL65 — MERGE-ON-READ UPDATE / MERGE via deletion vectors
    * (round 16, VERDICT r15 ask #1): on a `graft.dv.enabled` table,
    * UPDATE and MERGE route through Spark's SupportsDelta row-level
    * machinery ([[graft.sources.GraftDeltaRowLevelOperation]]) — the
    * old rows' POSITIONS land as DV sidecars and the new images
    * APPEND; ZERO existing files rewrite. Three composing DML:
    * UPDATE ×2 on a ~1.5% key slice, UPDATE +10 on half of it
    * (positions recorded against the previously APPENDED file —
    * cross-commit composition), and a MERGE matched-update (+1 on
    * `key % 97 = 0`). Claims: the fully-composed aggregate the oracle
    * restates from orders; the v2 CDF class counts (delete = insert =
    * matched keys, oracle-restated); `zero_rewrite_mor_ok` — every
    * pre-DML file still present bit-identical and sidecars exist; and
    * OPTIMIZE materializes with values stable. `graft.dv.maxRatio`
    * is 1.0 here — "never fold" — so the zero-rewrite claim holds at
    * EVERY SF (at sf0.001 the delta-appended files are ~1 row each
    * and the second update fully deletes some, which a fractional
    * guard would legitimately materialize; the default-0.2 guard
    * behavior is spec-pinned in Round16Spec instead). */
  def sql65DvUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql65", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_mor")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartition(8)
      .createOrReplaceTempView("orders_src65")
    s.sql(s"CREATE TABLE $cat.orders_mor " +
      "TBLPROPERTIES ('graft.dv.enabled'='true'," +
      "'graft.dv.maxRatio'='1.0','graft.cdf.enabled'='true') AS " +
      "SELECT * FROM orders_src65") // v1
    try {
      val dir = new java.io.File(
        s"${Tables.scratchDir("sql65_cat", sfDir)}/orders_mor")
      val files1 = graft.sources.GraftTxn.dataFiles(dir)
      // round 17 (guide §6): the max key comes from the input parquet's
      // exact INT64 footer stats (driver metadata, no scan job);
      // unusable stats fall back to the aggregate — same value
      val maxKey = GraphOps.footerMaxLong(
          new java.io.File(s"$sfDir/orders.parquet"), "o_orderkey")
        .getOrElse(Tables.orders(s, sfDir)
          .agg(max(col("o_orderkey"))).head().getLong(0))
      val cut = maxKey / 64
      val cut2 = cut / 2
      s.sql(s"UPDATE $cat.orders_mor SET o_totalprice = " +
        s"o_totalprice * 2 WHERE o_orderkey <= $cut") // v2
      s.sql(s"UPDATE $cat.orders_mor SET o_totalprice = " +
        s"o_totalprice + 10 WHERE o_orderkey <= $cut2") // v3
      Tables.orders(s, sfDir).select(col("o_orderkey").as("mk"))
        .filter(col("mk") % 97 === 0)
        .createOrReplaceTempView("merge_src65")
      s.sql(s"MERGE INTO $cat.orders_mor t USING merge_src65 src " +
        "ON t.o_orderkey = src.mk " +
        "WHEN MATCHED THEN UPDATE SET o_totalprice = " +
        "t.o_totalprice + 1") // v4
      val filesNow = graft.sources.GraftTxn.dataFiles(dir)
      val zeroRewrite = files1.subsetOf(filesNow) &&
        graft.sources.GraftDv.hasDvs(dir)
      // v2's CDF classes: delete(old image) + insert(new image), one
      // pair per matched key — counts the oracle restates
      val cdf = graft.sources.GraftCdf.rows(s, dir)
        .filter(col("_commit_version") === 2L)
        .groupBy(col("_change_type")).count().collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      val r = s.table(s"$cat.orders_mor").agg(count(lit(1)),
        coalesce(sum(col("o_totalprice").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("o_orderkey")), lit(0L))).head()
      // OPTIMIZE folds the DVs in: sidecars gone, values stable
      s.sql(s"CALL $cat.optimize('orders_mor', ${1L << 40})")
      val r2 = s.table(s"$cat.orders_mor").agg(count(lit(1)),
        coalesce(sum(col("o_orderkey")), lit(0L))).head()
      val matOk = !graft.sources.GraftDv.hasDvs(dir) &&
        r2.getLong(0) == r.getLong(0) && r2.getLong(1) == r.getLong(2)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2),
          cdf.getOrElse("delete", 0L), cdf.getOrElse("insert", 0L),
          zeroRewrite, matOk))
        .toDF("n_rows", "keysum", "cdf_del_n", "cdf_ins_n",
          "zero_rewrite_mor_ok", "optimize_materializes_ok")
        .withColumn("revenue",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("revenue"), col("keysum"),
          col("cdf_del_n"), col("cdf_ins_n"),
          col("zero_rewrite_mor_ok"), col("optimize_materializes_ok"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.orders_mor"): Unit
  }

  /** SQL66 — PARTITION-SPEC EVOLUTION (round 16, VERDICT r15 ask #2 —
    * the Iceberg spec-id analog): an UNPARTITIONED events table takes
    * `CALL cat.evolve_partitions('events_se', 'days(ets)')` as a
    * metadata-only commit ([[graft.sources.GraftPartitions.evolveSpec]]
    * — spec history line + new spec, nothing moves), then keeps
    * writing: pre-evolution files stay FLAT at the table root
    * (range-disjoint on ets via repartitionByRange, so the stats
    * LEDGER prunes them), post-evolution inserts land hidden
    * `ets_day=<d>/` dirs (path-pruned). One 7-day-window aggregate
    * then scans BOTH layouts and the skipping scan prunes EACH FILE
    * under its own layout's evidence — claims pin kept < listed, all
    * non-qualifying day dirs pruned, and the old flat files
    * range-pruned to the ledger bound. Time travel across the
    * evolution boundary reads the pre-evolution row set. */
  def sql66SpecEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql66", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.events_se")
    s.sql(s"CREATE TABLE $cat.events_se " +
      "(event_id BIGINT, ets TIMESTAMP, user_id BIGINT, value DOUBLE)")
    Tables.eventsUs(s, sfDir)
      .selectExpr("event_id", "timestamp_micros(ts) AS ets", "user_id",
        "value")
      .createOrReplaceTempView("events_src66")
    // pre-evolution half: flat files, range-disjoint on ets so the
    // ledger can prune them
    s.table("events_src66").filter(col("event_id") % 2 === 0)
      .repartitionByRange(8, col("ets"))
      .createOrReplaceTempView("events_src66_even")
    s.sql(s"INSERT INTO $cat.events_se SELECT * FROM events_src66_even")
    try {
      val dir = new java.io.File(
        s"${Tables.scratchDir("sql66_cat", sfDir)}/events_se")
      val vPre = graft.sources.GraftTxn.version(dir)
      val nPre = s.table(s"$cat.events_se").count()
      val sid = s.sql(s"CALL $cat.evolve_partitions('events_se', " +
        "'days(ets)')").head().getLong(0)
      s.sql(s"INSERT INTO $cat.events_se SELECT * FROM events_src66 " +
        "WHERE event_id % 2 = 1")
      val files = graft.sources.GraftTxn.dataFiles(dir)
      val (oldFiles, newFiles) = files.partition(!_.contains("/"))
      val layoutOk = oldFiles.nonEmpty && newFiles.nonEmpty &&
        newFiles.forall(_.matches("ets_day=\\d+/.*")) && sid == 1L
      val loDay = java.time.LocalDate.of(2024, 1, 8).toEpochDay
      val qualifyingNew = newFiles.count { f =>
        f.split("=")(1).split("/")(0).toLongOption
          .exists(d => d >= loDay && d < loDay + 7)
      }
      val r = s.table(s"$cat.events_se")
        .filter(col("ets") >= lit("2024-01-08 00:00:00").cast("timestamp")
          && col("ets") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .agg(count(lit(1)),
          coalesce(sum(col("value").cast(graft.Det.Money)),
            lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
          coalesce(sum(col("event_id")), lit(0L))).head()
      val (listed, kept) = graft.sources.GraftStats.lastReport(
        dir.getAbsolutePath)
      // day dirs prune exactly; the flat half range-prunes to the
      // ledger bound (sampled range boundaries: a 7-day window can
      // span up to ~3 of 8 range-files plus boundary slack — the
      // claim is kept < listed AND old kept ≤ half the old files)
      val oldKept = kept - qualifyingNew
      val prunedOk = listed == files.size && kept < listed &&
        oldKept <= oldFiles.size / 2
      val ttOk = s.sql(s"SELECT COUNT(*) FROM $cat.events_se " +
        s"VERSION AS OF $vPre").head().getLong(0) == nPre
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), layoutOk, prunedOk, ttOk))
        .toDF("n_rows", "keysum", "layout_ok", "pruned_both_ok",
          "time_travel_ok")
        .withColumn("value_sum",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_rows"), col("value_sum"), col("keysum"),
          col("layout_ok"), col("pruned_both_ok"), col("time_travel_ok"))
    } finally s.sql(s"DROP TABLE IF EXISTS $cat.events_se"): Unit
  }

  /** SQL68 — SESSION TRANSACTIONS: `BEGIN; <DML…>; COMMIT` (round 16,
    * VERDICT r15 ask #5): sql63's fact-upsert + audit-append scenario
    * as a plain STATEMENT SEQUENCE — no CALL, no views-as-arguments.
    * Between BEGIN and COMMIT every DML (MERGE / UPDATE / DELETE /
    * INSERT) parser-redirects to a hard-linked SHADOW clone
    * ([[graft.sources.GraftSessionTxn]]), so the full row-level
    * machinery runs per statement with READ-YOUR-WRITES while the
    * live tables stay untouched; COMMIT lands everything as ONE
    * [[graft.sources.GraftMultiTxn]] commit (BEGIN-version validated —
    * first committer wins), ROLLBACK discards. Claims: sql63's upsert
    * algebra restated from orders, mid-txn live-version and
    * read-your-writes booleans, post-commit versions, and a
    * rollback-discards boolean. */
  def sql68SessionTxn(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql68", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.fact_tx")
    s.sql(s"DROP TABLE IF EXISTS $cat.audit_tx")
    Tables.orders(s, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .createOrReplaceTempView("orders_src68")
    s.sql(s"CREATE TABLE $cat.fact_tx AS SELECT o_orderkey AS k, " +
      "o_totalprice AS p FROM orders_src68 WHERE o_orderkey <= 2000") // v1
    s.sql(s"CREATE TABLE $cat.audit_tx (batch_id BIGINT, n_upserts BIGINT)")
    try {
      val dirF = new java.io.File(
        s"${Tables.scratchDir("sql68_cat", sfDir)}/fact_tx")
      val dirA = new java.io.File(
        s"${Tables.scratchDir("sql68_cat", sfDir)}/audit_tx")
      s.sql("CREATE OR REPLACE TEMP VIEW v68_upserts AS " +
        "SELECT o_orderkey AS k, o_totalprice * 2 AS p " +
        "FROM orders_src68 WHERE o_orderkey > 1000 AND o_orderkey <= 3000")
      val nUp = s.table("v68_upserts").count()
      val preSum = s.table(s"$cat.fact_tx")
        .agg(sum(col("p").cast(graft.Det.Money))).head().getDecimal(0)
      s.sql("BEGIN")
      s.sql(s"MERGE INTO $cat.fact_tx t USING v68_upserts u ON t.k = u.k " +
        "WHEN MATCHED THEN UPDATE SET p = u.p " +
        "WHEN NOT MATCHED THEN INSERT *")
      s.sql(s"INSERT INTO $cat.audit_tx VALUES (1, $nUp)")
      // read-your-writes mid-txn (the merge doubled >1000 keys'
      // prices, so the visible sum MOVES at every SF) while the LIVE
      // tables stay at their pre-txn versions
      val midSum = s.sql(s"SELECT CAST(SUM(CAST(p AS " +
        s"${graft.Det.Money.sql})) AS ${graft.Det.Money.sql}) " +
        s"FROM $cat.fact_tx").head().getDecimal(0)
      val rywOk = midSum.compareTo(preSum) > 0 &&
        graft.sources.GraftTxn.version(dirF) == 1L &&
        graft.sources.GraftTxn.version(dirA) == 0L
      s.sql("COMMIT")
      val versionsOk = graft.sources.GraftTxn.version(dirF) == 2L &&
        graft.sources.GraftTxn.version(dirA) == 1L
      // a second transaction rolls back without a trace
      s.sql("BEGIN")
      s.sql(s"DELETE FROM $cat.fact_tx WHERE k > 0")
      s.sql(s"UPDATE $cat.audit_tx SET n_upserts = -1 WHERE batch_id = 1")
      s.sql("ROLLBACK")
      val r = s.table(s"$cat.fact_tx").agg(count(lit(1)),
        coalesce(sum(col("p").cast(graft.Det.Money)),
          lit(java.math.BigDecimal.ZERO).cast(graft.Det.Money)),
        coalesce(sum(col("k")), lit(0L))).head()
      val a = s.table(s"$cat.audit_tx").head()
      val rollbackOk = graft.sources.GraftTxn.version(dirF) == 2L &&
        a.getLong(1) == nUp
      import s.implicits._
      Seq((r.getLong(0), r.getLong(2), a.getLong(0), a.getLong(1),
          rywOk, versionsOk, rollbackOk))
        .toDF("n_fact", "ksum", "batch_id", "n_upserts",
          "ryw_ok", "versions_ok", "rollback_ok")
        .withColumn("fact_sum",
          lit(r.getDecimal(1)).cast(graft.Det.Money).cast("double"))
        .select(col("n_fact"), col("fact_sum"), col("ksum"),
          col("batch_id"), col("n_upserts"), col("ryw_ok"),
          col("versions_ok"), col("rollback_ok"))
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $cat.fact_tx")
      s.sql(s"DROP TABLE IF EXISTS $cat.audit_tx"): Unit
    }
  }

  /** SQL67 — MATERIALIZED VIEW + INCREMENTAL CDF REFRESH (round 16,
    * VERDICT r15 ask #4): `CREATE MATERIALIZED VIEW cat.omv AS SELECT
    * status, count(*), sum(price) FROM cat.base WHERE k%2=0 GROUP BY
    * status` materializes once as a REAL graft table
    * ([[graft.sources.GraftMv]]); after an UPDATE + DELETE + INSERT on
    * the base, `CALL cat.refresh_mv('omv')` applies ONLY the three
    * commits' CDF row images through the x113 retraction algebra
    * (insert = +1, delete = −1; counts and sums add; dead groups
    * drop) — the base is never rescanned. Claims: the refreshed
    * per-group rows (the oracle restates them from orders by replaying
    * the same DML algebra), `incremental_ok` — refreshed ≡ a full
    * recompute AND the delta row count the refresh reported is a small
    * fraction of the base (rows_scanned ∝ delta, engine-verified) —
    * and `idempotent_ok` — a second refresh applies 0 versions. */
  def sql67MatviewRefresh(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val cat = Tables.graftCatalog(s, "sql67", sfDir)
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_mvb")
    try s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $cat.omv")
    catch { case _: Exception => () }
    Tables.orders(s, sfDir)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        // decimal from the start: the retraction algebra's sums must
        // be exact or refresh-vs-recompute diverges in the last ulp
        col("o_totalprice").cast(graft.Det.Money).as("p"))
      .createOrReplaceTempView("orders_src67")
    s.sql(s"CREATE TABLE $cat.orders_mvb TBLPROPERTIES " +
      "('graft.cdf.enabled'='true') AS SELECT * FROM orders_src67") // v1
    try {
      s.sql(s"CREATE MATERIALIZED VIEW $cat.omv AS " +
        s"SELECT st, count(*) AS n_orders, sum(p) AS total " +
        s"FROM $cat.orders_mvb WHERE k % 2 = 0 GROUP BY st")
      val maxKey = Tables.orders(s, sfDir)
        .agg(max(col("o_orderkey"))).head().getLong(0)
      s.sql(s"UPDATE $cat.orders_mvb SET p = p + 100 WHERE k % 7 = 0")
      s.sql(s"DELETE FROM $cat.orders_mvb WHERE k % 11 = 0")
      s.sql(s"INSERT INTO $cat.orders_mvb " +
        s"SELECT k + $maxKey, st, p FROM orders_src67 WHERE k % 13 = 0")
      val nBase = s.table(s"$cat.orders_mvb").count()
      val r = s.sql(s"CALL $cat.refresh_mv('omv')").head()
      val refreshed = s.table(s"$cat.omv")
      val recomputed = s.sql(s"SELECT st, count(*) AS n_orders, " +
        s"sum(p) AS total FROM $cat.orders_mvb WHERE k % 2 = 0 " +
        "GROUP BY st")
      // round 16 optimization: both exceptAll directions in ONE
      // symmetric-diff job (±1 count aggregation — the plan Spark
      // lowers exceptAll to anyway); empty ⇔ both exceptAlls empty
      val symDiffEmpty = refreshed.withColumn("__side", lit(1L))
        .unionByName(recomputed.withColumn("__side", lit(-1L)))
        .groupBy(refreshed.columns.map(col).toSeq: _*)
        .agg(sum(col("__side")).as("__d")).filter(col("__d") =!= 0L)
        .isEmpty
      val incrementalOk = symDiffEmpty &&
        r.getLong(0) == 3L && r.getLong(1) > 0L &&
        r.getLong(1) < nBase / 2
      val r2 = s.sql(s"CALL $cat.refresh_mv('omv')").head()
      val idempotentOk = r2.getLong(0) == 0L && r2.getLong(1) == 0L
      refreshed
        .select(col("st"), col("n_orders"),
          col("total").cast(graft.Det.Money).cast("double").as("total"))
        .withColumn("incremental_ok", lit(incrementalOk))
        .withColumn("idempotent_ok", lit(idempotentOk))
        .orderBy(col("st"))
        .localCheckpoint(true)
    } finally {
      try s.sql(s"DROP MATERIALIZED VIEW IF EXISTS $cat.omv")
      catch { case _: Exception => () }
      s.sql(s"DROP TABLE IF EXISTS $cat.orders_mvb"): Unit
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql67_matview_refresh" -> (sql67MatviewRefresh _),
    "sql68_session_txn" -> (sql68SessionTxn _),
    "sql66_spec_evolution" -> (sql66SpecEvolution _),
    "sql65_dv_update" -> (sql65DvUpdate _),
    "sql62_deletion_vectors" -> (sql62DeletionVectors _),
    "sql64_persistent_views" -> (sql64PersistentViews _),
    "sql63_sql_txn_face" -> (sql63SqlTxnFace _),
    "sql61_transform_partitions" -> (sql61TransformPartitions _),
    "sql60_file_skipping" -> (sql60FileSkipping _),
    "sql59_metadata_tables" -> (sql59MetadataTables _),
    "sql57_multi_table_txn" -> (sql57MultiTableTxn _),
    "sql58_check_constraints" -> (sql58CheckConstraints _),
    "sql56_partitioned_table" -> (sql56PartitionedTable _),
    "sql55_call_procedures" -> (sql55CallProcedures _),
    "x183_clustered_optimize" -> (x183ClusteredOptimize _),
    "sql53_restore" -> (sql53Restore _),
    "sql54_schema_evolution" -> (sql54SchemaEvolution _),
    "x182_compact_partitions" -> (x182CompactPartitions _),
    "sql52_time_travel" -> (sql52TimeTravel _),
    "x181_compact_table" -> (x181CompactTable _),
    "x180_version_diff" -> (x180VersionDiff _),
    "sql42_catalog_ddl" -> (sql42CatalogDdl _),
    "sql43_insert_dml" -> (sql43InsertDml _),
    "sql44_ctas" -> (sql44Ctas _),
    "sql45_row_level_sql" -> (sql45RowLevelSql _),
    "sql46_update_merge" -> (sql46UpdateMerge _),
    "sql51_merge_by_source" -> (sql51MergeBySource _))

  val oracles: Map[String, String] = Map(
    // the fully-composed merge-on-read UPDATE/MERGE algebra restated
    // from orders: ×2 below floor(max/64), +10 below half of that,
    // +1 on key % 97 = 0; CDF v2 counts = the first update's matched
    // keys; the zero-rewrite / materialize effects are engine booleans
    "sql65_dv_update" ->
      ("WITH cuts AS (SELECT CAST(FLOOR(MAX(o_orderkey) / 64.0) AS " +
       "BIGINT) AS cut, CAST(FLOOR(MAX(o_orderkey) / 128.0) AS BIGINT)" +
       " AS cut2 FROM orders), " +
       "t AS (SELECT o_orderkey, " +
       "CAST(CASE WHEN o_orderkey <= (SELECT cut FROM cuts) " +
       "THEN o_totalprice * 2 ELSE o_totalprice END " +
       "+ CASE WHEN o_orderkey <= (SELECT cut2 FROM cuts) " +
       "THEN 10 ELSE 0 END " +
       "+ CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END " +
       "AS DECIMAL(18,4)) AS p FROM orders) " +
       "SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(p) FROM t) AS DECIMAL(18,4)) AS DOUBLE)" +
       " AS revenue, " +
       "CAST((SELECT SUM(o_orderkey) FROM t) AS BIGINT) AS keysum, " +
       "CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey <= " +
       "(SELECT cut FROM cuts)) AS BIGINT) AS cdf_del_n, " +
       "CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey <= " +
       "(SELECT cut FROM cuts)) AS BIGINT) AS cdf_ins_n, " +
       "TRUE AS zero_rewrite_mor_ok, " +
       "TRUE AS optimize_materializes_ok"),
    // the post-DV-delete aggregate restated from orders with the same
    // floor(max/64) threshold; the zero-rewrite / time-travel /
    // materialize effects are engine booleans
    "sql62_deletion_vectors" ->
      ("WITH t AS (SELECT * FROM orders WHERE o_orderkey > " +
       "(SELECT CAST(FLOOR(MAX(o_orderkey) / 64.0) AS BIGINT) " +
       "FROM orders)) " +
       "SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) " +
       "FROM t) AS DECIMAL(18,4)) AS DOUBLE) AS revenue, " +
       "CAST((SELECT SUM(o_orderkey) FROM t) AS BIGINT) AS keysum, " +
       "TRUE AS zero_rewrite_dv_ok, TRUE AS time_travel_ok, " +
       "TRUE AS optimize_materializes_ok"),
    // the aggregate THROUGH the persisted view restated from orders
    // with the view's own predicate; SHOW VIEWS and the fresh-catalog
    // re-resolution are engine booleans
    "sql64_persistent_views" ->
      ("WITH t AS (SELECT * FROM orders WHERE o_orderkey % 10 = 0) " +
       "SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) " +
       "FROM t) AS DECIMAL(18,4)) AS DOUBLE) AS revenue, " +
       "CAST((SELECT SUM(o_orderkey) FROM t) AS BIGINT) AS keysum, " +
       "TRUE AS show_views_ok, TRUE AS durable_ok"),
    // same upsert algebra as sql57 (matched (1000,2000] keys at 2x,
    // (2000,3000] inserts at 2x, ≤1000 pass through), reached through
    // the SQL CALL face; versions are engine booleans
    // the refreshed MV's per-group rows restated from orders by
    // replaying the same UPDATE/DELETE/INSERT algebra and grouping;
    // the incremental / idempotent effects are engine booleans
    "sql67_matview_refresh" ->
      ("WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st, " +
       "o_totalprice AS p FROM orders), " +
       "u AS (SELECT k, st, CASE WHEN k % 7 = 0 THEN p + 100 ELSE p " +
       "END AS p FROM b), " +
       "d AS (SELECT * FROM u WHERE k % 11 <> 0), " +
       "f AS (SELECT * FROM d UNION ALL SELECT " +
       "k + (SELECT MAX(k) FROM b), st, p FROM b WHERE k % 13 = 0), " +
       "t AS (SELECT * FROM f WHERE k % 2 = 0) " +
       "SELECT st, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
       "CAST(CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DECIMAL(18,4)) " +
       "AS DOUBLE) AS total, " +
       "TRUE AS incremental_ok, TRUE AS idempotent_ok " +
       "FROM t GROUP BY st ORDER BY st"),
    // sql63's algebra again, reached through BEGIN/COMMIT statement
    // sequencing; ryw / versions / rollback effects are engine booleans
    "sql68_session_txn" ->
      ("WITH t AS (SELECT o_orderkey AS k, " +
       "CASE WHEN o_orderkey > 1000 THEN o_totalprice * 2 " +
       "ELSE o_totalprice END AS p FROM orders WHERE o_orderkey <= 2000 " +
       "UNION ALL SELECT o_orderkey, o_totalprice * 2 FROM orders " +
       "WHERE o_orderkey > 2000 AND o_orderkey <= 3000) " +
       "SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_fact, " +
       "CAST(CAST((SELECT SUM(CAST(p AS DECIMAL(18,4))) FROM t) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS fact_sum, " +
       "CAST((SELECT SUM(k) FROM t) AS BIGINT) AS ksum, " +
       "CAST(1 AS BIGINT) AS batch_id, " +
       "CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey > 1000 " +
       "AND o_orderkey <= 3000) AS BIGINT) AS n_upserts, " +
       "TRUE AS ryw_ok, TRUE AS versions_ok, TRUE AS rollback_ok"),
    "sql63_sql_txn_face" ->
      ("WITH t AS (SELECT o_orderkey AS k, " +
       "CASE WHEN o_orderkey > 1000 THEN o_totalprice * 2 " +
       "ELSE o_totalprice END AS p FROM orders WHERE o_orderkey <= 2000 " +
       "UNION ALL SELECT o_orderkey, o_totalprice * 2 FROM orders " +
       "WHERE o_orderkey > 2000 AND o_orderkey <= 3000) " +
       "SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_fact, " +
       "CAST(CAST((SELECT SUM(CAST(p AS DECIMAL(18,4))) FROM t) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS revenue_fact, " +
       "CAST((SELECT SUM(k) FROM t) AS BIGINT) AS keysum_fact, " +
       "CAST(1 AS BIGINT) AS n_audit, " +
       "CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey > 1000 " +
       "AND o_orderkey <= 3000) AS BIGINT) AS upserts_logged, " +
       "TRUE AS versions_ok"),
    // the 7-day window aggregate restated from events (DuckDB reads the
    // same parquet at µs grain — the eventsUs truncation contract);
    // layout/hidden/pruning are engine booleans
    // the same 7-day window aggregate as sql61 (BOTH halves are in
    // the evolved table); layout / dual-layout pruning / time travel
    // across the evolution boundary are engine booleans
    "sql66_spec_evolution" ->
      ("WITH t AS (SELECT * FROM events WHERE ts >= TIMESTAMP " +
       "'2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00') " +
       "SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(value AS DECIMAL(18,4))) FROM t) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS value_sum, " +
       "CAST((SELECT SUM(event_id) FROM t) AS BIGINT) AS keysum, " +
       "TRUE AS layout_ok, TRUE AS pruned_both_ok, " +
       "TRUE AS time_travel_ok"),
    "sql61_transform_partitions" ->
      ("WITH t AS (SELECT * FROM events WHERE ts >= TIMESTAMP " +
       "'2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00') " +
       "SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(value AS DECIMAL(18,4))) FROM t) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS value_sum, " +
       "CAST((SELECT SUM(event_id) FROM t) AS BIGINT) AS keysum, " +
       "TRUE AS layout_ok, TRUE AS hidden_ok, TRUE AS pruned_scan_ok"),
    // the bottom-1/8-of-keyspace aggregate restated from orders with
    // the same floor(max/8) threshold arithmetic; file counts and
    // pruning effects are engine booleans
    "sql60_file_skipping" ->
      ("WITH t AS (SELECT * FROM orders WHERE o_orderkey <= " +
       "(SELECT CAST(FLOOR(MAX(o_orderkey) / 8.0) AS BIGINT) FROM orders)) " +
       "SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) FROM t) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS revenue, " +
       "CAST((SELECT SUM(o_orderkey) FROM t) AS BIGINT) AS keysum, " +
       "CAST(8 AS BIGINT) AS files_listed, " +
       "TRUE AS pruned_scan_ok, TRUE AS optimize_keeps_pruning, " +
       "TRUE AS stable_after_optimize"),
    // the metadata relations' counts are history constants (3 commits,
    // snapshots v0..v2); the data-derived claim restates from orders;
    // filesystem cross-checks are engine booleans
    "sql59_metadata_tables" ->
      ("SELECT CAST((SELECT COUNT(*) FROM orders) + 2 AS BIGINT) " +
       "AS n_rows, " +
       "CAST(3 AS BIGINT) AS n_commits, " +
       "CAST(3 AS BIGINT) AS max_version, " +
       "CAST(3 AS BIGINT) AS n_snapshots, " +
       "TRUE AS files_ok, TRUE AS partitions_ok"),
    // post-txn fact state = the upsert algebra over orders (matched
    // (1000,2000] keys take 2x price, (2000,3000] insert at 2x, ≤1000
    // pass through); audit = one row logging the batch size; versions
    // are engine booleans
    "sql57_multi_table_txn" ->
      ("WITH t AS (SELECT o_orderkey AS k, " +
       "CASE WHEN o_orderkey > 1000 THEN o_totalprice * 2 " +
       "ELSE o_totalprice END AS p FROM orders WHERE o_orderkey <= 2000 " +
       "UNION ALL SELECT o_orderkey, o_totalprice * 2 FROM orders " +
       "WHERE o_orderkey > 2000 AND o_orderkey <= 3000) " +
       "SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_fact, " +
       "CAST(CAST((SELECT SUM(CAST(p AS DECIMAL(18,4))) FROM t) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS revenue_fact, " +
       "CAST((SELECT SUM(k) FROM t) AS BIGINT) AS keysum_fact, " +
       "CAST(1 AS BIGINT) AS n_audit, " +
       "CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey > 1000 " +
       "AND o_orderkey <= 3000) AS BIGINT) AS upserts_logged, " +
       "TRUE AS versions_ok"),
    // every mutating statement after the seed was REJECTED, so the
    // final state is exactly the seed projection of orders; the
    // violation counts/booleans are engine-extracted from the
    // rejections (1 violating row in the planted insert)
    "sql58_check_constraints" ->
      ("SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) " +
       "FROM orders) AS DECIMAL(18,4)) AS DOUBLE) AS revenue, " +
       "CAST((SELECT SUM(o_orderkey) FROM orders) AS BIGINT) AS keysum, " +
       "CAST(1 AS BIGINT) AS insert_violation_rows, " +
       "TRUE AS update_rejected, TRUE AS null_insert_rejected, " +
       "TRUE AS rejections_atomic"),
    // final state restated from orders: the pbucket=3 slice carries 2x
    // price (same IEEE multiply both engines, then the Det decimal
    // cast), plus the two inserted pbucket=1 rows (11.0 + 13.0);
    // layout/pruning/time-travel are engine-verified booleans
    "sql56_partitioned_table" ->
      ("SELECT CAST((SELECT COUNT(*) FROM orders) + 2 AS BIGINT) " +
       "AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(CASE WHEN o_custkey % 4 = 3 " +
       "THEN o_totalprice * 2 ELSE o_totalprice END AS DECIMAL(18,4))) " +
       "FROM orders) + CAST(24.0 AS DECIMAL(18,4)) AS DECIMAL(18,4)) " +
       "AS DOUBLE) AS revenue, " +
       "CAST((SELECT SUM(o_orderkey) FROM orders) + 9000001 + 9000002 " +
       "AS BIGINT) AS keysum, " +
       "CAST((SELECT COUNT(*) FROM orders WHERE o_custkey % 4 = 1) + 2 " +
       "AS BIGINT) AS n_p1, " +
       "TRUE AS pruned_scan_ok, TRUE AS layout_ok, " +
       "TRUE AS time_travel_ok"),
    // restore-to-v1 makes the final state the plain CTAS projection:
    // every data claim recomputes from orders; the SQL-face effects
    // (restore version, packing, history depth, vacuum) are booleans/
    // counts the engine pins
    "sql55_call_procedures" ->
      ("SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) " +
       "FROM orders) AS DECIMAL(18,4)) AS DOUBLE) AS revenue, " +
       "CAST((SELECT SUM(o_orderkey) FROM orders) AS BIGINT) AS keysum, " +
       "TRUE AS restored_as_v4, TRUE AS packed_8_to_1, " +
       "CAST(5 AS BIGINT) AS n_commits, TRUE AS vacuumed"),
    // value-neutral clustered maintenance: data claims recompute from
    // orders; layout claims (packed, z-disjoint files, history) are
    // engine-verified booleans
    "x183_clustered_optimize" ->
      ("SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) " +
       "FROM orders) AS DECIMAL(18,4)) AS DOUBLE) AS revenue, " +
       "CAST((SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT) " +
       "AS n_keys, TRUE AS packed, TRUE AS z_disjoint, " +
       "TRUE AS pre_version_equal"),
    // restored state == the CTAS projection (v1); the still-readable
    // v3 = v2 (+1000 on k%5=0) minus k%3=0
    "sql53_restore" ->
      ("WITH t1 AS (SELECT n_nationkey AS k, " +
       "CAST(n_nationkey * 10 AS BIGINT) AS v FROM nation), " +
       "t3 AS (SELECT k, CASE WHEN k % 5 = 0 THEN v + 1000 ELSE v END " +
       "AS v FROM t1 WHERE k % 3 <> 0) " +
       "SELECT CAST((SELECT COUNT(*) FROM t1) AS BIGINT) " +
       "AS n_after_restore, " +
       "CAST((SELECT SUM(k) FROM t1) AS BIGINT) AS ksum_after_restore, " +
       "CAST((SELECT SUM(v) FROM t1) AS BIGINT) AS vsum_after_restore, " +
       "CAST((SELECT COUNT(*) FROM t3) AS BIGINT) AS n_v3, " +
       "CAST((SELECT SUM(v) FROM t3) AS BIGINT) AS vsum_v3, " +
       "TRUE AS restored_as_v4"),
    // post-backfill state: every seed row tagged 'legacy', the two
    // inserted rows 'fresh'; widths/rename are booleans the engine
    // pins; n_label_legacy re-proves the legacy rows read under the
    // RENAMED column (field-id resolution over pre-rename files)
    "sql54_schema_evolution" ->
      ("SELECT CAST((SELECT COUNT(*) FROM nation) + 2 AS BIGINT) " +
       "AS n_total, " +
       "CAST((SELECT COUNT(*) FROM nation) AS BIGINT) " +
       "AS n_nulls_after_alter, " +
       "CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_legacy, " +
       "CAST(2 AS BIGINT) AS n_fresh, " +
       "CAST((SELECT SUM(n_nationkey) FROM nation) + 900 + 901 " +
       "AS BIGINT) AS ksum_total, " +
       "TRUE AS schema_widths_ok, " +
       "CAST((SELECT COUNT(*) FROM nation) AS BIGINT) " +
       "AS n_label_legacy, " +
       "TRUE AS rename_ok, " +
       // post-widen: one BIGINT-only key appended across mixed files
       "CAST((SELECT COUNT(*) FROM nation) + 3 AS BIGINT) AS n_total_w, " +
       "CAST((SELECT SUM(n_nationkey) FROM nation) + 900 + 901 " +
       "+ 5000000000 AS BIGINT) AS ksum_w, " +
       "TRUE AS widen_ok"),
    // value-neutral maintenance over the partitioned copy: every
    // claim recomputes from orders; layout claims are booleans
    "x182_compact_partitions" ->
      ("SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) " +
       "FROM orders) AS DECIMAL(18,4)) AS DOUBLE) AS revenue, " +
       "CAST((SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT) " +
       "AS n_keys, TRUE AS packed, TRUE AS untouched_identical"),
    // value-neutral maintenance: every claim recomputes from orders
    "x181_compact_table" ->
      ("SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows, " +
       "CAST(CAST((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) " +
       "FROM orders) AS DECIMAL(18,4)) AS DOUBLE) AS revenue, " +
       "CAST((SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT) " +
       "AS n_keys, TRUE AS compacted, TRUE AS pre_version_equal"),
    // the diff classes restated over the base table: DELETE (k%3=0)
    // wins over the earlier UPDATE (k%5=0) because the deleted key is
    // absent from v3 regardless of interim changes
    "x180_version_diff" ->
      ("WITH d AS (SELECT n_nationkey AS k, " +
       "CASE WHEN n_nationkey % 3 = 0 THEN 'deleted' " +
       "WHEN n_nationkey % 5 = 0 THEN 'changed' " +
       "ELSE 'unchanged' END AS change_type FROM nation) " +
       "SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_keys, " +
       "CAST(SUM(k) AS BIGINT) AS ksum FROM d " +
       "GROUP BY change_type ORDER BY change_type"),
    // per-version state algebra over the base table: v1 = the CTAS
    // projection, v2 = +1000 on k%5=0, v3 = v2 minus k%3=0
    "sql52_time_travel" ->
      ("WITH t1 AS (SELECT n_nationkey AS k, " +
       "CAST(n_nationkey * 10 AS BIGINT) AS v FROM nation), " +
       "t2 AS (SELECT k, CASE WHEN k % 5 = 0 THEN v + 1000 ELSE v END " +
       "AS v FROM t1), " +
       "t3 AS (SELECT * FROM t2 WHERE k % 3 <> 0) " +
       "SELECT CAST(0 AS BIGINT) AS n_v0, " +
       "CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_v1, " +
       "CAST((SELECT SUM(k) FROM t1) AS BIGINT) AS ksum_v1, " +
       "CAST((SELECT SUM(v) FROM t1) AS BIGINT) AS vsum_v1, " +
       "CAST((SELECT COUNT(*) FROM t2) AS BIGINT) AS n_v2, " +
       "CAST((SELECT SUM(v) FROM t2) AS BIGINT) AS vsum_v2, " +
       "CAST((SELECT COUNT(*) FROM t3) AS BIGINT) AS n_v3, " +
       "CAST((SELECT SUM(k) FROM t3) AS BIGINT) AS ksum_v3, " +
       "CAST((SELECT SUM(v) FROM t3) AS BIGINT) AS vsum_v3, " +
       "TRUE AS current_is_v3"),
    // post-statement state algebra over the base table: matched keys
    // (<= 1000) take 1.5x price, unmatched-by-source even-custkey rows
    // delete, unmatched odd-custkey rows pass through untouched
    "sql51_merge_by_source" ->
      ("WITH t1 AS (SELECT o_orderkey AS k, o_custkey AS c, " +
       "CASE WHEN o_orderkey <= 1000 THEN o_totalprice * 1.5 " +
       "ELSE o_totalprice END AS p FROM orders " +
       "WHERE o_orderkey <= 2000 " +
       "AND NOT (o_orderkey > 1000 AND o_custkey % 2 = 0)) " +
       "SELECT CAST((SELECT COUNT(*) FROM t1) AS BIGINT) " +
       "AS n_after_merge, " +
       "CAST(CAST((SELECT SUM(CAST(p AS DECIMAL(18,4))) FROM t1) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS price_after_merge, " +
       "CAST((SELECT SUM(c) FROM t1) AS BIGINT) " +
       "AS custkeysum_after_merge"),
    // listing claims + the round-tripped count off the base table
    "sql42_catalog_ddl" ->
      ("SELECT TRUE AS db_listed, TRUE AS table_listed, " +
       "CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_rows, " +
       "TRUE AS roundtrip_ok"),
    // recompute every post-statement claim from the base table
    "sql43_insert_dml" ->
      ("SELECT CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS after_seed, " +
       "CAST((SELECT COUNT(*) FROM nation) + 2 AS BIGINT) AS after_values, " +
       "CAST((SELECT COUNT(*) FROM nation) + 2 + " +
       "(SELECT COUNT(*) FROM nation WHERE n_regionkey < 2) AS BIGINT) " +
       "AS after_insert_select, " +
       "CAST((SELECT SUM(n_nationkey) FROM nation) + 900 + 901 + " +
       "(SELECT SUM(n_nationkey + 1000) FROM nation WHERE n_regionkey < 2) " +
       "AS BIGINT) AS keysum_after_appends, " +
       "CAST((SELECT COUNT(*) FROM nation WHERE n_regionkey IN (0, 1)) " +
       "AS BIGINT) AS after_overwrite, " +
       "CAST((SELECT SUM(n_nationkey) FROM nation WHERE n_regionkey IN (0, 1)) " +
       "AS BIGINT) AS keysum_after_overwrite"),
    "sql44_ctas" ->
      ("SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
       "FROM orders JOIN customer ON o_custkey = c_custkey " +
       "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "sql45_row_level_sql" ->
      ("SELECT CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_created, " +
       "CAST((SELECT COUNT(*) FROM nation WHERE n_regionkey <> 0) " +
       "AS BIGINT) AS after_delete_eq, " +
       "CAST((SELECT COUNT(*) FROM nation WHERE n_regionkey <> 0 " +
       "AND NOT (n_nationkey > 15 AND n_regionkey <> 3)) AS BIGINT) " +
       "AS after_delete_compound, " +
       "CAST((SELECT COALESCE(SUM(n_nationkey), 0) FROM nation " +
       "WHERE n_regionkey <> 0 " +
       "AND NOT (n_nationkey > 15 AND n_regionkey <> 3)) AS BIGINT) " +
       "AS keysum_surviving, " +
       "CAST((SELECT COUNT(*) FROM nation WHERE n_regionkey = 2) " +
       "AS BIGINT) AS after_overwrite, " +
       "CAST((SELECT SUM(n_nationkey + 100) FROM nation " +
       "WHERE n_regionkey = 2) AS BIGINT) AS keysum_after_overwrite, " +
       "CAST(0 AS BIGINT) AS after_truncate"),
    // the post-statement state algebra restated over the base table:
    // t1 = after UPDATE, t2 = after MERGE (matched rows take the 2x
    // source price - every (1000,2000] key matches itself - plus the
    // inserted (2000,3000] slice), t3 = after the computed-predicate
    // DELETE; money sums go through the Det decimal cast of the SAME
    // IEEE products both engines compute
    "sql46_update_merge" ->
      ("WITH t1 AS (SELECT o_orderkey AS k, o_custkey AS c, " +
       "CASE WHEN o_custkey % 10 = 0 THEN o_totalprice * 1.1 " +
       "ELSE o_totalprice END AS p FROM orders WHERE o_orderkey <= 2000), " +
       "t2 AS (SELECT t1.k, t1.c, CASE WHEN t1.k > 1000 " +
       "THEN o2.o_totalprice * 2 ELSE t1.p END AS p FROM t1 " +
       "LEFT JOIN orders o2 ON o2.o_orderkey = t1.k AND t1.k > 1000 " +
       "UNION ALL SELECT o_orderkey, o_custkey, o_totalprice * 2 " +
       "FROM orders WHERE o_orderkey > 2000 AND o_orderkey <= 3000), " +
       "t3 AS (SELECT * FROM t2 WHERE k % 7 <> 3) " +
       "SELECT CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_after_update, " +
       "CAST((SELECT COUNT(*) FROM t2) AS BIGINT) AS n_after_merge, " +
       "CAST((SELECT COUNT(*) FROM t3) AS BIGINT) AS n_after_delete, " +
       "CAST(CAST((SELECT SUM(CAST(p AS DECIMAL(18,4))) FROM t1) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS price_after_update, " +
       "CAST(CAST((SELECT SUM(CAST(p AS DECIMAL(18,4))) FROM t2) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS price_after_merge, " +
       "CAST(CAST((SELECT SUM(CAST(p AS DECIMAL(18,4))) FROM t3) " +
       "AS DECIMAL(18,4)) AS DOUBLE) AS price_after_delete, " +
       "CAST((SELECT SUM(c) FROM t2) AS BIGINT) AS custkeysum_after_merge"))
}
