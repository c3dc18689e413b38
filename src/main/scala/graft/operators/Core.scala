package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core scan / projection / filter / sort surface — SURVEY §2.1, §2.2,
  * §2.6 (S1–S6, P1–P8, O1–O2). This is the reference-equivalent query
  * core (StellarSQL's SELECT/WHERE over typed tables; checkout was empty
  * at survey time — SURVEY.md §0), expressed declaratively so Catalyst
  * pushes filters and projections into the parquet scan.
  */
object Core {

  /** S1 — full table scan (smallest dim; proves footer-schema read). */
  def s1Scan(spark: SparkSession, sfDir: String): DataFrame =
    Tables.region(spark, sfDir).orderBy(col("r_regionkey"))

  /** S2 — projection + predicate pushed to the parquet reader. At 100 TB
    * this is the difference between reading 2 columns of a few row groups
    * and the full table: `.explain` shows PushedFilters + 3-col ReadSchema. */
  def s2Pushdown(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      // (l_orderkey, l_linenumber) is NOT unique in this datagen — sort by
      // every emitted column so ties are bitwise-identical rows.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** S3 — nanosecond-timestamp scan (events.parquet; SURVEY §1.3): ts is
    * read as epoch-nano BIGINT, truncated to µs (DuckDB's precision for
    * this file) and emitted as ts_us, never as a raw timestamp. */
  def s3EventsScan(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").as("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))

  /** S5 — CSV + JSON secondary sources: round-trips a small frame through
    * both formats under java.io.tmpdir and reads it back (rows-only check).
    * Fixed directory (not createTempDirectory): overwrite-in-place, so
    * repeated bench/verify rounds don't accumulate orphaned temp dirs. */
  def s5CsvJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // per-corpus scratch: two JVMs on different SFs must not share a dir
    val base = Tables.scratchDir("s5", sfDir)
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
      .toDF("id", "name", "score")
    df.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    df.write.mode("overwrite").json(s"$base/json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/csv")
      .select(col("id").cast("long"), col("name"), col("score").cast("double"))
    val json = spark.read.json(s"$base/json")
      .select(col("id").cast("long"), col("name"), col("score").cast("double"))
    csv.unionByName(json)
      .groupBy(col("id"), col("name"))
      .agg(count(lit(1)).as("n_formats"), sum(col("score")).cast("double").as("sum_score"))
      .orderBy(col("id"))
  }

  /** S5c — CSV + JSON SINK round-trip on real table data (s5 exercises
    * the sources on a literal frame; this is the export path a real user
    * round-trips): the supplier table written to both text formats,
    * read back with the source schema pinned (no inference — text
    * formats carry no types), unioned, and aggregated. The oracle
    * reproduces the aggregate straight from the parquet table, so any
    * loss or mangling in either sink round-trip breaks the hash.
    * Doubles survive exactly: Spark writes shortest-round-trip decimal
    * text and reads it back to the identical bits. */
  def s5cCsvJsonSink(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.scratchDir("s5c", sfDir)
    val src = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
    src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    src.write.mode("overwrite").json(s"$base/json")
    val csv = Tables.tune(spark).read.option("header", "true")
      .schema(src.schema).csv(s"$base/csv")
    val json = Tables.tune(spark).read.schema(src.schema).json(s"$base/json")
    csv.unionByName(json)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        graft.Det.dsum(col("s_acctbal")).as("sum_bal"),
        countDistinct(col("s_name")).as("n_names"))
      .orderBy(col("s_nationkey"))
  }

  /** S5b — ORC source/sink round-trip (rows-only: DuckDB has no ORC
    * reader): lineitem slice written as ORC, read back, aggregated, and
    * checked against the parquet-sourced equivalent in CoreSpec. */
  def s5bOrc(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Tables.scratchDir("s5b", sfDir)
    Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.mode("overwrite").orc(dir)
    Tables.tune(spark).read.orc(dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        graft.Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** S6 — in-memory table (CREATE TABLE + INSERT VALUES analog): literal
    * rows registered as a temp view and queried through the catalog. */
  def s6InMemory(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Seq((1, "ada"), (2, "grace"), (3, "edsger"), (4, "barbara"))
      .toDF("id", "name")
      .createOrReplaceTempView("graft_people")
    spark.sql(
      "SELECT id, name, length(name) AS name_len FROM graft_people " +
      "WHERE id <> 3 ORDER BY id")
  }

  /** P1 — projection with derived columns. */
  def p1Projection(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_name"),
        (col("p_retailprice") * 1.1).as("marked_up"),
        (col("p_size") + 5).as("padded_size"))
      .orderBy(col("p_partkey"))

  /** P2 — comparison predicates (=, <>, <, <=, >, >=). */
  def p2FilterCmp(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 30.0 && col("l_quantity") <= 40.0 &&
        col("l_discount") < 0.05 && col("l_tax") > 0.0 &&
        col("l_returnflag") =!= "A" && col("l_linestatus") === "O")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_tax"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_tax"))

  /** P3 — boolean combinators AND / OR / NOT. */
  def p3FilterBool(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter((col("o_orderstatus") === "F" && col("o_totalprice") > 400000.0)
        || (col("o_orderpriority") === "1-URGENT" && !(col("o_orderstatus") === "O")))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** P4 — IN / BETWEEN / LIKE membership, range, and pattern predicates. */
  def p4InBetweenLike(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY") &&
        col("c_acctbal").between(1000.0, 5000.0) &&
        col("c_name").like("%7"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** P5 — NULL handling: the corpus is null-free, so nulls are synthesized
    * by an outer join against a heavily filtered build side, then probed
    * with IS NULL / coalesce / nullif. */
  def p5Nulls(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val bigOrders = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_outer")
      .select(col("c_custkey"),
        col("o_orderkey").isNull.as("no_big_order"),
        coalesce(col("o_totalprice"), lit(0.0)).as("big_total"),
        nullif(col("c_mktsegment"), lit("BUILDING")).isNull.as("is_building"))
      .orderBy(col("c_custkey"), col("big_total"))
  }

  /** P6 — explicit casts among int/long/double/decimal/string/date.
    * double→int is spelled floor()+cast on both sides: Spark casts by
    * truncation while DuckDB rounds, so the portable form is explicit. */
  def p6Cast(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"),
        col("l_quantity").cast("decimal(18,2)").cast("double").as("qty_dec"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        col("l_linenumber").cast("long").as("line_long"),
        col("l_linenumber").cast("string").as("line_str"),
        col("l_shipdate").cast("date").cast("string").as("ship_day"))
      .orderBy(col("l_orderkey"), col("qty_dec"), col("price_floor"),
        col("ship_day"))

  /** P7 — CASE WHEN conditional projection. */
  def p7CaseWhen(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        when(col("o_totalprice") >= 300000.0, "large")
          .when(col("o_totalprice") >= 100000.0, "medium")
          .otherwise("small").as("tier"))
      .orderBy(col("o_orderkey"))

  /** P8 — LIMIT with a total order for determinism. */
  def p8Limit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .limit(20)

  /** O1 — global multi-key sort with explicit null placement (range-
    * partitioned SortExec: total order without a single-node bottleneck). */
  def o1SortMulti(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"))
      .orderBy(col("seg_or_null").desc_nulls_last, col("c_acctbal").asc,
        col("c_custkey").asc)

  /** O2 — top-K: ORDER BY + LIMIT collapses to TakeOrderedAndProject (per-
    * partition heaps + driver merge — no global sort of 100 TB). */
  def o2TopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** S12 — schema evolution across parquet file generations: an old
    * writer produced (key, name, acctbal), a new writer (key, name,
    * nationkey); `mergeSchema=true` reconciles the union schema with
    * nulls for absent columns, exactly like a long-lived 100 TB table
    * whose producers evolved mid-stream. The aggregate proves null
    * accounting: per-generation counts + the exact balance sum survive
    * the merge. (Merged-footer inference costs one extra listing pass at
    * scale — production pins the union schema in a catalog; same plan.) */
  def s12MergeSchema(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.scratchDir("s12", sfDir)
    val s = Tables.supplier(spark, sfDir)
    s.filter(col("s_suppkey") % 2 === 0)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .write.mode("overwrite").parquet(s"$base/gen1")
    s.filter(col("s_suppkey") % 2 =!= 0)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .write.mode("overwrite").parquet(s"$base/gen2")
    Tables.tune(spark).read.option("mergeSchema", "true")
      .parquet(s"$base/gen1", s"$base/gen2")
      .agg(count(lit(1)).as("n"),
        count(col("s_acctbal")).as("n_gen1"),
        count(col("s_nationkey")).as("n_gen2"),
        graft.Det.dsum(col("s_acctbal")).as("bal_gen1"),
        countDistinct(col("s_name")).as("n_names"))
  }

  /** S11 — custom DataSource V2 scan ([[graft.sources.SeqSource]]): the
    * connector-extension tier. The `id` band is consumed by the source's
    * own filter pushdown, so only the slices intersecting [50k,150k) are
    * ever planned (source-level partition pruning — asserted in
    * SeqSourceSpec), and the scan reports post-pushdown statistics. The
    * aggregate then runs over exactly the surviving rows. */
  def s11Dsv2Source(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft-seq")
      .option("start", 0).option("end", 200000).option("slices", 64)
      .load()
      .filter(col("id") >= 50000 && col("id") < 150000)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("val")).as("sum_val"))
      .orderBy(col("bucket"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_scan" -> (s1Scan _),
    "s11_dsv2_source" -> (s11Dsv2Source _),
    "s12_merge_schema" -> (s12MergeSchema _),
    "s2_pushdown" -> (s2Pushdown _),
    "s3_events_scan" -> (s3EventsScan _),
    "s5_csv_json" -> (s5CsvJson _),
    "s5b_orc" -> (s5bOrc _),
    "s5c_csv_json_sink" -> (s5cCsvJsonSink _),
    "s6_inmemory" -> (s6InMemory _),
    "p1_projection" -> (p1Projection _),
    "p2_filter_cmp" -> (p2FilterCmp _),
    "p3_filter_bool" -> (p3FilterBool _),
    "p4_in_between_like" -> (p4InBetweenLike _),
    "p5_nulls" -> (p5Nulls _),
    "p6_cast" -> (p6Cast _),
    "p7_case_when" -> (p7CaseWhen _),
    "p8_limit" -> (p8Limit _),
    "o1_sort_multi" -> (o1SortMulti _),
    "o2_topk" -> (o2TopK _))

  import graft.Det.{sql => d}
  val oracles: Map[String, String] = Map(
    "s1_scan" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    // mirrors SeqSource.valueOf: the oracle regenerates the same
    // deterministic sequence with DuckDB's range() table function
    "s11_dsv2_source" ->
      ("SELECT CAST(id % 100 AS INT) AS bucket, COUNT(*) AS n, " +
       d.dsum("((id * 2654435761) % 1000) / 10.0") + " AS sum_val " +
       "FROM (SELECT range AS id FROM range(50000, 150000)) t " +
       "GROUP BY 1 ORDER BY 1"),
    // the oracle recomputes the evolution split straight from supplier:
    // even keys carried acctbal (gen1), odd keys nationkey (gen2)
    "s12_merge_schema" ->
      ("SELECT COUNT(*) AS n, " +
       "CAST(COUNT(CASE WHEN s_suppkey % 2 = 0 THEN 1 END) AS BIGINT) AS n_gen1, " +
       "CAST(COUNT(CASE WHEN s_suppkey % 2 <> 0 THEN 1 END) AS BIGINT) AS n_gen2, " +
       "CAST(SUM(CASE WHEN s_suppkey % 2 = 0 " +
       "THEN CAST(s_acctbal AS DECIMAL(18,4)) END) AS DOUBLE) AS bal_gen1, " +
       "COUNT(DISTINCT s_name) AS n_names FROM supplier"),
    "s2_pushdown" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
       "WHERE l_quantity > 45.0 ORDER BY l_orderkey, l_linenumber, l_quantity"),
    "s3_events_scan" ->
      ("SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value " +
       "FROM events WHERE event_type = 'purchase' ORDER BY event_id"),
    // Round-trip oracles: the CSV/JSON one pins the literal input rows
    // (each id seen in exactly 2 formats, score summed twice); the ORC one
    // computes the same aggregate straight from parquet — both verify the
    // sink+source preserved values exactly.
    "s5_csv_json" ->
      ("SELECT * FROM (VALUES " +
       "(CAST(1 AS BIGINT),'alpha',CAST(2 AS BIGINT),CAST(3.0 AS DOUBLE))," +
       "(CAST(2 AS BIGINT),'beta',CAST(2 AS BIGINT),CAST(5.0 AS DOUBLE))," +
       "(CAST(3 AS BIGINT),'gamma',CAST(2 AS BIGINT),CAST(7.0 AS DOUBLE))) " +
       "t(id,name,n_formats,sum_score) ORDER BY id"),
    "s5b_orc" ->
      (s"SELECT l_returnflag, COUNT(*) AS n, ${d.dsum("l_quantity")} AS sum_qty " +
       "FROM lineitem WHERE l_quantity > 45.0 " +
       "GROUP BY l_returnflag ORDER BY l_returnflag"),
    // every supplier row passes through BOTH text sinks, so each count
    // and the exact decimal balance sum appear doubled vs the table
    "s5c_csv_json_sink" ->
      ("SELECT s_nationkey, 2*COUNT(*) AS n, " +
       "CAST(2*SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal, " +
       "COUNT(DISTINCT s_name) AS n_names " +
       "FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"),
    "s6_inmemory" ->
      ("SELECT id, name, CAST(length(name) AS INT) AS name_len FROM " +
       "(VALUES (1,'ada'),(2,'grace'),(3,'edsger'),(4,'barbara')) p(id,name) " +
       "WHERE id <> 3 ORDER BY id"),
    "p1_projection" ->
      ("SELECT p_partkey, p_name, p_retailprice * 1.1 AS marked_up, " +
       "p_size + 5 AS padded_size FROM part ORDER BY p_partkey"),
    "p2_filter_cmp" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax " +
       "FROM lineitem WHERE l_quantity >= 30.0 AND l_quantity <= 40.0 " +
       "AND l_discount < 0.05 AND l_tax > 0.0 AND l_returnflag <> 'A' " +
       "AND l_linestatus = 'O' ORDER BY l_orderkey, l_linenumber, " +
       "l_quantity, l_discount, l_tax"),
    "p3_filter_bool" ->
      ("SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice " +
       "FROM orders WHERE (o_orderstatus = 'F' AND o_totalprice > 400000.0) " +
       "OR (o_orderpriority = '1-URGENT' AND NOT (o_orderstatus = 'O')) " +
       "ORDER BY o_orderkey"),
    "p4_in_between_like" ->
      ("SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer " +
       "WHERE c_mktsegment IN ('BUILDING','MACHINERY') " +
       "AND c_acctbal BETWEEN 1000.0 AND 5000.0 AND c_name LIKE '%7' " +
       "ORDER BY c_custkey"),
    "p5_nulls" ->
      ("SELECT c_custkey, o_orderkey IS NULL AS no_big_order, " +
       "COALESCE(o_totalprice, 0.0) AS big_total, " +
       "NULLIF(c_mktsegment, 'BUILDING') IS NULL AS is_building " +
       "FROM customer LEFT JOIN " +
       "(SELECT o_custkey, o_orderkey, o_totalprice FROM orders " +
       "WHERE o_totalprice > 450000.0) big ON c_custkey = big.o_custkey " +
       "ORDER BY c_custkey, big_total"),
    "p6_cast" ->
      ("SELECT l_orderkey, " +
       "CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty_dec, " +
       "CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, " +
       "CAST(l_linenumber AS BIGINT) AS line_long, " +
       "CAST(l_linenumber AS VARCHAR) AS line_str, " +
       "strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day " +
       "FROM lineitem WHERE l_linenumber = 1 " +
       "ORDER BY l_orderkey, qty_dec, price_floor, ship_day"),
    "p7_case_when" ->
      ("SELECT o_orderkey, CASE WHEN o_totalprice >= 300000.0 THEN 'large' " +
       "WHEN o_totalprice >= 100000.0 THEN 'medium' ELSE 'small' END AS tier " +
       "FROM orders ORDER BY o_orderkey"),
    "p8_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20",
    "o1_sort_multi" ->
      ("SELECT c_custkey, c_acctbal, c_mktsegment, " +
       "NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null FROM customer " +
       "ORDER BY seg_or_null DESC NULLS LAST, c_acctbal ASC, c_custkey ASC"),
    "o2_topk" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
       "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"))
}
