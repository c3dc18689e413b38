package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Scale-technique operators: the shuffle-shaping patterns a 100 TB
  * deployment leans on — salting for skew, bucketing for shuffle-free
  * joins — plus the SQL-string entry surface (SURVEY §3.2 E2), each
  * verified against the DuckDB oracle to prove the technique preserves
  * semantics exactly.
  */
object ScaleOps {

  /** X9 — salted two-phase aggregation: l_returnflag has only 3 values,
    * so a direct groupBy at 100 TB funnels a third of the table into one
    * reducer. Salting by a 16-way key spreads the partial aggregation,
    * and the exact-decimal partials re-combine associatively — the
    * oracle (an unsalted GROUP BY) proves the result is unchanged. */
  def x9SaltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .withColumn("salt", pmod(col("l_orderkey"), lit(16L)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_extendedprice").cast(Det.Money)).as("part_sum"),
        count(lit(1)).as("part_n"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("part_sum")).cast("double").as("sum_price"),
        sum(col("part_n")).as("n"))
      .orderBy(col("l_returnflag"))

  /** X10 — bucketed co-partitioned join: both fact tables are written
    * bucketed by the join key, then joined shuffle-free (the plan has no
    * Exchange on either side — asserted in ScaleOpsSpec). This is the
    * pre-shuffle-once, join-many-times pattern for repeated 100 TB joins. */
  def x10BucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.tune(spark)
    val nBuckets = 8
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"))
    // idempotent re-create: the in-memory catalog forgets tables across
    // sessions but their warehouse directories persist, and CREATE then
    // refuses the stale location — drop both metadata and files first
    Seq("graft_li_bucketed", "graft_o_bucketed").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          // listFiles returns null (not empty) on I/O or permission error
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    li.write.mode("overwrite").bucketBy(nBuckets, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("graft_li_bucketed")
    o.write.mode("overwrite").bucketBy(nBuckets, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("graft_o_bucketed")
    val bl = s.table("graft_li_bucketed")
    val bo = s.table("graft_o_bucketed")
    bl.join(bo, bl("l_orderkey") === bo("o_orderkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("o_totalprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
  }

  /** SQL1 — E2 entry surface: TPC-H Q3-style shipping priority, written
    * as a SQL string over registered temp views (SparkSqlParser → same
    * Catalyst pipeline as the DataFrame API). */
  def sql1ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("v_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem")
    spark.sql(
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS odate
        |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
      .withColumn("odate", col("odate").cast("string"))
  }

  /** SQL2 — E2 entry surface: top customers by returned-item revenue
    * (TPC-H Q10-flavored). */
  def sql2TopReturners(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("v_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("v_orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("v_lineitem")
    spark.sql(
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS lost_revenue,
        |  COUNT(*) AS n_returned_lines
        |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY lost_revenue DESC, c_custkey LIMIT 20""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x9_salted_agg" -> (x9SaltedAgg _),
    "x10_bucketed_join" -> (x10BucketedJoin _),
    "sql1_shipping_priority" -> (sql1ShippingPriority _),
    "sql2_top_returners" -> (sql2TopReturners _))

  import Det.{sql => d}
  val oracles: Map[String, String] = Map(
    "x9_salted_agg" ->
      (s"SELECT l_returnflag, ${d.dsum("l_extendedprice")} AS sum_price, " +
       "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "x10_bucketed_join" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice, o_totalprice " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "WHERE l_quantity > 45.0 AND o_orderpriority = '1-URGENT' " +
       "ORDER BY l_orderkey, l_linenumber, l_extendedprice"),
    "sql1_shipping_priority" ->
      ("SELECT o_orderkey, " +
       s"${d.dsum("l_extendedprice*(1.0-l_discount)")} AS revenue, " +
       "strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON l_orderkey = o_orderkey " +
       "WHERE c_mktsegment = 'BUILDING' " +
       "AND o_orderdate < TIMESTAMP '1998-01-01' " +
       "AND l_shipdate > TIMESTAMP '1998-01-01' " +
       "GROUP BY o_orderkey, o_orderdate " +
       "ORDER BY revenue DESC, o_orderkey LIMIT 10"),
    "sql2_top_returners" ->
      ("SELECT c_custkey, c_name, " +
       s"${d.dsum("l_extendedprice*(1.0-l_discount)")} AS lost_revenue, " +
       "COUNT(*) AS n_returned_lines " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON l_orderkey = o_orderkey WHERE l_returnflag = 'R' " +
       "GROUP BY c_custkey, c_name ORDER BY lost_revenue DESC, c_custkey LIMIT 20"))
}
