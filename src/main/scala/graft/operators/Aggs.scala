package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Aggregation operators — SURVEY §2.4 (A1–A8).
  *
  * All declarative `groupBy/agg` → Catalyst plans a partial (map-side)
  * HashAggregate, a shuffle on the grouping keys, and a final
  * HashAggregate — the map-side combine is what keeps this linear at
  * 100 TB (shuffle volume = #groups × #partitions, not #rows).
  */
object Aggs {

  /** A1 — grouped hash aggregate: TPC-H Q1-style pricing summary over
    * lineitem. The flagship query (SparkEntry.entry). */
  def a1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Det.dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  import Det.{sql => d}
  val a1Oracle: String =
    "SELECT l_returnflag, l_linestatus, " +
      s"${d.dsum("l_quantity")} AS sum_qty, " +
      s"${d.dsum("l_extendedprice")} AS sum_base_price, " +
      s"${d.dsum("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price, " +
      s"${d.dsum6("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge, " +
      s"${d.davg("l_quantity")} AS avg_qty, " +
      s"${d.davg("l_extendedprice")} AS avg_price, " +
      s"${d.davg("l_discount")} AS avg_disc, " +
      "COUNT(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
      "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_pricing_summary" -> (a1PricingSummary _))

  val oracles: Map[String, String] = Map(
    "a1_pricing_summary" -> a1Oracle)
}
