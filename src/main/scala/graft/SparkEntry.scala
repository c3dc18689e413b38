package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every row of SURVEY §2's operator inventory registers one entry in
  * [[queries]]; rows marked oracle-✓ also register the equivalent
  * DuckDB SQL in [[oracleSql]] (same column names + total order on both
  * sides — the driver sorts columns by name, then hash-compares values).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.a1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    Core.queries ++ Aggs.queries ++ Joins.queries ++ SetOps.queries ++
      Windows.queries ++ Scalars.queries ++ TextOps.queries ++
      Dedup.queries ++ SimSearch.queries ++ Multimodal.queries ++
      ScaleOps.queries ++
      SqlSurface.queries ++
      GraphOps.queries ++ Dml.queries ++ Clustering.queries ++
      AuditOps.queries ++ BasketOps.queries ++ WarehouseOps.queries ++ CurationOps.queries ++ StorageOps.queries ++ StatsOps.queries ++ EvalOps.queries ++ EventOps.queries ++ TextIndexOps.queries ++ EmbedOps.queries ++ PipelineOps.queries ++ PrivacyOps.queries ++
      Subqueries.queries ++ graft.streaming.Streams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    Core.oracles ++ Aggs.oracles ++ Joins.oracles ++ SetOps.oracles ++
      Windows.oracles ++ Scalars.oracles ++ TextOps.oracles ++
      Dedup.oracles ++ SimSearch.oracles ++ Multimodal.oracles ++
      ScaleOps.oracles ++
      SqlSurface.oracles ++
      GraphOps.oracles ++ Dml.oracles ++ Clustering.oracles ++
      AuditOps.oracles ++ BasketOps.oracles ++ WarehouseOps.oracles ++ CurationOps.oracles ++ StorageOps.oracles ++ StatsOps.oracles ++ EvalOps.oracles ++ EventOps.oracles ++ TextIndexOps.oracles ++ EmbedOps.oracles ++ PipelineOps.oracles ++ PrivacyOps.oracles ++
      Subqueries.oracles ++ graft.streaming.Streams.oracles
}
