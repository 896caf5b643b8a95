package graft

import graft.operators.{Curation, Dedup, Layout, Multimodal, ReconQueries, RelationalQueries, SeqPack, Similarity, TableProfile, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full reconciliation
   * classify (the reference's core pipeline) on the orders-derived
   * base/MV pair; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReconQueries.reconClassify(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ReconQueries.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ Curation.queries ++ SeqPack.queries ++
      Layout.queries ++ TableProfile.queries ++
      graft.streaming.EventPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ ReconQueries.oracleSql ++
      TextAnalysis.oracleSql ++ Dedup.oracleSql ++ Similarity.oracleSql ++
      Multimodal.oracleSql ++ Curation.oracleSql ++ SeqPack.oracleSql ++
      Layout.oracleSql ++ TableProfile.oracleSql ++
      graft.streaming.EventPipeline.oracleSql
}
