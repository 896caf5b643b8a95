package graft

import graft.config.Settings
import graft.reconcile.MvReconciler
import graft.repair.RepairPlanner
import graft.report.{JobStats, ReportWriter}
import graft.schema.TableSchema
import graft.sources.Source
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * End-to-end reconciliation job: the Spark-native restatement of the
 * reference's `buildAndRunSparkJob` (MvSync.java:108-156).
 *
 *   source(base) → source(mv) → full-outer join on MV PK → classify →
 *   [mutation plan → sink] → categorized report + stats line
 *
 * Everything up to the sink is ONE Catalyst plan with a single shuffle
 * (the join — mirroring the reference's single cogroup shuffle,
 * MvSync.java:286-287). Repair applies from a *plan DataFrame*
 * (plan/apply split) so mutations are testable, idempotent-ish and
 * re-runnable — see RepairPlanner.
 */
object MvSyncJob {

  final case class Result(classified: DataFrame, mutations: DataFrame, stats: JobStats)

  /** Fail-fast validation (reference MvSync.java:92-106): repair flags
   * set + un-repairable column types → error before any scan. */
  def validate(settings: Settings, mvSchema: TableSchema): Unit = {
    val fixing = settings.fixMissingMv || settings.fixOrphanMv || settings.fixInconsistentMv
    if (fixing) {
      val bad = TableSchema.unsupportedForRepair(mvSchema)
      require(bad.isEmpty,
        s"Automated repair does not support column types of: ${bad.mkString(", ")}")
    }
  }

  /**
   * spark-submit-style entry (reference MvSync.main, MvSync.java:43-45):
   * settings come from `cass.mv.*` session conf (Settings.fromSession);
   * the offline-mode table locations and MV key come from args or conf —
   * `args = [basePath, mvPath, mvPk(comma-sep), basePk(comma-sep)]`, or
   * `cass.mv.{base.path, mv.path, mv.pk, base.pk}`. Schemas are
   * discovered from the parquet footers (TableSchema.fromDataFrame),
   * mirroring the reference's cluster-metadata discovery.
   */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-mvsync")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def conf(k: String): Option[String] =
      spark.conf.getOption(s"cass.mv.$k").orElse(spark.conf.getOption(s"spark.cass.mv.$k"))
    def need(i: Int, k: String): String =
      args.lift(i).orElse(conf(k)).getOrElse(
        sys.error(s"missing arg ${i + 1} / conf cass.mv.$k"))
    val basePath = need(0, "base.path")
    val mvPath = need(1, "mv.path")
    val mvPk = need(2, "mv.pk").split(",").toSeq
    val basePk = args.lift(3).orElse(conf("base.pk"))
      .map(_.split(",").toSeq).getOrElse(mvPk.tail)
    val settings = Settings.fromSession(spark)
    val baseSchema = TableSchema.fromDataFrame(spark.read.parquet(basePath), basePk)
    val mvSchema = TableSchema.fromDataFrame(spark.read.parquet(mvPath), mvPk)
    val result = run(spark, sources.ParquetSource(basePath),
      sources.ParquetSource(mvPath), baseSchema, mvSchema, settings)
    println(result.stats.toString)
  }

  def run(
      spark: SparkSession,
      baseSource: Source,
      mvSource: Source,
      baseSchema: TableSchema,
      mvSchema: TableSchema,
      settings: Settings,
      writeReports: Boolean = true): Result = {
    validate(settings, mvSchema)
    val base = baseSource.load(spark, baseSchema)
    val mv = mvSource.load(spark, mvSchema)
    val classified =
      MvReconciler.reconcile(base, mv, baseSchema, mvSchema, settings).cache()
    val mutations = RepairPlanner.plan(classified, baseSchema, mvSchema, settings)
    val stats =
      if (writeReports) ReportWriter.write(classified, baseSchema, mvSchema, settings)
      else report.StatsCollector.collect(classified,
        settings.fixMissingMv, settings.fixOrphanMv, settings.fixInconsistentMv)
    Result(classified, mutations, stats)
  }
}
