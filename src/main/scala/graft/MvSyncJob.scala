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
