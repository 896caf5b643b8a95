package graft.report

import graft.reconcile.MvReconciler._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Job counters, reference parity with the 15 `LongAccumulator`s of
 * `mvsync.JobStats` (JobStats.java:8-41) and its one-line summary format
 * (JobStats.java:43-75, README.md:73).
 *
 * Instead of accumulators (which double-count on task retry) the counts
 * come from ONE aggregation over the classified DataFrame —
 * `groupBy(problem).count()` — exact under retries and a single
 * map-side-combined shuffle of |categories| rows at any scale.
 */
final case class JobStats(
    totRecords: Long = 0,
    skippedRecords: Long = 0,
    consistentRecords: Long = 0,
    inConsistentRecords: Long = 0,
    missingBaseTableRecords: Long = 0,
    missingMvRecords: Long = 0,
    repairRecords: Long = 0,
    notRepairRecords: Long = 0,
    delAttemptedRecords: Long = 0,
    delErrRecords: Long = 0,
    delSuccessRecords: Long = 0,
    notDelRecords: Long = 0,
    upsertAttemptedRecords: Long = 0,
    upsertErrRecords: Long = 0,
    upsertSuccessRecords: Long = 0) {

  /** Byte-for-byte the reference's stats line (JobStats.java:43-75). */
  override def toString: String =
    s"totRecords: $totRecords, skippedRecords: $skippedRecords, " +
      s"consistentRecords: $consistentRecords, inConsistentRecords: $inConsistentRecords, " +
      s"missingBaseTableRecords: $missingBaseTableRecords, missingMvRecords: $missingMvRecords, " +
      s"repairRecords: $repairRecords, notRepairRecords: $notRepairRecords, " +
      s"delAttemptedRecords: $delAttemptedRecords, delErrRecords: $delErrRecords, " +
      s"delSuccessRecords: $delSuccessRecords, notDelRecords: $notDelRecords, " +
      s"upsertAttemptedRecords: $upsertAttemptedRecords, upsertErrRecords: $upsertErrRecords, " +
      s"upsertSuccessRecords: $upsertSuccessRecords"
}

object StatsCollector {

  /** Category counts as a (problem, count) DataFrame — the distributed
   * part; tiny result, safe to collect. */
  def byProblem(classified: DataFrame): DataFrame =
    classified.groupBy(ProblemCol).count()

  /**
   * Zero-extra-job counters via `Dataset.observe` (operator U — the
   * reference's Codahale metrics registry, MvSyncJobMetrics.java:6-24):
   * piggybacks category counts onto whatever action the caller already
   * runs, instead of a second aggregation pass over the classified frame.
   * Read `observation.get` after the action completes.
   */
  def observed(classified: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("graft_mvsync")
    def cnt(problem: String) =
      count_if(col(ProblemCol) === problem).as(problem)
    val df = classified.observe(obs,
      count(lit(1)).as("totRecords"),
      cnt(Consistent), cnt(Inconsistent), cnt(MissingInBase),
      cnt(MissingInMv), cnt(NotInScope))
    (df, obs)
  }

  /**
   * Collect the reference stats. Repair counters reflect the repair flags
   * the same way the gating logic does (MvSync.java:380-414): with all
   * fix flags off every problem row is "notRepair"/"notDel".
   */
  def collect(
      classified: DataFrame,
      fixMissingMv: Boolean = false,
      fixOrphanMv: Boolean = false,
      fixInconsistentMv: Boolean = false): JobStats = {
    val counts = byProblem(classified).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def c(k: String) = counts.getOrElse(k, 0L)

    val missingBase = c(MissingInBase)
    val missingMv = c(MissingInMv)
    val inconsistent = c(Inconsistent)
    val delAttempted = if (fixOrphanMv) missingBase else 0L
    val upsertAttempted =
      (if (fixMissingMv) missingMv else 0L) +
        (if (fixInconsistentMv) inconsistent else 0L)

    JobStats(
      totRecords = counts.values.sum,
      skippedRecords = c(NotInScope),
      consistentRecords = c(Consistent),
      inConsistentRecords = inconsistent,
      missingBaseTableRecords = missingBase,
      missingMvRecords = missingMv,
      repairRecords = delAttempted + upsertAttempted,
      notRepairRecords = (missingBase + missingMv + inconsistent) - delAttempted - upsertAttempted,
      delAttemptedRecords = delAttempted,
      delSuccessRecords = delAttempted, // LogSink never fails; Cassandra sink patches
      // Reference increments notDelRecords only inside the delete-attempted
      // branch (MvSync.java:388-395); with fixOrphanMv off the counter stays
      // 0 and the rows land in notRepairRecords instead.
      notDelRecords = if (fixOrphanMv) missingBase - delAttempted else 0L,
      upsertAttemptedRecords = upsertAttempted,
      upsertSuccessRecords = upsertAttempted)
  }
}
