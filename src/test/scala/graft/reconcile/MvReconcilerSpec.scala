package graft.reconcile

import graft.SparkSpec
import graft.config.Settings
import graft.report.StatsCollector
import org.apache.spark.sql.functions._

class MvReconcilerSpec extends SparkSpec {
  import Fixtures._

  private def reconcile(
      base: org.apache.spark.sql.DataFrame,
      mv: org.apache.spark.sql.DataFrame,
      settings: Settings = Settings(),
      mvS: graft.schema.TableSchema = mvSchema) =
    MvReconciler.reconcile(base, mv, baseSchema, mvS, settings)

  test("all-consistent: both rows match") {
    val out = reconcile(baseBoth(spark), mvBoth(spark))
    val stats = StatsCollector.collect(out)
    assert(stats.totRecords == 2 && stats.consistentRecords == 2)
    assert(stats.toString ==
      "totRecords: 2, skippedRecords: 0, consistentRecords: 2, " +
        "inConsistentRecords: 0, missingBaseTableRecords: 0, missingMvRecords: 0, " +
        "repairRecords: 0, notRepairRecords: 0, delAttemptedRecords: 0, " +
        "delErrRecords: 0, delSuccessRecords: 0, notDelRecords: 0, " +
        "upsertAttemptedRecords: 0, upsertErrRecords: 0, upsertSuccessRecords: 0")
  }

  test("missing in MV: row2 absent from MV") {
    val out = reconcile(baseBoth(spark), mvMissingRow2(spark))
    val stats = StatsCollector.collect(out)
    assert(stats.totRecords == 2 && stats.consistentRecords == 1 &&
      stats.missingMvRecords == 1 && stats.notRepairRecords == 1)
    val r = out.filter(col("problem") === MvReconciler.MissingInMv).collect()
    assert(r.length == 1 && r(0).getAs[String]("pk") == "Driver2")
  }

  test("missing in base: row2 absent from base (orphan MV row)") {
    val out = reconcile(baseMissingRow2(spark), mvBoth(spark))
    val stats = StatsCollector.collect(out)
    assert(stats.missingBaseTableRecords == 1 && stats.consistentRecords == 1)
  }

  test("inconsistent: first mismatch is c4 44 vs 441 (reference golden)") {
    val out = reconcile(baseBoth(spark), mvMismatchRow2(spark))
    val r = out.filter(col("problem") === MvReconciler.Inconsistent).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("mismatch_col") == "c4")
    assert(r(0).getAs[String]("mismatch_base") == "44")
    assert(r(0).getAs[String]("mismatch_mv") == "441")
    val stats = StatsCollector.collect(out)
    assert(stats.inConsistentRecords == 1 && stats.consistentRecords == 1)
  }

  test("MV with fewer columns: c4 excluded from comparison → consistent") {
    // Reference scenario MV_HAS_FEWER_COLUMNS (MvSyncTest.java:1066-1174):
    // c4 not in the MV schema, so a base/mv c4 difference is invisible.
    val mv = Fixtures.df(spark, mvSchemaFewerCols,
      mvRow(mvSchemaFewerCols, Map("pk" -> "Driver1", "ck1" -> "SF", "ck2" -> 2020),
        10, Seq(20, 30, 40), Wt1),
      mvRow(mvSchemaFewerCols, Map("pk" -> "Driver2", "ck1" -> "NY", "ck2" -> 2021),
        11, Seq(22, 33, 44), Wt2))
    val out = reconcile(baseBoth(spark), mv, mvS = mvSchemaFewerCols)
    assert(StatsCollector.collect(out).consistentRecords == 2)
  }

  test("time scope: window covering only row1's writetime skips row2") {
    // Row1 wt=2024-01-01, row2 wt=2024-01-02 (µs). End bound 2024-01-01T12:00.
    val endSec = 1704067200L + 12 * 3600
    val out = reconcile(baseBoth(spark), mvBoth(spark),
      Settings(startTsEpochSec = 0, endTsEpochSec = endSec))
    val stats = StatsCollector.collect(out)
    assert(stats.skippedRecords == 1 && stats.consistentRecords == 1 &&
      stats.totRecords == 2)
  }

  test("time scope: window in the past skips everything") {
    val out = reconcile(baseBoth(spark), mvBoth(spark),
      Settings(startTsEpochSec = 1546300800L, endTsEpochSec = 1577836800L)) // 2019..2020
    assert(StatsCollector.collect(out).skippedRecords == 2)
  }

  test("no time scope configured: nothing skipped") {
    val out = reconcile(baseBoth(spark), mvBoth(spark), Settings())
    assert(StatsCollector.collect(out).skippedRecords == 0)
  }

  test("null semantics: (null,null) equal, one-sided null mismatch") {
    import org.apache.spark.sql.Row
    val s = baseSchema
    def mk(c2: Any) = Fixtures.df(spark, s,
      Row.fromSeq(Seq("Driver1", "SF", 2020) ++ Seq(
        10, Wt1, null, c2, if (c2 == null) null else Wt1, null,
        30, Wt1, null, 40, Wt1, null)))
    val mvSide = Fixtures.df(spark, s,
      Row.fromSeq(Seq("Driver1", "SF", 2020) ++ Seq(
        10, Wt1, null, null, null, null, 30, Wt1, null, 40, Wt1, null)))
    // base c2=null vs mv c2=null → consistent
    val both = MvReconciler.reconcile(mk(null), mvSide, s, s, Settings())
    assert(both.filter(col("problem") === "CONSISTENT").count() == 1)
    // base c2=20 vs mv c2=null → inconsistent; the null side stays SQL
    // null (reference carries Java null in the mismatch tuple,
    // MvSync.java:499-507, so RecordColumnInfo renders bare "col:TYPE")
    val oneSided = MvReconciler.reconcile(mk(20), mvSide, s, s, Settings())
    val r = oneSided.collect()(0)
    assert(r.getAs[String]("problem") == "INCONSISTENT")
    assert(r.getAs[String]("mismatch_col") == "c2")
    assert(r.getAs[String]("mismatch_base") == "20")
    assert(r.getAs[String]("mismatch_mv") == null)
  }

  test("time-scope: null-valued cells don't contribute writetimes; " +
      "missing writetime on a non-null cell raises") {
    import org.apache.spark.sql.Row
    val s = baseSchema
    val scoped = Settings(startTsEpochSec = Wt1 / 1000000L - 10)
    // c2 value null but carrying an ancient writetime: must NOT skip the
    // row (reference gates on row.getObject != null, MvSync.java:459)
    val nullCellOldWt = Fixtures.df(spark, s,
      Row.fromSeq(Seq("Driver1", "SF", 2020) ++ Seq(
        10, Wt1, null, null, 1L, null, 30, Wt1, null, 40, Wt1, null)))
    val out = MvReconciler.reconcile(nullCellOldWt, nullCellOldWt, s, s, scoped)
    assert(out.filter(col("problem") === "NOT_IN_SCOPE").count() == 0)
    // c2 value present but writetime null → error (MvSync.java:468-473),
    // but only when scoping is active
    val missingWt = Fixtures.df(spark, s,
      Row.fromSeq(Seq("Driver1", "SF", 2020) ++ Seq(
        10, Wt1, null, 20, null, null, 30, Wt1, null, 40, Wt1, null)))
    // (bare count() would let Catalyst prune min_wt away — force problem)
    val ex = intercept[Exception] {
      MvReconciler.reconcile(missingWt, missingWt, s, s, scoped)
        .select("problem").collect()
    }
    assert(ex.getMessage != null)
    // no scope bounds → no error (our engine skips the computation)
    assert(MvReconciler.reconcile(missingWt, missingWt, s, s, Settings())
      .select("problem").collect().length == 1)
  }

  test("duplicate keys: first-element-per-key cogroup parity") {
    val base = baseBoth(spark).union(baseBoth(spark)) // every key twice
    val out = reconcile(base, mvBoth(spark))
    assert(StatsCollector.collect(out).totRecords == 2)
  }
}
