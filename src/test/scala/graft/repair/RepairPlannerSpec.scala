package graft.repair

import graft.SparkSpec
import graft.config.Settings
import graft.reconcile.{Fixtures, MvReconciler}
import org.apache.spark.sql.functions._

class RepairPlannerSpec extends SparkSpec {
  import Fixtures._

  private def classified(
      base: org.apache.spark.sql.DataFrame,
      mv: org.apache.spark.sql.DataFrame,
      settings: Settings) =
    MvReconciler.reconcile(base, mv, baseSchema, mvSchema, settings)

  test("no fix flags → empty plan") {
    val s = Settings()
    val plan = RepairPlanner.plan(
      classified(baseBoth(spark), mvMissingRow2(spark), s), baseSchema, mvSchema, s)
    assert(plan.count() == 0)
  }

  test("fixmissingmv: one upsert per MV non-PK column from the base row") {
    val s = Settings(fixMissingMv = true)
    val plan = RepairPlanner.plan(
      classified(baseBoth(spark), mvMissingRow2(spark), s), baseSchema, mvSchema, s)
    val rows = plan.orderBy("column").collect()
    // MV regular columns are c2,c3,c4 — mv row absent so nothing skipped.
    assert(rows.map(_.getAs[String]("column")).toSeq == Seq("c2", "c3", "c4"))
    assert(rows.forall(_.getAs[String]("op") == "UPSERT"))
    assert(rows.map(_.getAs[String]("value")).toSeq == Seq("22", "33", "44"))
    // writetime present, ttl null → TIMESTAMP flavor (UpsertFlavors.java)
    assert(rows.forall(_.getAs[String]("flavor") == RepairPlanner.Timestamp))
    assert(rows.forall(_.getAs[Long]("writetime") == Wt2))
  }

  test("fixinconsistentmv: equal columns skipped (shouldSkipField)") {
    val s = Settings(fixInconsistentMv = true)
    val plan = RepairPlanner.plan(
      classified(baseBoth(spark), mvMismatchRow2(spark), s), baseSchema, mvSchema, s)
    val rows = plan.collect()
    // Only c4 differs (44 vs 441); c2/c3 equal → skipped.
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("column") == "c4" &&
      rows(0).getAs[String]("value") == "44")
  }

  test("fixorphanmv: DELETE of the orphan MV key") {
    val s = Settings(fixOrphanMv = true)
    val plan = RepairPlanner.plan(
      classified(baseMissingRow2(spark), mvBoth(spark), s), baseSchema, mvSchema, s)
    val rows = plan.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("op") == "DELETE")
    assert(rows(0).getAs[String]("pk") == "Driver2")
  }

  test("uselatestts suppresses the timestamp but keeps flavor logic") {
    val s = Settings(fixMissingMv = true, useLatestTs = true)
    val plan = RepairPlanner.plan(
      classified(baseBoth(spark), mvMissingRow2(spark), s), baseSchema, mvSchema, s)
    val rows = plan.collect()
    assert(rows.forall(_.getAs[String]("flavor") == RepairPlanner.NoTimestampTtl))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("writetime"))))
  }

  test("read-before-delete guard drops keys that reappeared in base") {
    val s = Settings(fixOrphanMv = true)
    val plan = RepairPlanner.plan(
      classified(baseMissingRow2(spark), mvBoth(spark), s), baseSchema, mvSchema, s)
    // Fresh base read where Driver2 is back:
    val guarded = RepairPlanner.verifyDeletesAgainst(plan, baseBoth(spark), mvSchema.sortedPk)
    assert(guarded.filter(col("op") === "DELETE").count() == 0)
  }
}
