package graft.repair

import graft.schema.TableSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/**
 * Applies a [[RepairPlanner]] mutation plan to an MV DataFrame — the
 * offline analogue of the reference's executor-side CQL writes
 * (DBOperations.java:58-94 deletes, :240-387 per-column upserts), kept as
 * a pure transform so repair round-trips are testable end-to-end without
 * a live cluster: reconcile → plan → apply → reconcile must converge to
 * all-CONSISTENT.
 *
 * Mechanics (ONE aggregation of the plan on the MV PK + ONE full-outer
 * merge — r11 fused the former separate delete anti-join into the merge,
 * dropping one full-MV-wide join from the plan):
 *  - the plan pivots per key to (delete?, mutation map) in one groupBy
 *    (a key is never both: deletes come from ORPHAN keys, upserts from
 *    MISSING/INCONSISTENT — disjoint classifications);
 *  - DELETE-marked keys drop their MV row in the merge's post-filter
 *    (the reference's point-delete);
 *  - UPSERT maps apply per column: each MV regular column takes the
 *    upserted value (with its writetime/ttl) when present, else keeps
 *    the existing cell — exactly the reference's per-column INSERT
 *    semantics, including untouched columns surviving on INCONSISTENT
 *    rows (shouldSkipField skips equal columns, so they never appear in
 *    the plan).
 *
 * At 100 TB the plan is proportional to the damage, not the table — the
 * merge joins a (typically tiny, broadcast-able) upsert side against the
 * MV.
 *
 * Exactly-once posture: applying the same plan twice is a no-op — the
 * reference is equally exposed to task retries re-issuing mutations
 * (SURVEY §7.4) and mitigates with naturally-idempotent timestamped
 * upserts (DBOperations.java:250-275 replays the same cell timestamp)
 * plus read-before-delete (DBOperations.java:61-70); here the upsert
 * merge sets the same cells to the same (value, writetime, ttl) and a
 * retried DELETE left-anti-joins a key that is already gone. Asserted
 * by the double-apply spec in RepairPlannerSpec. Planner-side, the
 * delete race guard is [[RepairPlanner.verifyDeletesAgainst]].
 */
object RepairApplier {

  /** Inverse of [[graft.reconcile.MvReconciler.renderValue]] for the
   * repairable types: plan values travel as rendered strings (the report
   * encoding); cast them back to the MV column's Spark type. */
  private def unrender(c: Column, cqlType: String, target: DataType): Column = {
    val t = cqlType.toUpperCase
    if (t.startsWith("TIMESTAMP")) timestamp_millis(c.cast("long"))
    else if (t.startsWith("BLOB")) c.cast("binary")
    else if (t.startsWith("LIST") || t.startsWith("SET") || t.startsWith("MAP"))
      from_json(c, target)
    else c.cast(target)
  }

  def applyPlan(mv: DataFrame, plan: DataFrame, mvSchema: TableSchema): DataFrame = {
    val pk = mvSchema.sortedPk
    val pkCols = pk.map(col)

    // one damage-proportional aggregate serves both ops: collect_list
    // skips the null structs DELETE rows produce, so a delete key
    // carries an empty mutation map plus the _del flag. The merge below
    // drops _del keys outright, discarding any upsert the same key
    // hypothetically carried — sound because plan ops are DISJOINT per
    // key (pinned by the op-disjointness spec in RepairPlannerSpec)
    val byKey = plan
      .groupBy(pkCols: _*)
      .agg(
        max(col("op") === "DELETE").as("_del"),
        map_from_entries(collect_list(when(col("op") === "UPSERT", struct(
          col("column"),
          struct(col("value"), col("writetime"), col("ttl")))))).as("_mut"))

    val merged = mv.join(byKey, pk, "full_outer")
      // DELETE keys (and any plan-only row with nothing to upsert) drop
      // here — the fused replacement for the former left-anti join
      .filter(!coalesce(col("_del"), lit(false)))

    val outCols: Seq[Column] = pkCols ++ mvSchema.sortedRegular.flatMap { c =>
      val mut = col("_mut").getItem(c)
      val dataCol = when(mut.isNotNull,
        unrender(mut.getField("value"), mvSchema.cqlType(c),
          mv.schema(c).dataType))
        .otherwise(col(c)).as(c)
      if (mvSchema.isCollection(c)) Seq(dataCol)
      else Seq(
        dataCol,
        when(mut.isNotNull, mut.getField("writetime"))
          .otherwise(col(mvSchema.writetimeCol(c)))
          .as(mvSchema.writetimeCol(c)),
        when(mut.isNotNull, mut.getField("ttl"))
          .otherwise(col(mvSchema.ttlCol(c)))
          .as(mvSchema.ttlCol(c)))
    }
    merged.select(outCols: _*)
  }
}
