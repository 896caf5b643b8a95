package graft.streaming

import graft.reconcile.MvReconciler
import graft.schema.TableSchema
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Continuous MV consistency monitor: the reference's batch
 * reconciliation semantics (full-outer compare → 4-way classify →
 * first-mismatch diff, MvSync.java:286-378,481-510) re-expressed over
 * CHANGE FEEDS with Structured Streaming — a capability the reference
 * job can only approximate by re-running from scratch.
 *
 * Design (scale-first):
 *  - Each side's stream of row images is projected to
 *    `(key, side, canon, disp)` where `canon`/`disp` are
 *    column-name→rendered-string maps built with the SAME Catalyst
 *    expressions as the batch path ([[MvReconciler.canonical]] /
 *    [[MvReconciler.renderValueOrNull]]) — set/map sort
 *    canonicalization, blob UTF-8, epoch-millis timestamps. The
 *    per-type diff semantics live in ONE place; the stateful operator
 *    only compares rendered strings.
 *  - `union` → `groupByKey(MV PK)` → [[org.apache.spark.sql.KeyValueGroupedDataset.mapGroupsWithState]]:
 *    state per key = the latest image of each side (two small string
 *    maps). Every change re-classifies the key and emits an update with
 *    a monotonically increasing per-key `seq`.
 *  - At 100 TB the state shards across executors on the PK shuffle
 *    (RocksDB state store in production), per-batch work is
 *    proportional to CHANGED keys — not table size — and idle keys can
 *    be evicted with an event-time timeout once both sides have
 *    settled. The replay spec uses NoTimeout (a finite replay never
 *    quiesces under timer-based timeouts).
 *
 * Time-scope filtering (operator F) is intentionally absent: it is a
 * batch-window concern; the monitor always classifies current images.
 *
 * Verified by StreamingReconSpec: replaying the all-types fixture
 * converges to EXACTLY the oracle-green batch
 * `recon_classify_alltypes` classification, then an appended MV
 * correction batch flips only the corrected key.
 */
object StreamingReconciler {

  /** One side's current knowledge: the latest-version image, or a
   * tombstone (`present = false`) that REMEMBERS its version so a
   * stale pre-delete image arriving late cannot resurrect the side.
   * `version` is the CDC change ordinal (LSN / cell writetime — 0 when
   * the feed carries no `_version` column). */
  final case class SideImage(canon: Map[String, String], disp: Map[String, String],
      version: Long, present: Boolean)

  final case class ChangeRecord(key: String, side: String,
      canon: Map[String, String], disp: Map[String, String],
      version: Long, deleted: Boolean)

  final case class KeyState(base: Option[SideImage], mv: Option[SideImage], seq: Long)

  final case class ReconUpdate(key: String, seq: Long, problem: String,
      mismatch_col: Option[String], mismatch_base: Option[String],
      mismatch_mv: Option[String])

  /** Project one side's (streaming or batch) row-image feed into the
   * change-record shape. `pk` is the MV primary key (both sides key by
   * it, reference MvSync.java:248-257,512-521).
   *
   * Optional CDC columns, honored when present in the feed:
   *  - `_version` (long): per-key+side change ordinal (LSN / cell
   *    writetime). Higher version wins regardless of arrival order —
   *    without it, arrival order decides (fine for snapshot replays;
   *    real change feeds should carry it).
   *  - `_deleted` (boolean): tombstone — clears the side's image, so a
   *    deleted base row re-classifies its MV row as an orphan
   *    (MISSING_IN_BASE_TABLE) instead of pinning the stale image. */
  def imaged(df: DataFrame, schema: TableSchema, pk: Seq[String],
      common: Seq[String], side: String): Dataset[ChangeRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    val key = concat_ws("|", pk.sorted.map(c =>
      MvReconciler.renderValue(col(c), schema.cqlType(c))): _*)
    val canonEntries = common.flatMap { c =>
      Seq(lit(c), MvReconciler.renderValueOrNull(
        MvReconciler.canonical(col(c), schema.cqlType(c)), schema.cqlType(c)))
    }
    val dispEntries = common.flatMap { c =>
      Seq(lit(c), MvReconciler.renderValueOrNull(col(c), schema.cqlType(c)))
    }
    val version =
      if (df.columns.contains("_version")) col("_version").cast("long") else lit(0L)
    val deleted =
      if (df.columns.contains("_deleted"))
        coalesce(col("_deleted").cast("boolean"), lit(false))
      else lit(false)
    df.select(
      key.as("key"), lit(side).as("side"),
      map(canonEntries: _*).as("canon"),
      map(dispEntries: _*).as("disp"),
      version.as("version"), deleted.as("deleted")).as[ChangeRecord]
  }

  /** Classify the current pair of images — the reference's 4-way case +
   * first mismatch in sorted-name order (MvSync.java:349-378,481-510);
   * null-safe cell equality via the rendered canonical strings
   * ((null,null) equal, one-sided null a mismatch). */
  private def classify(key: String, st: KeyState, common: Seq[String]): ReconUpdate =
    (st.base.filter(_.present), st.mv.filter(_.present)) match {
      case (None, Some(_)) =>
        ReconUpdate(key, st.seq, MvReconciler.MissingInBase, None, None, None)
      case (Some(_), None) =>
        ReconUpdate(key, st.seq, MvReconciler.MissingInMv, None, None, None)
      case (Some(b), Some(m)) =>
        common.find(c => b.canon.get(c).orNull != m.canon.get(c).orNull) match {
          case Some(c) => ReconUpdate(key, st.seq, MvReconciler.Inconsistent,
            Some(c), Option(b.disp.get(c).orNull), Option(m.disp.get(c).orNull))
          case None =>
            ReconUpdate(key, st.seq, MvReconciler.Consistent, None, None, None)
        }
      case (None, None) =>
        // both sides deleted (or never present): trivially consistent —
        // the key has settled; production deployments evict it with an
        // event-time timeout, the tombstone versions stay until then
        ReconUpdate(key, st.seq, MvReconciler.Consistent, None, None, None)
    }

  /**
   * The monitor: unioned base+MV change feeds → per-key classification
   * updates. Emits one [[ReconUpdate]] per key per micro-batch in which
   * the key changed; downstream takes max(`seq`) per key for current
   * state. Works identically on batch inputs (the spec's equivalence
   * check runs it both ways).
   */
  def monitor(baseChanges: DataFrame, mvChanges: DataFrame,
      baseSchema: TableSchema, mvSchema: TableSchema): Dataset[ReconUpdate] = {
    val spark = baseChanges.sparkSession
    import spark.implicits._
    val pk = mvSchema.sortedPk
    val common = TableSchema.commonRegular(baseSchema, mvSchema)
    val changes = imaged(baseChanges, baseSchema, pk, common, "base")
      .unionByName(imaged(mvChanges, mvSchema, pk, common, "mv"))

    changes.groupByKey(_.key).mapGroupsWithState(GroupStateTimeout.NoTimeout) {
      (key: String, rows: Iterator[ChangeRecord], state: GroupState[KeyState]) =>
        val prev = state.getOption.getOrElse(KeyState(None, None, 0L))
        // last-writer-wins BY VERSION per side: a record applies only if
        // its version is >= the held image's (tombstones included), so
        // out-of-order delivery — across partitions in a batch, or a
        // late batch — can never regress the state to a stale image or
        // resurrect a deleted row. With no _version column all versions
        // are 0 and arrival order decides (snapshot replays).
        def apply(cur: Option[SideImage], r: ChangeRecord): Option[SideImage] =
          if (cur.exists(_.version > r.version)) cur
          else Some(SideImage(r.canon, r.disp, r.version, !r.deleted))
        val next = rows.foldLeft(prev) { (st, r) =>
          if (r.side == "base") st.copy(base = apply(st.base, r))
          else st.copy(mv = apply(st.mv, r))
        }.copy(seq = prev.seq + 1)
        state.update(next)
        classify(key, next, common)
    }
  }
}
