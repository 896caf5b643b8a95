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
 *    proportional to CHANGED keys — not table size — and
 *    [[monitorEvicting]] bounds state to the actively-changing key set
 *    via event-time timeouts. The plain [[monitor]] uses NoTimeout
 *    (finite replays never quiesce under timer-based timeouts —
 *    replay specs use it).
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
      version: Long, deleted: Boolean, eventTs: java.sql.Timestamp)

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
   *    writetime). Higher version wins regardless of arrival order;
   *    exact version ties break deterministically (see [[beats]] and the
   *    merge in [[monitor]]). Without it all versions are 0 and the
   *    newest BATCH's (deterministically reduced) image wins — snapshot
   *    replay semantics.
   *  - `_deleted` (boolean): tombstone — clears the side's image, so a
   *    deleted base row re-classifies its MV row as an orphan
   *    (MISSING_IN_BASE_TABLE) instead of pinning the stale image.
   *  - `_event_ts` (timestamp): the change's event time — required by
   *    [[monitorEvicting]] (0 when absent). */
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
    // the RAW attribute, plain-aliased: a cast/function would strip the
    // watermark metadata the event-time-timeout analyzer checks for, so
    // evicting feeds must supply `_event_ts` as TimestampType already
    val eventTs =
      if (df.columns.contains("_event_ts")) col("_event_ts")
      else lit(null).cast("timestamp")
    df.select(
      key.as("key"), lit(side).as("side"),
      map(canonEntries: _*).as("canon"),
      map(dispEntries: _*).as("disp"),
      version.as("version"), deleted.as("deleted"),
      eventTs.as("eventTs")).as[ChangeRecord]
  }

  /** Deterministic string form of an image for version-tie comparison:
   * sorted column entries, null-safe. */
  private def canonKey(si: SideImage): String =
    si.canon.toSeq.sortBy(_._1)
      .map { case (k, v) => k + "=" + String.valueOf(v) }.mkString("")

  /** Strict total order on a side's images: higher version wins; on an
   * exact version tie a tombstone beats a write (Cassandra's rule for
   * deletes at the same timestamp), and between two writes the lexically
   * larger canonical image wins (Cassandra breaks write-timestamp ties
   * by value). Taking the max under this order is associative and
   * commutative, so the final state cannot depend on delivery order. */
  private def beats(inc: SideImage, cur: SideImage): Boolean =
    if (inc.version != cur.version) inc.version > cur.version
    else if (inc.present != cur.present) !inc.present
    else canonKey(inc) > canonKey(cur)

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
        val next = mergeBatch(
          state.getOption.getOrElse(KeyState(None, None, 0L)), rows.toSeq)
        state.update(next)
        classify(key, next, common)
    }
  }

  /** Terminal problem value emitted when an idle key's state is evicted
   * ([[monitorEvicting]]); downstream max-seq compaction drops the key. */
  val Evicted = "EVICTED"

  /**
   * [[monitor]] with BOUNDED state — the 100 TB deployment shape: a key
   * whose feeds have been silent for `idleRetentionMs` of EVENT time
   * past the watermark has settled (both sides' changes for it have
   * arrived), so its state is removed and a terminal [[Evicted]] update
   * emitted. State size then tracks the ACTIVELY-CHANGING key set, not
   * the table's key count.
   *
   * Requirements: both feeds carry `_event_ts` and the caller applies
   * `withWatermark("_event_ts", ...)` to each BEFORE passing them in
   * (event-time timeouts need a watermark). The union's watermark is
   * the MIN of the two feeds' — a stalled feed stalls eviction, it
   * never causes premature eviction. Late records for an evicted key
   * re-create its state and re-classify from the images at hand — the
   * retention is the trade against that re-derivation, exactly as with
   * any watermark-bounded stateful operator.
   *
   * `seq` here is EVENT-TIME-ANCHORED (max of the running counter and
   * the key's newest event millis), so it survives eviction: the
   * terminal [[Evicted]] update carries `seq = lastSeq + retention`
   * (the key's eviction deadline), and any FRESH (above-watermark)
   * record that re-creates the state necessarily anchors above it —
   * re-activations out-rank the stale EVICTED row under downstream
   * max-seq compaction. Only records BELOW the eviction horizon
   * (event time ≤ last activity + retention, i.e. genuinely late past
   * the eviction) stay compacted behind the EVICTED marker, which is
   * the documented retention trade.
   */
  def monitorEvicting(baseChanges: DataFrame, mvChanges: DataFrame,
      baseSchema: TableSchema, mvSchema: TableSchema,
      idleRetentionMs: Long): Dataset[ReconUpdate] = {
    require(idleRetentionMs > 0, "idleRetentionMs must be positive (the" +
      " EVICTED seq = lastSeq + retention must out-rank the last update)")
    val spark = baseChanges.sparkSession
    import spark.implicits._
    val pk = mvSchema.sortedPk
    val common = TableSchema.commonRegular(baseSchema, mvSchema)
    val changes = imaged(baseChanges, baseSchema, pk, common, "base")
      .unionByName(imaged(mvChanges, mvSchema, pk, common, "mv"))

    changes.groupByKey(_.key).mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
      (key: String, rows: Iterator[ChangeRecord], state: GroupState[KeyState]) =>
        if (state.hasTimedOut) {
          val seq = state.getOption.map(_.seq).getOrElse(0L)
          state.remove()
          // the eviction's logical event time: the deadline that fired.
          // seq is event-time-anchored (>= the key's newest event ms),
          // so any fresh record re-creating the state arrives with
          // event_ts >= watermark > this value and out-ranks it
          ReconUpdate(key, seq + idleRetentionMs, Evicted, None, None, None)
        } else {
          val rs = rows.toSeq
          val merged = mergeBatch(
            state.getOption.getOrElse(KeyState(None, None, 0L)), rs)
          val newest = rs.map(r => Option(r.eventTs).map(_.getTime).getOrElse(0L)).max
          // anchor seq to event time so it survives eviction (state is
          // gone after remove(); a plain counter would restart at 1 and
          // the stale EVICTED emission would shadow every later update)
          val next = merged.copy(seq = math.max(merged.seq, newest))
          state.update(next)
          // idle deadline = newest activity for this key + retention; the
          // max with watermark+1 keeps a late (below-watermark) record
          // from setting an already-expired deadline, which Spark rejects
          state.setTimeoutTimestamp(math.max(
            next.seq + idleRetentionMs,
            state.getCurrentWatermarkMs() + 1))
          classify(key, next, common)
        }
    }
  }

  /** Per-key micro-batch merge — last-writer-wins BY VERSION per side,
   * deterministic at every tie point:
   *  1. WITHIN a micro-batch, records arrive in partition order —
   *     nondeterministic — so the batch is first reduced to its MAX
   *     image under the strict total order [[beats]] (higher version;
   *     on an exact version tie Cassandra's rules: a tombstone beats a
   *     write, between writes the lexically larger image wins). Max is
   *     associative/commutative, so the reduction cannot depend on
   *     arrival order.
   *  2. ACROSS batches, higher version wins and an exact VERSIONED tie
   *     resolves by the same [[beats]] order as within a batch — two
   *     same-version records (e.g. a tombstone and a write at one
   *     writetime) converge on the identical winner no matter how the
   *     feed splits them across micro-batches, preserving the
   *     delivery-order-independence guarantee. Only the VERSIONLESS
   *     mode (all versions 0 — snapshot replays with no `_version`
   *     column) keeps newest-batch-wins, so successive full snapshots
   *     converge on the latest batch's image; there the batch sequence
   *     is the ordering, durable in Structured Streaming's offset log,
   *     and crash-replays repeat the identical merge. */
  private[streaming] def mergeBatch(prev: KeyState, rs: Seq[ChangeRecord]): KeyState = {
    def img(r: ChangeRecord) = SideImage(r.canon, r.disp, r.version, !r.deleted)
    def batchMax(recs: Seq[ChangeRecord]): Option[SideImage] =
      recs.map(img).reduceOption((a, b) => if (beats(b, a)) b else a)
    def merge(held: Option[SideImage], inc: Option[SideImage]): Option[SideImage] =
      (held, inc) match {
        case (Some(h), Some(i)) =>
          val incWins =
            if (i.version != h.version) i.version > h.version
            else if (i.version == 0L) true // versionless snapshot replay
            else beats(i, h)
          Some(if (incWins) i else h)
        case _ => inc.orElse(held)
      }
    val (baseRecs, mvRecs) = rs.partition(_.side == "base")
    KeyState(
      merge(prev.base, batchMax(baseRecs)),
      merge(prev.mv, batchMax(mvRecs)),
      prev.seq + 1)
  }
}
