package graft.sources

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.types._

/**
 * DataSource V2 WRITE path for [[GraftParquetProvider]] — the mutation
 * half of the connector seam. The reference's repair path binds CQL
 * DELETE/UPSERT statements against the live cluster
 * (DBOperations.java:58-194,240-387); a Spark-native connector serves
 * that surface through exactly this API: Catalyst's `V2Writes` rule
 * resolves `df.write.format(...).mode(...)` into an `AppendData` /
 * `OverwriteByExpression` node whose physical plan drives a
 * [[DataWriter]] per task. Swapping the data plane from parquet-group
 * writes to CQL batch mutations changes nothing above
 * [[GraftParquetWriterFactory.createWriter]].
 *
 * Commit protocol (the part a file-based sink genuinely needs and a
 * CQL sink replaces with idempotent writes): every task writes to
 * `path/_staging-<queryId>/` — a `_`-prefixed directory [[Dsv2Parquet
 * .dataFiles]] never lists, so concurrent readers cannot observe
 * uncommitted rows. Task commit closes the file and reports it in the
 * [[GraftParquetCommitMessage]]; job [[GraftParquetBatchWrite.commit]]
 * renames exactly the files named by the messages into `path` (a retry
 * or speculative attempt whose message never reached the driver leaves
 * only invisible staging garbage, removed with the staging dir). Job
 * [[GraftParquetBatchWrite.abort]] deletes the staging dir — committed
 * data is untouched by a failed write. TRUNCATE (mode=overwrite) moves
 * the previously committed files into a `_trash-<queryId>` directory
 * (invisible to the listing) before the staged renames and drops the
 * trash only after every rename succeeded — a driver crash mid-commit
 * leaves the old table recoverable from the trash, never an empty
 * directory.
 *
 * Scale shape: one output file per non-empty task partition, written
 * through parquet's buffered page writer — no driver-side data, no
 * global coordination beyond the O(#tasks) commit-message rename loop.
 */
private[sources] case class GraftParquetWriteBuilder(path: String,
    info: LogicalWriteInfo)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite {
  private var truncateFirst = false
  private var overwriteFilters: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  /** FILTER-scoped overwrite (`INSERT OVERWRITE … WHERE` /
   * `writeTo(t).overwrite(cond)`): accepted only when footer
   * statistics PROVE the predicate file-aligned — every data file
   * either all-matches (replaced) or none-matches (kept), the same
   * metadata-proof posture as DELETE WHERE. `canOverwrite` is the
   * planning-time probe, so an unprovable predicate fails the
   * statement up front instead of mid-commit. mode=overwrite arrives
   * as OverwriteByExpression(AlwaysTrue) → plain truncate. */
  override def canOverwrite(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(_ == org.apache.spark.sql.sources.AlwaysTrue()) ||
      Dsv2Parquet.deleteDecisions(path, filters).isDefined

  override def overwrite(
      filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
    if (filters.forall(_ == org.apache.spark.sql.sources.AlwaysTrue()))
      truncateFirst = true
    else overwriteFilters = filters
    this
  }

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write
      with RequiresDistributionAndOrdering {
    private def cols(key: String): Array[String] =
      Option(info.options().get(key))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty))
        .getOrElse(Array.empty)
    private val orderBy = cols(Dsv2Parquet.OrderByOption)
    private val clusterBy = cols(Dsv2Parquet.ClusterByOption)
    private val sortWithin = cols(Dsv2Parquet.SortWithinOption)
    require(orderBy.isEmpty || clusterBy.isEmpty,
      "graft-parquet: orderBy and clusterBy are mutually exclusive")
    require(sortWithin.isEmpty || clusterBy.nonEmpty,
      "graft-parquet: sortWithin requires clusterBy")

    /** SINK-REQUESTED distribution — the V2 contract a live sink uses
     * to make SPARK shuffle for it (a Cassandra writer clusters by
     * token so each task batches mutations per replica set; an
     * Iceberg writer orders globally for clustered data files):
     * `graft.orderBy` demands a RANGE exchange + in-partition sort
     * (output files carry disjoint sorted key ranges — verifiable
     * from their footers), `graft.clusterBy` a hash exchange (one
     * key never straddles two tasks' files). The sink declares WHAT
     * it needs; Catalyst plans the exchange. */
    override def requiredDistribution()
        : org.apache.spark.sql.connector.distributions.Distribution = {
      import org.apache.spark.sql.connector.distributions.Distributions
      if (orderBy.nonEmpty) Distributions.ordered(requiredOrdering())
      else if (clusterBy.nonEmpty) Distributions.clustered(
        clusterBy.map(c => Expressions.column(c)
          : org.apache.spark.sql.connector.expressions.Expression))
      else Distributions.unspecified()
    }

    override def requiredOrdering()
        : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
      (if (orderBy.nonEmpty) orderBy else sortWithin)
        .map(c => Expressions.sort(Expressions.column(c),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))

    /** `graft.numPartitions`: exact task count for the sink-demanded
     * exchange (a Cassandra sink sizes this to its replica/batch
     * topology). A strict requirement — AQE cannot coalesce it away. */
    override def requiredNumPartitions(): Int =
      Option(info.options().get(Dsv2Parquet.NumPartitionsOption))
        .map(_.toInt).getOrElse(0)

    override def toBatch: BatchWrite =
      GraftParquetBatchWrite(path, info.schema(), info.queryId(), truncateFirst,
        clusterBy, requiredNumPartitions(), sortWithin, overwriteFilters,
        cols(Dsv2Parquet.BloomForOption),
        Option(info.options().get(Dsv2Parquet.BloomNdvOption))
          .map(_.toLong).getOrElse(0L))
    override def toStreaming: StreamingWrite =
      GraftParquetStreamingWrite(path, info.schema(), info.queryId(),
        truncateFirst)
  }
}

/** Per-task output: the staged file (None for an empty partition — no
 * zero-row files) and its row count, summed into the probe at commit. */
private[sources] case class GraftParquetCommitMessage(file: Option[String],
    rows: Long) extends WriterCommitMessage

private[sources] case class GraftParquetBatchWrite(path: String,
    schema: StructType, queryId: String, truncateFirst: Boolean,
    clusterBy: Array[String] = Array.empty, numPartitions: Int = 0,
    sortWithin: Array[String] = Array.empty,
    overwriteFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    bloomFor: Array[String] = Array.empty,
    bloomNdv: Long = 0L)
    extends BatchWrite {

  private val stagingDir = s"$path/_staging-$queryId"

  /** Maintain the clustering sidecar AFTER the data renames: a
   * clustered fixed-width commit declares (or re-declares) the layout;
   * any commit that breaks the every-file-is-one-bucket invariant —
   * unclustered append, or a re-cluster whose columns/width differ
   * from the declared ones on a non-truncating append — retracts it.
   * Written atomically (temp + rename over), same discipline as the
   * catalog DDL. */
  private def maintainClustering(fs: org.apache.hadoop.fs.FileSystem,
      committed: Set[String]): Unit = {
    val sidecar = new Path(path, Dsv2Parquet.ClusteringFileName)
    def desc(cols: Array[String], n: Int, sort: Array[String]): String =
      cols.mkString(",") + "\n" + n +
        (if (sort.nonEmpty) "\n" + sort.mkString(",") else "") + "\n"
    val declared: Option[String] =
      if (clusterBy.nonEmpty && numPartitions > 0)
        Some(desc(clusterBy, numPartitions, sortWithin))
      else None
    val existing: Option[String] =
      if (truncateFirst) None
      else Dsv2Parquet.clustering(path, Dsv2Parquet.readConf)
        .map { case (cols, n, sort) => desc(cols, n, sort) }
    // pre-existing data the commit did NOT write: a clustered append
    // beside it may only declare when those files already carry the
    // same declared layout
    def tableWasEmpty: Boolean =
      Dsv2Parquet.dataFiles(path, Dsv2Parquet.readConf)
        .forall(f => committed(f.getPath.getName))
    declared match {
      case Some(desc) if truncateFirst || existing.contains(desc) ||
          tableWasEmpty =>
        // declare: truncate replaced everything; or the append extends
        // the identical declared layout; or this commit created the
        // table's first files
        val tmp = new Path(path,
          s"${Dsv2Parquet.ClusteringFileName}.tmp-${UUID.randomUUID()}")
        val out = fs.create(tmp, true)
        try out.write(desc.getBytes("UTF-8")) finally out.close()
        if (fs.exists(sidecar)) fs.delete(sidecar, false)
        require(fs.rename(tmp, sidecar),
          s"graft-parquet commit: clustering sidecar rename failed")
      case _ =>
        // retract: the directory no longer has a single declared layout
        if (fs.exists(sidecar)) fs.delete(sidecar, false): Unit
    }
  }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    GraftParquetWriterFactory(stagingDir, schema, bloomFor, bloomNdv)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val t0 = System.nanoTime()
    val conf = Dsv2Parquet.readConf
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val staged = messages.collect {
      case GraftParquetCommitMessage(Some(f), _) => new Path(f)
    }
    // verify every reported file actually exists BEFORE any destructive
    // step — a missing staged file fails the job with old data intact
    staged.foreach(f => require(fs.isFile(f),
      s"graft-parquet commit: staged file missing: $f"))
    if (CommitLog.enabled(path, conf)) {
      // COMMIT-LOGGED table: files retire LOGICALLY — the staged
      // renames land invisibly (no manifest references them yet), and
      // ONE CAS manifest publish is the commit point. Replaced files
      // stay on disk for time travel until expire_snapshots. Losing
      // the CAS re-reads the new base: appends commute (retry);
      // truncate/overwrite recompute their removal set against the
      // new state (overwrite-wins semantics, re-proved per attempt).
      staged.foreach { f =>
        val dst = new Path(target, f.getName)
        require(fs.rename(f, dst),
          s"graft-parquet commit: rename $f -> $dst failed")
      }
      val stagedNames = staged.map(_.getName).toSet
      var removedCount = 0
      CommitLog.commitUpdate(path, conf,
        operation = if (truncateFirst) "truncate"
          else if (overwriteFilters.nonEmpty) "overwrite" else "append"
      ) { cur =>
        val removedNames: Set[String] =
          if (truncateFirst) cur.dataFiles
          else if (overwriteFilters.nonEmpty)
            Dsv2Parquet.deleteDecisions(path, overwriteFilters).getOrElse(
              throw new IllegalStateException(
                "graft-parquet overwrite: the predicate is no longer " +
                  s"file-aligned (${overwriteFilters.mkString(", ")}) — " +
                  "a file changed between planning and commit"))
              ._1.map(_.getName).toSet
          else Set.empty[String]
        removedCount = removedNames.size
        val remaining = cur.dataFiles -- removedNames
        Some(cur.copy(
          dataFiles = remaining ++ stagedNames,
          dvFiles = cur.dvFiles.filterNot(v =>
            Dsv2Parquet.dvTarget(v).exists(removedNames.contains)),
          // a truncate retires every file an equality delete could
          // target, and an overwrite may retire a sidecar's LAST live
          // target — either way the orphaned sidecar is dead weight
          // that would pin the row-path probe forever (no live target
          // left for compact_table to fold) and wedge row-level ops
          // behind the fold-first guard
          eqFiles =
            if (truncateFirst) Set.empty
            else if (removedNames.isEmpty) cur.eqFiles
            else cur.eqFiles.filter(n =>
              Dsv2Equality.read(new Path(path), n, conf)
                .targets.exists(remaining.contains))))
      }
      fs.delete(new Path(stagingDir), true)
      maintainClustering(fs, stagedNames)
      Dsv2WriteProbe.forPath(path).lastTruncated.set(removedCount)
      Dsv2WriteProbe.forPath(path).lastCommittedFiles.set(staged.length)
      Dsv2WriteProbe.forPath(path).lastCommittedRows.set(messages.collect {
        case GraftParquetCommitMessage(_, n) => n
      }.sum)
      Dsv2WriteProbe.forPath(path).lastCommitMillis.set(
        (System.nanoTime() - t0) / 1000000L)
      return
    }
    // overwrite: the old files move ASIDE (into a `_`-prefixed trash
    // directory the listing never shows) rather than being deleted, so
    // a driver crash between here and the staged renames leaves the
    // previous table recoverable from the trash instead of empty; the
    // trash drops only after every staged rename succeeded
    // what the overwrite removes: everything (truncate), or exactly
    // the files footer statistics PROVE all-match the overwrite
    // predicate (re-proved against the files present NOW — a file
    // landed since planning makes the commit fail with old data
    // intact, never guess)
    val removing: Array[Path] =
      if (truncateFirst) Dsv2Parquet.dataFiles(path, conf).map(_.getPath)
      else if (overwriteFilters.nonEmpty)
        Dsv2Parquet.deleteDecisions(path, overwriteFilters).getOrElse(
          throw new IllegalStateException(
            "graft-parquet overwrite: the predicate is no longer " +
              s"file-aligned (${overwriteFilters.mkString(", ")}) — " +
              "a file changed between planning and commit"))._1
      else Array.empty
    Dsv2WriteProbe.forPath(path).lastTruncated.set(removing.length)
    val trash: Option[Path] =
      if (removing.isEmpty) None
      else {
        val t = new Path(path, s"_trash-$queryId")
        fs.mkdirs(t)
        removing.foreach { f =>
          require(fs.rename(f, new Path(t, f.getName)),
            s"graft-parquet commit: trash move of $f failed")
        }
        // an overwritten file's deletion vectors die with it
        Dsv2Parquet.deleteDvsFor(fs, new Path(path), removing.map(_.getName))
        Some(t)
      }
    staged.foreach { f =>
      val dst = new Path(target, f.getName)
      require(fs.rename(f, dst),
        s"graft-parquet commit: rename $f -> $dst failed")
    }
    trash.foreach(fs.delete(_, true))
    fs.delete(new Path(stagingDir), true)
    maintainClustering(fs, staged.map(_.getName).toSet)
    Dsv2WriteProbe.forPath(path).lastCommittedFiles.set(staged.length)
    Dsv2WriteProbe.forPath(path).lastCommittedRows.set(messages.collect {
      case GraftParquetCommitMessage(_, n) => n
    }.sum)
    Dsv2WriteProbe.forPath(path).lastCommitMillis.set((System.nanoTime() - t0) / 1000000L)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = Dsv2Parquet.readConf
    val fs = new Path(stagingDir).getFileSystem(conf)
    fs.delete(new Path(stagingDir), true)
  }
}

/**
 * Streaming (micro-batch) write — the sink half of a streaming
 * connector. Same staging discipline as the batch write, PER EPOCH:
 * each micro-batch stages under `path/_staging-<queryId>-e<epochId>`,
 * and epoch commit is IDEMPOTENT through a marker file under
 * `path/_epochs/` whose atomic creation (temp + rename) IS the commit
 * point. The marker is written BEFORE any staged file becomes visible
 * and records the epoch's deterministic destination names, so every
 * crash window reconciles:
 *
 *  - crash before the marker: nothing committed, nothing visible; the
 *    replayed epoch re-stages and commits from scratch;
 *  - crash after the marker, before/among the renames: the replay reads
 *    the marker's ledger and renames its re-staged files onto exactly
 *    the missing destination names (micro-batch recomputation is
 *    deterministic — same offsets, same partitioning — the premise
 *    Spark's own file sink rests on); already-present destinations are
 *    left untouched, so nothing commits twice;
 *  - replay of a fully committed epoch: every ledger name exists, the
 *    re-staged files are dropped.
 *
 * This is file-visibility exactly-once, the property a CQL sink gets
 * from idempotent mutations and a file sink must build from a ledger
 * (Spark's own file sink keeps the same ledger in _spark_metadata).
 * Markers are garbage-collected past [[GraftParquetStreamingWrite
 * .MarkerRetain]] epochs behind the latest — once the checkpoint has
 * advanced that far, the purged epochs can never be replayed — so a
 * long-running stream's directory listing stays flat. `truncate`
 * (outputMode = complete) replaces the committed snapshot each epoch,
 * so the directory always holds exactly the latest aggregate state.
 *
 * On a COMMIT-LOGGED table each epoch additionally publishes one
 * manifest version after its renames (the files are invisible until
 * then), and complete-mode replacement is LOGICAL — prior epochs stay
 * on disk for time travel until expire_snapshots. Epoch replays stay
 * idempotent: deterministic destination names re-union (append) or
 * re-pin (complete) the manifest to the identical state.
 */
private[sources] case class GraftParquetStreamingWrite(path: String,
    schema: StructType, queryId: String, truncateFirst: Boolean)
    extends StreamingWrite {
  import GraftParquetStreamingWrite.MarkerRetain

  private def stagingDir(epochId: Long) = s"$path/_staging-$queryId-e$epochId"
  private def epochsDir = new Path(path, "_epochs")
  private def marker(epochId: Long) =
    new Path(epochsDir, s"epoch-$queryId-$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        new GraftParquetDataWriter(stagingDir(epochId), schema,
          partitionId, taskId)
    }

  /** The ledger: one destination file name per line, created atomically
   * (temp + rename) so a reader never observes a torn marker. */
  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
      epochId: Long, dsts: Array[Path]): Unit = {
    fs.mkdirs(epochsDir)
    val tmp = new Path(epochsDir,
      s"epoch-$queryId-$epochId.tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(dsts.map(_.getName).mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, marker(epochId)),
      s"graft-parquet epoch $epochId: marker rename failed")
  }

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      epochId: Long): Array[Path] = {
    val in = fs.open(marker(epochId))
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
      bos.toString("UTF-8")
    } finally in.close()
    text.split("\n").filter(_.nonEmpty).map(new Path(new Path(path), _))
  }

  /** Epochs more than [[MarkerRetain]] behind the one just committed
   * can never be replayed once the checkpoint advances — drop their
   * markers so they don't accumulate for the life of the stream. */
  private def gcMarkers(fs: org.apache.hadoop.fs.FileSystem,
      epochId: Long): Unit = {
    val prefix = s"epoch-$queryId-"
    if (fs.exists(epochsDir)) fs.listStatus(epochsDir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(prefix))
        n.stripPrefix(prefix).toLongOption.foreach { e =>
          if (e <= epochId - MarkerRetain) fs.delete(st.getPath, false): Unit
        }
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = Dsv2Parquet.readConf
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val logged = CommitLog.enabled(path, conf)
    val staged = messages.collect {
      case GraftParquetCommitMessage(Some(f), _) => new Path(f)
    }.sortBy(_.getName)
    val dsts: Array[Path] =
      if (fs.exists(marker(epochId))) readMarker(fs, epochId)
      else {
        // fresh commit: verify every reported file BEFORE any
        // destructive step, truncate (complete mode) while nothing of
        // this epoch is visible yet, then write the ledger — the
        // atomic commit point. Destination names are deterministic in
        // (queryId, epochId, staged index), never a fresh UUID, so a
        // replayed rename lands on the same name instead of beside it.
        staged.foreach(f => require(fs.isFile(f),
          s"graft-parquet epoch $epochId commit: staged file missing: $f"))
        if (truncateFirst && !logged) {
          // on a commit-logged table the truncate is LOGICAL (the
          // manifest publish below) — the replaced files stay on disk
          // for time travel, never physically deleted here
          val old = Dsv2Parquet.dataFiles(path, conf)
          old.foreach(f => fs.delete(f.getPath, false))
          Dsv2WriteProbe.forPath(path).lastTruncated.set(old.length)
        }
        fs.mkdirs(target)
        val d = staged.indices.map(i =>
          new Path(target, f"part-$queryId-e$epochId-$i%05d.parquet")).toArray
        writeMarker(fs, epochId, d)
        d
      }
    // reconcile the ledger: rename a re-/staged file onto each missing
    // destination; destinations already present are first-attempt
    // commits and stay untouched
    var stagedIdx = 0
    dsts.foreach { dst =>
      if (!fs.exists(dst)) {
        require(stagedIdx < staged.length,
          s"graft-parquet epoch $epochId replay: ledger names $dst but " +
            s"no staged file remains to fill it")
        require(fs.rename(staged(stagedIdx), dst),
          s"graft-parquet epoch $epochId commit: rename " +
            s"${staged(stagedIdx)} -> $dst failed")
      }
      stagedIdx += 1
    }
    if (logged) {
      // COMMIT-LOGGED table: the renamed epoch files are invisible
      // until a manifest references them — publish ONE version per
      // epoch. Complete mode retires the previous snapshot logically
      // (files stay for time travel); append unions. Replays are
      // idempotent: the same deterministic destination names re-union
      // (append) or re-pin (complete) to the identical state.
      val dstNames = dsts.map(_.getName).toSet
      var removed = 0
      CommitLog.commitUpdate(path, conf, operation = "stream-epoch") { cur =>
        if (truncateFirst) {
          val retired = cur.dataFiles -- dstNames
          removed = retired.size
          Some(cur.copy(dataFiles = dstNames,
            dvFiles = cur.dvFiles.filterNot(v =>
              Dsv2Parquet.dvTarget(v).exists(retired.contains)),
            // every file an equality delete could target is retired —
            // carrying the sidecars forward would force the row-path
            // probe forever (compact_table can't fold targets that no
            // longer exist) and wedge row-level ops behind the
            // fold-first guard
            eqFiles = Set.empty))
        } else Some(cur.copy(dataFiles = cur.dataFiles ++ dstNames))
      }
      if (truncateFirst) Dsv2WriteProbe.forPath(path).lastTruncated.set(removed)
    }
    fs.delete(new Path(stagingDir(epochId)), true)
    gcMarkers(fs, epochId)
    // a streaming epoch's files are never bucket-aligned — retract any
    // declared clustering so readers stop reporting it
    val clusteringSidecar = new Path(path, Dsv2Parquet.ClusteringFileName)
    if (fs.exists(clusteringSidecar)) fs.delete(clusteringSidecar, false)
    Dsv2WriteProbe.forPath(path).lastCommittedFiles.set(dsts.length)
    Dsv2WriteProbe.forPath(path).epochsCommitted.incrementAndGet(): Unit
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = Dsv2Parquet.readConf
    val fs = new Path(stagingDir(epochId)).getFileSystem(conf)
    fs.delete(new Path(stagingDir(epochId)), true)
  }
}

private[sources] object GraftParquetStreamingWrite {
  /** Epoch markers kept behind the latest commit. Spark replays at most
   * the one epoch whose commit wasn't checkpointed; anything this far
   * back is unreachable, so the window is pure safety margin. */
  val MarkerRetain = 10L
}

private[sources] case class GraftParquetWriterFactory(stagingDir: String,
    schema: StructType,
    bloomFor: Array[String] = Array.empty,
    bloomNdv: Long = 0L) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftParquetDataWriter(stagingDir, schema, partitionId, taskId,
      bloomFor, bloomNdv)
}

/** Executor-side writer: one parquet file per non-empty partition,
 * named by (partitionId, taskId, uuid) so retried and speculative
 * attempts never collide. The file is opened lazily on the first row —
 * an empty partition costs nothing and stages nothing. */
private[sources] class GraftParquetDataWriter(stagingDir: String,
    schema: StructType, partitionId: Int, taskId: Long,
    bloomFor: Array[String] = Array.empty,
    bloomNdv: Long = 0L)
    extends DataWriter[InternalRow] {

  private var file: Path = _
  private var writer: ParquetWriter[InternalRow] = _
  private var rows = 0L

  private def open(): Unit = {
    val conf = Dsv2Parquet.readConf
    file = new Path(stagingDir,
      f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.parquet")
    // direct InternalRow → RecordConsumer write support (no per-row
    // Group materialization — see GraftInternalRowWriteSupport)
    val b = new GraftRowParquetWriterBuilder(
        HadoopOutputFile.fromPath(file, conf), schema)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
    // sink-requested bloom filters (graft.bloomFor): the point-lookup
    // rung for high-cardinality columns where stats and dictionaries
    // can't prune
    bloomFor.foreach { c =>
      b.withBloomFilterEnabled(c, true)
      if (bloomNdv > 0L) b.withBloomFilterNDV(c, bloomNdv)
    }
    writer = b.build()
  }

  override def write(row: InternalRow): Unit = {
    if (writer == null) open()
    writer.write(row)
    rows += 1L
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    GraftParquetCommitMessage(Option(file).map(_.toString), rows)
  }

  override def abort(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    if (file != null) {
      val fs = file.getFileSystem(Dsv2Parquet.readConf)
      fs.delete(file, false)
    }
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}

/** Observability for the write path (spec + driver-row require()
 * surface only — never read by query logic): files/rows of the latest
 * job commit and how many previously committed files a truncate
 * removed. */
object Dsv2WriteProbe {
  final class PathProbe {
    val lastCommittedFiles = new java.util.concurrent.atomic.AtomicInteger
    val lastCommittedRows = new java.util.concurrent.atomic.AtomicLong
    val lastTruncated = new java.util.concurrent.atomic.AtomicInteger
    val epochsCommitted = new java.util.concurrent.atomic.AtomicLong
    /** Driver-side wall of the latest job commit (staging verify +
     * optional truncate + renames) — the only O(#tasks) serial section
     * of the write path, measured by the ScaleSmoke dsv2write curve. */
    val lastCommitMillis = new java.util.concurrent.atomic.AtomicLong
    /** Merge-on-read evidence: files that received position deletes
     * and total positions deleted in the latest delta commit. */
    val lastDvFiles = new java.util.concurrent.atomic.AtomicInteger
    val lastDvPositions = new java.util.concurrent.atomic.AtomicLong
  }
  private val byPath =
    new java.util.concurrent.ConcurrentHashMap[String, PathProbe]()
  /** Keyed by target path so concurrently-running writes (parallel
   * test suites, parallel jobs) cannot clobber each other's readings. */
  def forPath(p: String): PathProbe =
    byPath.computeIfAbsent(p.stripSuffix("/"), _ => new PathProbe)
}
