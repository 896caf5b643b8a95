package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Table maintenance for [[GraftParquetProvider]] tables — the
 * operations a merge-on-read deployment schedules between repairs
 * (Iceberg's rewrite_data_files / rewrite_position_delete_files in
 * one): deletion vectors trade write cost for a per-scan membership
 * test, and COMPACTION folds them back into clean files when the
 * accumulated read tax outgrows the one-time rewrite.
 *
 * Distributed shape: the rewrite is a Spark job over ONLY the
 * DV-carrying files (the provider scan applies the vectors, so the
 * staged output is exactly the live rows), then a driver-side
 * two-phase swap with the same crash-recoverable discipline as the
 * row-level replace commit: stage → trash old files + sidecars →
 * rename staged in → drop trash. Cost is proportional to the
 * DV-carrying fraction of the table, never the table.
 *
 * Concurrency: on a LOG-LESS table, single-maintenance-writer
 * discipline (the documented stance of every file-backed catalog
 * here); a data file that vanishes mid-compaction fails the swap
 * loudly with the table recoverable from the trash, and maintenance
 * must not run CONCURRENTLY with row-level operations (the
 * check-then-act existence guards in the commits are best-effort
 * detectors, not a lock service). On a COMMIT-LOGGED table that
 * boundary disappears: maintenance commits through
 * [[CommitLog.commitUpdate]] — the manifest swap is the commit point,
 * NOTHING the prior version references is physically deleted (that is
 * [[expireSnapshots]]' job), and compaction-vs-delta is a detected
 * version conflict: whichever publishes second sees the other's
 * change, and the non-commuting loser aborts loudly — deletes are
 * never lost.
 */
object GraftMaintenance {

  /** MINOR compaction: merge each data file's many per-commit DV
   * sidecars into one (union, publish fresh, retire exactly the merged
   * ones) WITHOUT touching data files — bounds the per-scan sidecar
   * read fan-out between major compactions. Concurrent delta commits
   * stay safe: their new sidecars are never in the merged set, and the
   * reader's union is idempotent. On a commit-logged table the swap is
   * a manifest update (merged inputs retire logically, staying on disk
   * for time travel); a data file retired mid-merge simply drops its
   * merge — the retiring commit already owned its rows' delete state.
   * Returns data files whose sidecars were merged. */
  def compactDvSidecars(path: String): Int = {
    val conf = Dsv2Parquet.readConf
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val multi = Dsv2Parquet.dvListing(path, conf).filter(_._2.length > 1)
    if (multi.isEmpty) return 0
    if (CommitLog.enabled(path, conf)) {
      val replacements = multi.toSeq.map { case (name, sidecars) =>
        (name, sidecars.map(new Path(_).getName).toSet,
          Dsv2Parquet.writeDvSidecar(dir, name,
            Dsv2Parquet.readDvUnion(sidecars, conf), conf))
      }
      CommitLog.commitUpdate(path, conf,
          operation = "compact-minor") { cur =>
        var dv = cur.dvFiles
        replacements.foreach { case (dataName, merged, union) =>
          // swap only while every merged input is still current AND the
          // data file lives — a concurrent rewrite/compaction that
          // retired either already owns those rows' delete state
          if (cur.dataFiles.contains(dataName) && merged.subsetOf(dv))
            dv = dv -- merged + union
        }
        Some(cur.copy(dvFiles = dv))
      }
    } else {
      multi.foreach { case (name, sidecars) =>
        Dsv2Parquet.writeDvSidecar(dir, name,
          Dsv2Parquet.readDvUnion(sidecars, conf), conf)
        sidecars.foreach(s => fs.delete(new Path(s), false))
      }
    }
    multi.size
  }

  /** Fold every deletion vector AND equality-delete sidecar under
   * `path` into rewritten files. Returns the number of data files
   * compacted (0 = nothing to do). */
  def compactDeletionVectors(spark: SparkSession, path: String): Int = {
    val conf = Dsv2Parquet.readConf
    val dir = new Path(path)
    // on a logged table, pin the WHOLE compaction (listing + scan +
    // conflict check) to one base version
    val base = CommitLog.latest(path, conf)
    val dvNames = Dsv2Parquet.dvListing(path, conf,
      base.map(_.version)).keySet
    // equality-delete targets still live in the base version rewrite
    // too — folding them is what retires the sidecars (and returns
    // scans to the vectorized zero-probe path)
    val eqTargets: Set[String] = base.map(_.eqFiles.flatMap(n =>
      Dsv2Equality.read(dir, n, conf).targets)).getOrElse(Set.empty)
    val files = Dsv2Parquet.dataFiles(path, conf, base.map(_.version))
      .map(_.getPath).filter(f =>
        dvNames.contains(f.getName) || eqTargets.contains(f.getName))
    if (files.isEmpty) return 0
    rewriteFiles(spark, path, base, files, outPartitions = None)
  }

  /** BIN-PACK compaction (Iceberg's rewrite_data_files binpack): fold
   * every data file smaller than `targetBytes` into ~target-sized
   * rewritten files — the small-file accumulation a streaming sink or
   * many small repair commits leave behind is a per-scan task-overhead
   * tax (and at 100 TB, a NameNode/listing tax) that grows without
   * bound unless folded. Any DVs or equality deletes on the packed
   * files fold in with them. Same commit discipline as
   * [[compactDeletionVectors]]: manifest swap on logged tables
   * (nothing physically deleted), trash swap otherwise. Returns the
   * number of input files packed (0 = nothing worth packing). */
  def compactSmallFiles(spark: SparkSession, path: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"graft-compact: target_bytes must be " +
      s"positive, got $targetBytes")
    val conf = Dsv2Parquet.readConf
    val base = CommitLog.latest(path, conf)
    val smalls = Dsv2Parquet.dataFiles(path, conf, base.map(_.version))
      .filter(_.getLen < targetBytes)
    if (smalls.length < 2) return 0 // a lone small file gains nothing
    val n = math.max(1, math.ceil(
      smalls.map(_.getLen).sum.toDouble / targetBytes).toInt)
    rewriteFiles(spark, path, base, smalls.map(_.getPath),
      outPartitions = Some(n))
  }

  /** RE-CLUSTER maintenance: rewrite the WHOLE table through the
   * sink-demanded hash exchange (`graft.clusterBy` + strict partition
   * count + optional within-bucket sort) and re-declare the clustered
   * layout. This is the restore half of the SPJ story: row-level
   * repairs and compactions RETRACT a declared layout (their output
   * files are not bucket-aligned), after which the periodic reconcile
   * pays its exchange again — a scheduled re-cluster brings back the
   * zero-exchange zero-sort storage-partitioned join. DVs and equality
   * deletes fold in (the rewrite carries live rows only).
   *
   * Replace-ALL is non-commuting with everything: on a logged table
   * the publish verifies the base version is still current and aborts
   * on ANY concurrent commit. Returns the number of files replaced. */
  def reclusterTable(spark: SparkSession, path: String,
      clusterBy: Seq[String], buckets: Int,
      sortWithin: Seq[String] = Seq.empty): Int = {
    require(clusterBy.nonEmpty && buckets > 0,
      s"graft-recluster: need cluster columns and a positive bucket " +
        s"count, got ${clusterBy.mkString(",")} / $buckets")
    val conf = Dsv2Parquet.readConf
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val base = CommitLog.latest(path, conf)
    val files = Dsv2Parquet.dataFiles(path, conf, base.map(_.version))
    if (files.isEmpty) return 0
    val fmt = classOf[GraftParquetProvider].getName
    val schema = Dsv2Parquet.footerSchema(path)
    val staging = new Path(dir,
      s"_staging-recluster-${java.util.UUID.randomUUID()}")
    val reader = spark.read.format(fmt)
    base.foreach(s =>
      reader.option(Dsv2Parquet.VersionAsOfOption, s.version.toString))
    val w = reader.load(path)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .write.format(fmt)
      .option(Dsv2Parquet.SchemaOption, schema.toDDL)
      .option(Dsv2Parquet.ClusterByOption, clusterBy.mkString(","))
      .option(Dsv2Parquet.NumPartitionsOption, buckets.toString)
    (if (sortWithin.nonEmpty)
      w.option(Dsv2Parquet.SortWithinOption, sortWithin.mkString(","))
    else w).mode("append").save(staging.toString)

    val scannedSet = files.map(_.getPath.getName).toSet
    base match {
      case Some(baseSnap) =>
        val newNames = Dsv2Parquet.dataFiles(staging.toString, conf).map { s =>
          val dst = new Path(dir, s.getPath.getName)
          require(fs.rename(s.getPath, dst),
            s"graft-recluster: rename ${s.getPath} -> $dst failed")
          dst.getName
        }.toSet
        CommitLog.commitUpdate(path, conf, operation = "recluster") { cur =>
          if (cur.version != baseSnap.version) throw new IllegalStateException(
            "graft-recluster: concurrent writer conflict — the table " +
              s"moved from version ${baseSnap.version} to ${cur.version} " +
              "during the rewrite; aborting (re-run against the current " +
              "table)")
          Some(CommitLog.Snapshot(cur.version, newNames, Set.empty))
        }
      case None =>
        val trash = new Path(dir,
          s"_trash-recluster-${java.util.UUID.randomUUID()}")
        fs.mkdirs(trash)
        files.foreach { f =>
          require(fs.rename(f.getPath, new Path(trash, f.getPath.getName)),
            s"graft-recluster: trash move of ${f.getPath} failed")
        }
        Dsv2Parquet.deleteDvsFor(fs, dir, scannedSet)
        Dsv2Parquet.dataFiles(staging.toString, conf).foreach { s =>
          val dst = new Path(dir, s.getPath.getName)
          require(fs.rename(s.getPath, dst),
            s"graft-recluster: rename ${s.getPath} -> $dst failed")
        }
        fs.delete(trash, true)
    }
    // promote the staged write's layout declaration to the table dir
    // (the staged commit declared it inside the staging dir)
    val stagedSidecar = new Path(staging, Dsv2Parquet.ClusteringFileName)
    val sidecar = new Path(dir, Dsv2Parquet.ClusteringFileName)
    require(fs.exists(stagedSidecar),
      "graft-recluster: the staged write declared no clustered layout")
    if (fs.exists(sidecar)) fs.delete(sidecar, false)
    require(fs.rename(stagedSidecar, sidecar),
      "graft-recluster: clustering sidecar promote failed")
    fs.delete(staging, true)
    files.length
  }

  /** The shared rewrite: scan the LIVE rows of exactly `files` (the
   * provider scan applies their deletion vectors and equality deletes;
   * untouched files never enter the job), stage, swap.
   *
   * COMMIT-LOGGED swap: rename the rewritten files in (invisible until
   * a manifest references them) and publish ONE manifest version
   * swapping the file sets. Nothing the prior version references is
   * physically deleted — [[expireSnapshots]] reclaims history. The
   * conflict stance makes compaction-vs-row-level a real version
   * conflict: a scanned file retired by a concurrent rewrite, or a NEW
   * deletion vector / equality delete landed on a scanned file by a
   * concurrent commit (deletes this rewrite did not fold — publishing
   * would lose them), aborts loudly and the table stays on the other
   * writer's version. Base equality sidecars whose live targets were
   * ALL rewritten are fully applied and retire; partially-covered ones
   * stay (their keys were folded out of the rewritten files, which are
   * new and therefore exempt — remaining targets still need the probe).
   *
   * Log-less swap: two-phase via a trash dir, recoverable at every
   * crash point. */
  private def rewriteFiles(spark: SparkSession, path: String,
      base: Option[CommitLog.Snapshot], files: Array[Path],
      outPartitions: Option[Int]): Int = {
    val conf = Dsv2Parquet.readConf
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val fmt = classOf[GraftParquetProvider].getName
    val schema = Dsv2Parquet.footerSchema(path)
    val staging = new Path(dir, s"_staging-compact-${java.util.UUID.randomUUID()}")
    val targets = files.map(_.toString).toSet
    val reader = spark.read.format(fmt)
    base.foreach(s =>
      reader.option(Dsv2Parquet.VersionAsOfOption, s.version.toString))
    val live0 = reader.load(path)
      .withColumn("__f", col(Dsv2Parquet.FileMetaColumn))
      .filter(col("__f").isInCollection(targets))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val live = outPartitions.fold(live0)(live0.repartition)
    live.write.format(fmt)
      .option(Dsv2Parquet.SchemaOption, schema.toDDL)
      .mode("append").save(staging.toString)

    base match {
      case Some(baseSnap) =>
        val scannedSet = files.map(_.getName).toSet
        val baseDvs = baseSnap.dvFiles.filter(v =>
          Dsv2Parquet.dvTarget(v).exists(scannedSet.contains))
        val newNames = Dsv2Parquet.dataFiles(staging.toString, conf).map { s =>
          val dst = new Path(dir, s.getPath.getName)
          require(fs.rename(s.getPath, dst),
            s"graft-compact: rename ${s.getPath} -> $dst failed")
          dst.getName
        }.toSet
        CommitRaceProbe.beforeCompactionPublish(path)
        CommitLog.commitUpdate(path, conf,
            operation = if (outPartitions.isEmpty) "compact" else "binpack"
        ) { cur =>
          val gone = scannedSet.filterNot(cur.dataFiles.contains)
          if (gone.nonEmpty) throw new IllegalStateException(
            "graft-compact: concurrent writer conflict — compacted " +
              s"file(s) no longer in version ${cur.version}: " +
              s"${gone.mkString(", ")}; aborting this compaction")
          val newDvs = cur.dvFiles.filter(v =>
            Dsv2Parquet.dvTarget(v).exists(scannedSet.contains)) -- baseDvs
          if (newDvs.nonEmpty) throw new IllegalStateException(
            "graft-compact: concurrent delta commit landed deletion " +
              s"vector(s) on file(s) being compacted: " +
              s"${newDvs.mkString(", ")}; aborting this compaction — " +
              "publishing would lose those deletes")
          val newEq = (cur.eqFiles -- baseSnap.eqFiles).filter(n =>
            Dsv2Equality.read(dir, n, conf).targets
              .exists(scannedSet.contains))
          if (newEq.nonEmpty) throw new IllegalStateException(
            "graft-compact: concurrent equality-delete commit targets " +
              s"file(s) being compacted: ${newEq.mkString(", ")}; " +
              "aborting this compaction — publishing would lose those " +
              "deletes")
          // an eq sidecar retires only when every target still live in
          // the base was rewritten — else its remaining targets keep it
          val applied = baseSnap.eqFiles.filter(n =>
            Dsv2Equality.read(dir, n, conf).targets
              .intersect(baseSnap.dataFiles).subsetOf(scannedSet))
          Some(cur.copy(
            dataFiles = cur.dataFiles -- scannedSet ++ newNames,
            dvFiles = cur.dvFiles -- baseDvs,
            eqFiles = cur.eqFiles -- applied))
        }
        fs.delete(staging, true)
      case None =>
        // two-phase swap, recoverable at every crash point
        val trash = new Path(dir,
          s"_trash-compact-${java.util.UUID.randomUUID()}")
        fs.mkdirs(trash)
        files.foreach { f =>
          require(fs.rename(f, new Path(trash, f.getName)),
            s"graft-compact: trash move of $f failed")
        }
        Dsv2Parquet.deleteDvsFor(fs, dir, files.map(_.getName))
        Dsv2Parquet.dataFiles(staging.toString, conf).foreach { s =>
          val dst = new Path(dir, s.getPath.getName)
          require(fs.rename(s.getPath, dst),
            s"graft-compact: rename ${s.getPath} -> $dst failed")
        }
        fs.delete(trash, true)
        fs.delete(staging, true)
    }
    // rewritten file names are not bucket-aligned — retract any
    // declared clustered layout rather than let the scan report a
    // partitioning the files no longer prove
    val clusteringSidecar = new Path(dir, Dsv2Parquet.ClusteringFileName)
    if (fs.exists(clusteringSidecar)) fs.delete(clusteringSidecar, false)
    files.length
  }

  /** `expire_snapshots`: drop manifests older than the newest
   * `retainLast` versions and physically delete every file (data + DV
   * sidecar + equality-delete) ONLY the dropped versions reference —
   * the reclamation half of the log's "commits never physically
   * delete" contract. Never touches the latest version or any file a
   * retained version still references. Returns the number of files
   * (manifests + data + sidecars) deleted. */
  def expireSnapshots(path: String, retainLast: Int): Int = {
    require(retainLast >= 1,
      s"graft-expire: retain_last must be >= 1, got $retainLast")
    val conf = Dsv2Parquet.readConf
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val versions = CommitLog.versions(dir, conf)
    require(versions.nonEmpty,
      s"graft-expire: $path has no commit log — nothing to expire")
    val (expired, retained) =
      versions.splitAt(math.max(0, versions.length - retainLast))
    if (expired.isEmpty) return 0
    val keep: Set[String] = retained.toSet.flatMap { (v: Long) =>
      val s = CommitLog.read(dir, v, conf)
      s.dataFiles ++ s.dvFiles ++ s.eqFiles
    }
    val drop: Set[String] = expired.toSet.flatMap { (v: Long) =>
      val s = CommitLog.read(dir, v, conf)
      (s.dataFiles ++ s.dvFiles ++ s.eqFiles) -- keep
    }
    var n = 0
    drop.foreach { name =>
      if (fs.delete(new Path(dir, name), false)) n += 1
    }
    expired.foreach { v =>
      if (fs.delete(new Path(dir, CommitLog.manifestName(v)), false)) n += 1
      // the manifest cache must forget what the filesystem forgot —
      // same-JVM reads of an expired version must fail, not resurrect
      CommitLog.invalidate(dir, v)
    }
    n
  }

  /** `rollback_to_version`: publish a NEW version whose file sets are
   * exactly those of `version` — a metadata-only undo (zero data
   * movement, the same face as Iceberg's `rollback_to_snapshot`) that
   * PRESERVES history: the rolled-over versions stay readable via
   * `VERSION AS OF` until `expire_snapshots` reclaims them, and the
   * rollback itself appears in `snapshots` as one more commit. Fails
   * if the target version has expired or any file it references has
   * been physically reclaimed. Rollback is last-write-wins BY DESIGN:
   * the published state ignores the current snapshot entirely, so a
   * commit that lands concurrently is rolled over too (that is what
   * "set the table to version N" means). Returns the new version. */
  def rollbackTo(path: String, version: Long): Long = {
    val conf = Dsv2Parquet.readConf
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    require(CommitLog.enabled(path, conf),
      s"graft-rollback: $path has no commit log (set " +
        "TBLPROPERTIES('graft.commit.log'='true'))")
    val target = CommitLog.read(dir, version, conf)
    (target.dataFiles ++ target.dvFiles ++ target.eqFiles).foreach { f =>
      require(fs.exists(new Path(dir, f)),
        s"graft-rollback: version $version references $f, which " +
          "expire_snapshots has physically reclaimed — unrecoverable")
    }
    // The restored file names may not be bucket-aligned with a layout
    // declared AFTER the target version — retract any clustering claim
    // rather than let the scan report a partitioning the restored
    // files no longer prove (same conservatism as compaction).
    val clustering = new Path(dir, Dsv2Parquet.ClusteringFileName)
    if (fs.exists(clustering)) fs.delete(clustering, false)
    // Rollback restores DATA, not schema — deliberately (and pinned by
    // the schema-evolution fuzz's model: "contents revert, schema
    // stays current"). The new manifest is stamped with the CURRENT
    // declared DDL, so after a post-target ALTER ADD COLUMN the
    // rollback version serves the added column null-filled over the
    // restored files, while `VERSION AS OF target` serves the as-of
    // schema. The two reads differ BY DESIGN: rolling the declaration
    // back under live readers/writers would turn a data-repair tool
    // into a schema change, and ALTER is the explicit surface for
    // that. (r20 advice noted the asymmetry; this documents it.)
    CommitRaceProbe.beforeRollbackPublish(path)
    CommitLog.commitUpdate(path, conf,
      operation = s"rollback to $version")(_ => Some(target)).get.version
  }

  /** `remove_orphan_files`: delete files in the table directory that
   * match a table-file shape (data `*.parquet`, DV `_dv-*.bin`,
   * equality `_eq-*.bin`) but are referenced by NO published commit-log
   * version — crashed writes' promoted-then-never-committed leftovers
   * and externally copied-in strays. Manifests, staging dirs, epoch
   * markers and the clustering sidecar are never candidates. The
   * `olderThanMs` age guard is what keeps a LIVE writer's
   * renamed-but-not-yet-manifested files safe (a batch commit renames
   * staged files in BEFORE publishing the manifest) — pass 0 only when
   * no writer can be in flight. Requires the commit log: on a log-less
   * table the listing IS the state and nothing is orphaned. Returns
   * the deleted file count. */
  def removeOrphanFiles(path: String, olderThanMs: Long): Int = {
    require(olderThanMs >= 0,
      s"graft-orphans: older_than_ms must be >= 0, got $olderThanMs")
    val conf = Dsv2Parquet.readConf
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val versions = CommitLog.versions(dir, conf)
    require(versions.nonEmpty,
      s"graft-orphans: $path has no commit log — the directory " +
        "listing IS the table state, nothing can be orphaned")
    val referenced: Set[String] = versions.toSet.flatMap { (v: Long) =>
      val s = CommitLog.read(dir, v, conf)
      s.dataFiles ++ s.dvFiles ++ s.eqFiles
    }
    val cutoff = System.currentTimeMillis() - olderThanMs
    var n = 0
    fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      val tableShaped = st.isFile && (
        (name.endsWith(".parquet") && !name.startsWith("_") &&
          !name.startsWith(".")) ||
        (name.startsWith(Dsv2Parquet.DvPrefix) && name.endsWith(".bin")) ||
        (name.startsWith(Dsv2Equality.EqPrefix) && name.endsWith(".bin")))
      // crashed writers' debris: an abandoned staging dir (the committer
      // deletes its own on both commit and abort) or a manifest temp
      // whose publisher died between write and link
      val debris =
        (st.isDirectory && name.startsWith("_staging-")) ||
        (st.isFile && name.startsWith("._manifest-tmp-"))
      if ((tableShaped && !referenced.contains(name) || debris) &&
          st.getModificationTime <= cutoff &&
          fs.delete(st.getPath, st.isDirectory)) n += 1
    }
    n
  }
}

/** Test seam for the commit-race specs: callbacks fired on the driver
 * immediately before a manifest publish, letting a spec land a
 * concurrent commit deterministically inside the race window (the
 * window is real — the hook only widens it to a test's timescale).
 * No-ops in production. */
object CommitRaceProbe {
  @volatile var beforeCompactionPublish: String => Unit = _ => ()
  @volatile var beforeDeltaPublish: String => Unit = _ => ()
  @volatile var beforeEqPublish: String => Unit = _ => ()
  @volatile var beforeRollbackPublish: String => Unit = _ => ()
  @volatile var beforeReplacePublish: String => Unit = _ => ()
  def reset(): Unit = {
    beforeCompactionPublish = _ => ()
    beforeDeltaPublish = _ => ()
    beforeEqPublish = _ => ()
    beforeRollbackPublish = _ => ()
    beforeReplacePublish = _ => ()
  }
}
