package graft.sources

import org.apache.hadoop.conf.Configuration
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
 * Concurrency: single-maintenance-writer discipline (the documented
 * stance of every file-backed catalog here); a data file that vanishes
 * mid-compaction fails the swap loudly with the table recoverable from
 * the trash. Maintenance must also not run CONCURRENTLY with row-level
 * operations on the same table: a delta commit landing between
 * compaction's scan and its trash would have its sidecar deleted with
 * the pre-image file (the check-then-act existence guards in the
 * commits are best-effort detectors, not a lock service — the same
 * boundary Iceberg draws without a catalog-level CAS).
 */
object GraftMaintenance {

  /** MINOR compaction: merge each data file's many per-commit DV
   * sidecars into one (union, publish fresh, delete exactly the merged
   * ones) WITHOUT touching data files — bounds the per-scan sidecar
   * read fan-out between major compactions. Concurrent delta commits
   * stay safe: their new sidecars are never in the merged set, and the
   * reader's union is idempotent. Returns data files whose sidecars
   * were merged. */
  def compactDvSidecars(path: String): Int = {
    val conf = Dsv2Parquet.readConf
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val multi = Dsv2Parquet.dvListing(path, conf).filter(_._2.length > 1)
    multi.foreach { case (name, sidecars) =>
      Dsv2Parquet.writeDvSidecar(dir, name,
        Dsv2Parquet.readDvUnion(sidecars, conf), conf)
      sidecars.foreach(s => fs.delete(new Path(s), false))
    }
    multi.size
  }

  /** Fold every deletion vector under `path` into rewritten files.
   * Returns the number of data files compacted (0 = nothing to do). */
  def compactDeletionVectors(spark: SparkSession, path: String): Int = {
    val conf = Dsv2Parquet.readConf
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val dvNames = Dsv2Parquet.dvListing(path, conf).keySet
    val dvFiles = Dsv2Parquet.dataFiles(path, conf).map(_.getPath)
      .filter(f => dvNames.contains(f.getName))
    if (dvFiles.isEmpty) return 0

    val fmt = classOf[GraftParquetProvider].getName
    val schema = Dsv2Parquet.footerSchema(path)
    val staging = new Path(dir, s"_staging-compact-${java.util.UUID.randomUUID()}")
    // live rows of the DV-carrying files only — the provider scan
    // applies the vectors; untouched files never enter the job
    val targets = dvFiles.map(_.toString).toSet
    val live = spark.read.format(fmt).load(path)
      .withColumn("__f", col(Dsv2Parquet.FileMetaColumn))
      .filter(col("__f").isInCollection(targets))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    live.write.format(fmt)
      .option(Dsv2Parquet.SchemaOption, schema.toDDL)
      .mode("append").save(staging.toString)

    // two-phase swap, recoverable at every crash point
    val trash = new Path(dir, s"_trash-compact-${java.util.UUID.randomUUID()}")
    fs.mkdirs(trash)
    dvFiles.foreach { f =>
      require(fs.rename(f, new Path(trash, f.getName)),
        s"graft-compact: trash move of $f failed")
    }
    Dsv2Parquet.deleteDvsFor(fs, dir, dvFiles.map(_.getName))
    Dsv2Parquet.dataFiles(staging.toString, conf).foreach { s =>
      val dst = new Path(dir, s.getPath.getName)
      require(fs.rename(s.getPath, dst),
        s"graft-compact: rename ${s.getPath} -> $dst failed")
    }
    fs.delete(trash, true)
    fs.delete(staging, true)
    // rewritten file names are not bucket-aligned — retract any
    // declared clustered layout rather than let the scan report a
    // partitioning the files no longer prove
    val clusteringSidecar = new Path(dir, Dsv2Parquet.ClusteringFileName)
    if (fs.exists(clusteringSidecar)) fs.delete(clusteringSidecar, false)
    dvFiles.length
  }
}
