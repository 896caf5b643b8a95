package graft.tools

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch in-session A/B (r22, VERDICT #3): EqualityRepair.commit's
 * OLD two-job shape (sidecar-write job, then DSv2 insert-staging job —
 * reconstructed below from the same public API the old code used)
 * against the fused tagged-union single-job commit now wired. Each
 * iteration builds a FRESH commit-logged table (a commit mutates the
 * table, so runs cannot share one) and times ONLY the commit call;
 * variants interleave so session drift hits both equally.
 *
 * Usage: runMain graft.tools.EqCommitAb [sfDir] [reps]
 */
object EqCommitAb {

  /** The pre-r22 commit, verbatim shape: job 1 writes sidecars from the
   * delete-key frame, job 2 stages inserts through the DSv2 writer into
   * a side directory, then the driver renames them in and publishes one
   * CAS manifest update. Guards match the wired commit so the timed
   * difference is the job structure alone. */
  def oldCommit(spark: SparkSession, path: String, keyCols: Seq[String],
      deleteKeys: DataFrame, inserts: DataFrame): Unit = {
    import graft.sources.{CommitLog, Dsv2Equality, Dsv2Parquet}
    val conf = Dsv2Parquet.readConf
    val tableSchema = Dsv2Parquet.footerSchema(path)
    val kc = keyCols.toArray
    val base = CommitLog.latest(path, conf).get
    Dsv2Equality.liveSidecars(new Path(path), base, conf)
      .headOption.foreach(prev => require(prev.keyCols.sameElements(kc)))
    val targets = base.dataFiles
    val canon = Dsv2Equality.canonicalExpr(kc.toIndexedSeq)
    val bTargets = spark.sparkContext.broadcast(targets)
    import spark.implicits._
    val slices = math.min(8, math.max(1, deleteKeys.rdd.getNumPartitions))
    val eqNames: Array[String] = deleteKeys.select(canon.as("k"))
      .repartition(slices).as[String]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else Iterator(Dsv2Equality.write(new Path(path), kc,
          bTargets.value, it, Dsv2Parquet.readConf))
      }.collect()
    val staging = s"$path/_staging-eq-${UUID.randomUUID()}"
    val insertNames: Set[String] =
      if (inserts.schema.isEmpty) Set.empty
      else {
        inserts.select(tableSchema.fieldNames.toIndexedSeq.map(col): _*)
          .write.format(classOf[graft.sources.GraftParquetProvider].getName)
          .option(Dsv2Parquet.SchemaOption, tableSchema.toDDL)
          .mode("append").save(staging)
        val fs = new Path(path).getFileSystem(conf)
        if (!fs.exists(new Path(staging))) Set.empty[String]
        else Dsv2Parquet.dataFiles(staging, conf).map { s =>
          val dst = new Path(path, s.getPath.getName)
          require(fs.rename(s.getPath, dst), s"rename ${s.getPath} failed")
          dst.getName
        }.toSet
      }
    try CommitLog.commitUpdate(path, conf, operation = "eq-repair") { cur =>
      Some(cur.copy(dataFiles = cur.dataFiles ++ insertNames,
        eqFiles = cur.eqFiles ++ eqNames))
    }: Unit
    finally {
      val fs = new Path(path).getFileSystem(conf)
      fs.delete(new Path(staging), true): Unit
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.{CommitLog, Dsv2Parquet, EqualityRepair}
    import graft.{MvSyncDemo}
    val fmt = classOf[graft.sources.GraftParquetProvider].getName

    // the wired recon_post_repair_eq setup, commit inputs identical
    def setup(): (String, java.io.File, DataFrame, DataFrame, Seq[String]) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-eqab").toFile
      val path = s"$tmp/mv"
      val damaged = MvSyncDemo.mvDf(spark, dir)
      damaged.write.format(fmt)
        .option(Dsv2Parquet.SchemaOption, damaged.schema.toDDL)
        .mode("append").save(path)
      CommitLog.enable(path, Dsv2Parquet.readConf)
      val baseDf = MvSyncDemo.baseDf(spark, dir)
      val pk = MvSyncDemo.mvSchema.sortedPk
      val classified = graft.reconcile.MvReconciler.reconcile(
        baseDf, spark.read.format(fmt).load(path),
        MvSyncDemo.baseSchema, MvSyncDemo.mvSchema,
        graft.config.Settings(trustUniquePk = true))
        .select((pk.map(col) :+ col("problem")).toIndexedSeq: _*)
        .localCheckpoint()
      val deleteKeys = classified.filter(col("problem")
          .isin("MISSING_IN_BASE_TABLE", "INCONSISTENT"))
        .select(pk.map(col).toIndexedSeq: _*)
      val insertKeys = classified.filter(col("problem")
          .isin("MISSING_IN_MV_TABLE", "INCONSISTENT"))
        .select(pk.map(col).toIndexedSeq: _*)
      val inserts = baseDf.selectExpr(damaged.columns.toIndexedSeq: _*)
        .join(insertKeys, pk.toSeq, "left_semi")
      (path, tmp, deleteKeys, inserts, pk.toSeq)
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    // (commit wall, commit+downstream wall, files, sidecars): the
    // downstream half catches any effect the commit's OUTPUT SHAPE
    // (file count, sidecar count) has on the phases that read it —
    // healed classify, compact fold, folded check, exactly
    // recon_post_repair_eq's tail
    def once(variant: String): (Double, Double, Int, Int) = {
      val (path, tmp, dk, ins, pk) = setup()
      val t0 = System.nanoTime()
      if (variant == "old") oldCommit(spark, path, pk, dk, ins)
      else EqualityRepair.commit(spark, path, pk, dk, ins)
      val commitSecs = (System.nanoTime() - t0) / 1e9
      val snap = CommitLog.latest(path, Dsv2Parquet.readConf).get
      require(snap.eqFiles.nonEmpty, s"$variant: no sidecars landed")
      // both variants must heal the table identically
      val problems = graft.reconcile.MvReconciler.reconcile(
        MvSyncDemo.baseDf(spark, dir), spark.read.format(fmt).load(path),
        MvSyncDemo.baseSchema, MvSyncDemo.mvSchema,
        graft.config.Settings(trustUniquePk = true))
        .filter(col("problem") =!= "CONSISTENT").count()
      require(problems == 0L, s"$variant: $problems problems after repair")
      graft.sources.GraftMaintenance.compactDeletionVectors(spark, path): Unit
      val folded = graft.reconcile.MvReconciler.reconcile(
        MvSyncDemo.baseDf(spark, dir), spark.read.format(fmt).load(path),
        MvSyncDemo.baseSchema, MvSyncDemo.mvSchema,
        graft.config.Settings(trustUniquePk = true))
        .filter(col("problem") =!= "CONSISTENT").count()
      require(folded == 0L, s"$variant: $folded problems after folding")
      val fullSecs = (System.nanoTime() - t0) / 1e9
      rm(tmp)
      (commitSecs, fullSecs, snap.dataFiles.size, snap.eqFiles.size)
    }
    once("old"); once("new") // warm (JIT, codegen) untimed
    val results = (1 to reps).flatMap(_ =>
      Seq("old" -> once("old"), "new" -> once("new")))
    Seq("old", "new").foreach { v =>
      val rs = results.collect { case (`v`, r) => r }
      val cs = rs.map(_._1).sorted
      val fs = rs.map(_._2).sorted
      println(f"[eq-ab] $v%-4s commit median=${cs(cs.size / 2)}%.3fs " +
        f"commit+readback median=${fs(fs.size / 2)}%.3fs " +
        f"files=${rs.map(_._3).distinct.mkString("/")} " +
        f"sidecars=${rs.map(_._4).distinct.mkString("/")} " +
        f"(commit: ${cs.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
