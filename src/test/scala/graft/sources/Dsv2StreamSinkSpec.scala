package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The DSv2 STREAMING write: per-epoch staged append, complete-mode
 * snapshot truncation, and idempotent epoch re-commit (the replayed-
 * micro-batch case). */
class Dsv2StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def fmt = classOf[GraftParquetProvider].getName

  private def withTmp[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsv2-ssink").toString
    try f(tmp)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  test("append-mode stream lands every micro-batch exactly once") {
    withTmp { tmp =>
      val src = s"$tmp/src"
      val dst = s"$tmp/dst"
      spark.range(10).select(col("id").as("k")).coalesce(1).write.parquet(src)
      val before = Dsv2WriteProbe.forPath(dst).epochsCommitted.get()
      val q = spark.readStream
        .schema(StructType.fromDDL("k BIGINT"))
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream.format(fmt).outputMode("append")
        .option(Dsv2Parquet.SchemaOption, "k BIGINT")
        .option("checkpointLocation", s"$tmp/ckpt")
        .start(dst)
      try {
        q.processAllAvailable()
        spark.range(10, 25).select(col("id").as("k"))
          .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      } finally q.stop()
      assert(spark.read.parquet(dst).as[Long].collect().toSet ==
        (0L until 25L).toSet)
      // two feed files → at least two committed epochs
      assert(Dsv2WriteProbe.forPath(dst).epochsCommitted.get() - before >= 2L)
      // read-back works through the provider too
      assert(spark.read.format(fmt).load(dst).count() == 25L)
    }
  }

  test("complete-mode stream holds exactly the latest snapshot") {
    withTmp { tmp =>
      val src = s"$tmp/src"
      val dst = s"$tmp/dst"
      spark.range(8).select((col("id") % 2).as("g")).coalesce(1)
        .write.parquet(src)
      val q = spark.readStream
        .schema(StructType.fromDDL("g BIGINT"))
        .option("maxFilesPerTrigger", "1").parquet(src)
        .groupBy("g").agg(count(lit(1)).as("n"))
        .writeStream.format(fmt).outputMode("complete")
        .option(Dsv2Parquet.SchemaOption, "g BIGINT, n BIGINT")
        .option("checkpointLocation", s"$tmp/ckpt")
        .start(dst)
      try {
        q.processAllAvailable()
        spark.range(8).select(lit(1L).as("g")).coalesce(1)
          .write.mode("append").parquet(src)
        q.processAllAvailable()
      } finally q.stop()
      // snapshot = final counts only, no residue of the first epoch
      val got = spark.read.parquet(dst).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(0L -> 4L, 1L -> 12L), got.toString)
    }
  }

  test("a replayed epoch commit is a no-op (marker idempotence)") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      val schema = StructType.fromDDL("k BIGINT")
      val sw = GraftParquetStreamingWrite(p, schema, "spec-replay",
        truncateFirst = false)
      def stage(v: Long): org.apache.spark.sql.connector.write.WriterCommitMessage = {
        val w = new GraftParquetDataWriter(s"$p/_staging-spec-replay-e7",
          schema, 0, 0L)
        w.write(org.apache.spark.sql.catalyst.InternalRow(v))
        w.commit()
      }
      sw.commit(7L, Array(stage(1L)))
      assert(spark.read.parquet(p).count() == 1L)
      // the replay stages fresh files for the same epoch; commit must drop them
      sw.commit(7L, Array(stage(2L)))
      assert(spark.read.parquet(p).count() == 1L)
      assert(!new java.io.File(s"$p/_staging-spec-replay-e7").exists())
      // a NEW epoch commits normally
      val w2 = new GraftParquetDataWriter(s"$p/_staging-spec-replay-e8",
        schema, 0, 0L)
      w2.write(org.apache.spark.sql.catalyst.InternalRow(3L))
      sw.commit(8L, Array(w2.commit()))
      assert(spark.read.parquet(p).count() == 2L)
    }
  }

  test("replayed epoch commits stay idempotent on a COMMIT-LOGGED table") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      val conf = Dsv2Parquet.readConf
      new java.io.File(p).mkdirs()
      CommitLog.enable(p, conf)
      val schema = StructType.fromDDL("k BIGINT")
      def replay(qid: String, truncate: Boolean, epoch: Long,
          v: Long): Unit = {
        val sw = GraftParquetStreamingWrite(p, schema, qid, truncate)
        val w = new GraftParquetDataWriter(s"$p/_staging-$qid-e$epoch",
          schema, 0, 0L)
        w.write(org.apache.spark.sql.catalyst.InternalRow(v))
        sw.commit(epoch, Array(w.commit()))
      }
      replay("spec-lg", truncate = false, 1L, 10L)
      val vAfterFirst = CommitLog.latest(p, conf).get.version
      // replay of the SAME epoch: manifest re-publish must re-pin the
      // identical file set (a new version, same state — no duplicates)
      replay("spec-lg", truncate = false, 1L, 99L)
      val snap = CommitLog.latest(p, conf).get
      assert(snap.version > vAfterFirst)
      assert(spark.read.format(fmt).load(p).as[Long].collect().toList ==
        List(10L))
      // complete-mode epochs on a logged table: replay re-pins, old
      // epochs stay on disk for time travel
      replay("spec-lgc", truncate = true, 5L, 42L)
      replay("spec-lgc", truncate = true, 5L, 43L)
      assert(spark.read.format(fmt).load(p).as[Long].collect().toList ==
        List(42L))
      val onDisk = Option(new java.io.File(p).listFiles()).get
        .count(_.getName.endsWith(".parquet"))
      assert(onDisk > CommitLog.latest(p, conf).get.dataFiles.size,
        "logged complete-mode truncation must retire logically")
    }
  }
}
