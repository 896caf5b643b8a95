package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The selective-scan IO ladder of the DSv2 provider's vectorized
 * path (r17 verdict #3/#4 + advice): driver-side row-group pruning on
 * pushed band predicates, parquet column-index (page-level) skipping
 * inside kept row groups, and dictionary-id decode for all-dictionary
 * string chunks — each with a positive-engagement probe so a silent
 * disengagement fails the spec instead of just reading slower. */
class Dsv2PageIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fmt = classOf[GraftParquetProvider].getName

  private def withTmp[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pageindex").toString
    try f(tmp)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  test("pushed band predicates prune row groups at planning") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      spark.range(0, 40000).select(col("id").as("k"), (col("id") % 7).as("v"))
        .repartitionByRange(4, col("k")).sortWithinPartitions("k")
        .write.parquet(p)
      val probe = Dsv2RuntimeProbe.forPath(p)
      probe.reset()
      val got = spark.read.format(fmt).load(p).filter(col("k") === 12345L)
      assert(got.count() == 1L)
      assert(probe.lastPlanned.get() == 4, s"planned=${probe.lastPlanned.get()}")
      assert(probe.lastKept.get() == 1, s"kept=${probe.lastKept.get()}")
    }
  }

  test("page index skips pages inside a kept row group") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      // ONE file, ONE row group, many small pages on a sorted key —
      // the shape where row-group pruning can do nothing and the
      // column index is the only skip left
      spark.range(0, 200000).select(col("id").as("k"), (col("id") * 3).as("v"))
        .coalesce(1).sortWithinPartitions("k")
        .write
        .option("parquet.page.size", "4096")
        .option("parquet.page.row.count.limit", "1000")
        .parquet(p)
      val probe = Dsv2RuntimeProbe.forPath(p)
      probe.reset()
      val got = spark.read.format(fmt).load(p).filter(col("k") === 54321L)
      assert(got.count() == 1L)
      assert(probe.lastKept.get() == 1, s"kept=${probe.lastKept.get()}")
      // all 200k rows sit in the kept group; the filtered read must
      // admit only the candidate pages' rows
      val admitted = probe.rowsAdmitted.get()
      assert(admitted > 0L && admitted < 20000L, s"admitted=$admitted")
      // and the value survives exactly
      assert(got.select("v").as[Long].head() == 54321L * 3)
    }
  }

  test("all-dictionary string chunks decode in id mode, values exact") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      val df = spark.range(0, 5000).select(col("id").as("k"),
        when(col("id") % 11 === 0, lit(null)).otherwise(
          concat(lit("cat_"), (col("id") % 7).cast("string"))).as("s"))
      df.coalesce(1).write.parquet(p)
      val probe = Dsv2RuntimeProbe.forPath(p)
      probe.reset()
      val got = spark.read.format(fmt).load(p)
      val exp = spark.read.parquet(p)
      assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
        exp.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
      assert(probe.dictChunks.get() >= 1,
        s"dictChunks=${probe.dictChunks.get()} — id-mode decode never engaged")
      // aggregation over the dictionary column stays exact
      val counts = spark.read.format(fmt).load(p)
        .groupBy("s").count().collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      assert(counts(None) == 5000L / 11 + 1)
      assert(counts(Some("cat_0")).toInt > 0)
      assert(counts.values.sum == 5000L)
    }
  }

  test("page index composes with deletion vectors: pages skipped AND " +
      "deleted rows absent") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      // one file, one row group, 1000-row pages on a sorted key — and
      // a deletion vector over it (r18 verdict #1: a selective band on
      // a merge-on-read table must NOT decode every live row)
      spark.range(0, 200000).select(col("id").as("k"), (col("id") * 3).as("v"))
        .coalesce(1).sortWithinPartitions("k")
        .write
        .option("parquet.page.size", "4096")
        .option("parquet.page.row.count.limit", "1000")
        .parquet(p)
      val dataFile = new java.io.File(p).listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      // sorted coalesced range ⇒ file position == k: delete every 3rd
      // row of the band plus scattered far-away rows (page-boundary
      // stress on both sides of the band)
      val deleted = (54300L until 54400L by 3L).toArray ++
        Array(0L, 999L, 1000L, 123456L, 199999L)
      Dsv2Parquet.writeDvSidecar(new org.apache.hadoop.fs.Path(p), dataFile,
        deleted.sorted, Dsv2Parquet.readConf)
      val probe = Dsv2RuntimeProbe.forPath(p)
      probe.reset()
      val got = spark.read.format(fmt).load(p)
        .filter(col("k") >= 54300L && col("k") < 54500L)
        .select("k", "v").as[(Long, Long)].collect().toSet
      val exp = (54300L until 54500L).filterNot(deleted.contains)
        .map(k => (k, k * 3)).toSet
      assert(got == exp)
      // the filtered read must still have admitted only candidate
      // pages — not the whole group (200k rows)
      val admitted = probe.rowsAdmitted.get()
      assert(admitted > 0L && admitted < 20000L, s"admitted=$admitted")
    }
  }

  test("DV + page index stays exact across batch boundaries and " +
      "all-deleted pages") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      spark.range(0, 60000).select(col("id").as("k"),
        (col("id") % 9).cast("int").as("v"))
        .coalesce(1).sortWithinPartitions("k")
        .write.option("parquet.page.row.count.limit", "500").parquet(p)
      val dataFile = new java.io.File(p).listFiles()
        .map(_.getName).find(_.endsWith(".parquet")).get
      // delete an ENTIRE retained page (30000-30499), a run crossing
      // the 4096-batch boundary of the retained stream, and singletons
      val deleted = (30000L until 30500L).toArray ++
        (33000L until 33100L).toArray ++ Array(29999L, 34001L)
      Dsv2Parquet.writeDvSidecar(new org.apache.hadoop.fs.Path(p), dataFile,
        deleted.sorted, Dsv2Parquet.readConf)
      val got = spark.read.format(fmt).load(p)
        .filter(col("k") >= 29000L && col("k") < 35000L)
        .select("k").as[Long].collect().toSet
      val exp = (29000L until 35000L).toSet -- deleted.toSet
      assert(got == exp)
    }
  }

  test("filtered reads stay exact under nulls and residual re-check") {
    withTmp { tmp =>
      val p = s"$tmp/t"
      spark.range(0, 50000).select(
        when(col("id") % 13 === 0, lit(null)).otherwise(col("id")).as("k"),
        (col("id") % 5).as("v"))
        .coalesce(1).sortWithinPartitions("k")
        .write.option("parquet.page.row.count.limit", "1000").parquet(p)
      val got = spark.read.format(fmt).load(p)
        .filter(col("k") > 25000L && col("k") <= 25100L)
      val exp = spark.read.parquet(p)
        .filter(col("k") > 25000L && col("k") <= 25100L)
      assert(got.collect().map(_.toSeq).toSet == exp.collect().map(_.toSeq).toSet)
    }
  }
}
