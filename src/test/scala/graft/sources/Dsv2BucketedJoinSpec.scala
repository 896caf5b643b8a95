package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * STORAGE-PARTITIONED JOIN through the DSv2 provider (r16 verdict #3):
 * two tables written via the sink-demanded `graft.clusterBy` hash
 * exchange read back with their layout declared
 * (SupportsReportPartitioning + HasPartitionKey + the catalog's
 * `bucket` function), so an equi-join on the cluster keys plans with
 * ZERO shuffle exchanges — the DSv2 twin of the bucketed-catalog
 * reconcile configuration.
 */
class Dsv2BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fmt = classOf[GraftParquetProvider].getName

  private def shuffles(df: DataFrame): Int = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (if (p.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) 1
       else 0) + p.children.map(walk).sum
    walk(df.queryExecution.executedPlan)
  }

  private def withSpj[A](root: String)(f: String => A): A = {
    val cat = s"gspj_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f(cat)
    finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }

  private def withTmp[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-spj").toString
    try f(tmp)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  private def writeClustered(df: DataFrame, cat: String, table: String,
      cols: String, n: Int): Unit =
    df.writeTo(s"$cat.db.$table")
      .option(Dsv2Parquet.ClusterByOption, cols)
      .option(Dsv2Parquet.NumPartitionsOption, n.toString)
      .create()

  test("clustered write declares the layout; unclustered append retracts it") {
    withTmp { tmp =>
      withSpj(tmp) { cat =>
        val df = spark.range(100).select(col("id").as("k"),
          (col("id") * 2).as("v"))
        writeClustered(df, cat, "t", "k", 4)
        assert(Dsv2Parquet.clustering(s"$tmp/db/t",
          new org.apache.hadoop.conf.Configuration())
          .exists { case (c, n, _) => c.sameElements(Array("k")) && n == 4 })
        // unclustered append breaks the invariant → sidecar retracted
        df.limit(5).writeTo(s"$cat.db.t").append()
        assert(Dsv2Parquet.clustering(s"$tmp/db/t",
          new org.apache.hadoop.conf.Configuration()).isEmpty)
      }
    }
  }

  test("same-width clustered tables join with zero exchanges, exact result") {
    withTmp { tmp =>
      withSpj(tmp) { cat =>
        val left = spark.range(2000).select(col("id").as("k"),
          (col("id") % 97).as("lv"))
        val right = spark.range(1500).select(col("id").as("k"),
          (col("id") % 89).as("rv"))
        writeClustered(left, cat, "l", "k", 8)
        writeClustered(right, cat, "r", "k", 8)
        val joined = spark.table(s"$cat.db.l")
          .join(spark.table(s"$cat.db.r"), Seq("k"), "inner")
        assert(shuffles(joined) == 0,
          s"expected zero exchanges:\n${joined.queryExecution.executedPlan}")
        val got = joined.orderBy("k").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val exp = left.join(right, Seq("k"), "inner").orderBy("k").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(got.sameElements(exp))
      }
    }
  }

  test("full outer storage-partitioned join stays exchange-free") {
    withTmp { tmp =>
      withSpj(tmp) { cat =>
        val left = spark.range(0, 1200).select(col("id").as("k"),
          lit("L").as("side_l"))
        val right = spark.range(600, 2000).select(col("id").as("k"),
          lit("R").as("side_r"))
        writeClustered(left, cat, "fl", "k", 8)
        writeClustered(right, cat, "fr", "k", 8)
        val joined = spark.table(s"$cat.db.fl")
          .join(spark.table(s"$cat.db.fr"), Seq("k"), "full_outer")
        assert(shuffles(joined) == 0,
          s"expected zero exchanges:\n${joined.queryExecution.executedPlan}")
        assert(joined.count() == 2000L)
        assert(joined.filter(col("side_l").isNull).count() == 800L)
        assert(joined.filter(col("side_r").isNull).count() == 600L)
      }
    }
  }

  test("superset join keys accept single-component co-partitioning") {
    // Spark's key-grouped spec demands exactly one leaf per partition
    // transform, so a composite key co-locates on ONE component —
    // sufficient for the join (equal composite keys have equal
    // components) under requireAllClusterKeysForCoPartition=false.
    // This is the recon_classify_bucketed_dsv2 shape.
    withTmp { tmp =>
      withSpj(tmp) { cat =>
        val saved = spark.conf.getOption(
          "spark.sql.requireAllClusterKeysForCoPartition")
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
        try {
          val left = spark.range(1000).select((col("id") % 50).as("a"),
            col("id").as("b"), lit(1L).as("lv"))
          val right = spark.range(800).select((col("id") % 50).as("a"),
            col("id").as("b"), lit(2L).as("rv"))
          writeClustered(left, cat, "sl", "b", 8)
          writeClustered(right, cat, "sr", "b", 8)
          val joined = spark.table(s"$cat.db.sl")
            .join(spark.table(s"$cat.db.sr"), Seq("a", "b"), "full_outer")
          assert(shuffles(joined) == 0,
            s"expected zero exchanges:\n${joined.queryExecution.executedPlan}")
          assert(joined.count() == 1000L)
        } finally saved.fold(spark.conf.unset(
          "spark.sql.requireAllClusterKeysForCoPartition"))(
          spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", _))
      }
    }
  }

  test("sortWithin layout: SMJ plans with zero exchanges AND zero sorts") {
    withTmp { tmp =>
      withSpj(tmp) { cat =>
        def writeSorted(df: DataFrame, table: String): Unit =
          df.writeTo(s"$cat.db.$table")
            .option(Dsv2Parquet.ClusterByOption, "k")
            .option(Dsv2Parquet.NumPartitionsOption, "8")
            .option(Dsv2Parquet.SortWithinOption, "k")
            .create()
        val left = spark.range(2000).select(col("id").as("k"),
          (col("id") % 97).as("lv"))
        val right = spark.range(1500).select(col("id").as("k"),
          (col("id") % 89).as("rv"))
        writeSorted(left, "ol")
        writeSorted(right, "or_")
        val joined = spark.table(s"$cat.db.ol")
          .join(spark.table(s"$cat.db.or_"), Seq("k"), "inner")
        def sorts(p: org.apache.spark.sql.execution.SparkPlan): Int =
          (if (p.isInstanceOf[org.apache.spark.sql.execution.SortExec]) 1
           else 0) + p.children.map(sorts).sum
        val plan = joined.queryExecution.executedPlan
        assert(shuffles(joined) == 0, s"expected zero exchanges:\n$plan")
        assert(sorts(plan) == 0,
          s"expected the declared within-file sort to erase SortExec:\n$plan")
        val got = joined.orderBy("k").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val exp = left.join(right, Seq("k"), "inner").orderBy("k").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(got.sameElements(exp))
        // the committed files really ARE internally sorted — from the
        // bytes, via the _file metadata column
        val mono = spark.table(s"$cat.db.ol")
          .select(col("k"), col("_file").as("f"))
          .withColumn("prev", lag("k", 1).over(
            org.apache.spark.sql.expressions.Window.partitionBy("f")
              .orderBy(monotonically_increasing_id())))
        assert(mono.filter(col("prev") > col("k")).count() == 0L)
      }
    }
  }

  test("merge-on-read deletes preserve the storage-partitioned layout") {
    withTmp { tmp =>
      withSpj(tmp) { cat =>
        val a = spark.range(200).select(col("id").as("k"),
          (col("id") * 3).as("va"))
        val b = spark.range(200).select(col("id").as("k"),
          (col("id") * 7).as("vb"))
        a.writeTo(s"$cat.db.sa")
          .tableProperty(Dsv2Parquet.MergeModeProperty, Dsv2Parquet.MergeOnRead)
          .option(Dsv2Parquet.ClusterByOption, "k")
          .option(Dsv2Parquet.NumPartitionsOption, "4")
          .create()
        writeClustered(b, cat, "sb", "k", 4)
        // delta position deletes: no file rewritten, no insert — the
        // clustered layout claim survives (a subset of a bucket is
        // still exactly that bucket)
        spark.sql(s"DELETE FROM $cat.db.sa WHERE k % 10 = 3")
        val conf = new org.apache.hadoop.conf.Configuration()
        assert(Dsv2Parquet.hasDvs(s"$tmp/db/sa", conf))
        assert(Dsv2Parquet.clustering(s"$tmp/db/sa", conf).nonEmpty,
          "delete-only delta commit retracted the clustering sidecar")
        val j = spark.table(s"$cat.db.sa")
          .join(spark.table(s"$cat.db.sb"), "k")
        assert(shuffles(j) == 0, "MoR delete broke the zero-exchange join")
        assert(j.count() == 180L)
        assert(j.filter(col("k") % 10 === 3).count() == 0L)
      }
    }
  }

  test("bucket function matches the writer exchange's routing") {
    withTmp { tmp =>
      withSpj(tmp) { cat =>
        val df = spark.range(500).select(col("id").as("k"),
          concat(lit("s"), col("id")).as("s"))
        writeClustered(df, cat, "bf", "k", 8)
        // every row of every file must evaluate to the bucket in the
        // file's name under the catalog's bound function
        val bound = GraftBucketFunction.bind(org.apache.spark.sql.types
          .StructType.fromDDL("n INT, k BIGINT"))
          .asInstanceOf[GraftBucketBound]
        val perFile = spark.read.parquet(s"$tmp/db/bf")
          .select(col("k"), input_file_name().as("f")).collect()
        perFile.foreach { r =>
          val fileBucket = Dsv2Parquet.bucketOfFile(
            new org.apache.hadoop.fs.Path(r.getString(1)).getName).get
          val row = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](8, r.getLong(0)))
          assert(bound.produceResult(row) == fileBucket,
            s"k=${r.getLong(0)} file bucket $fileBucket")
        }
      }
    }
  }
}
