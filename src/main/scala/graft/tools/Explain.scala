package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan auditor (builder-side tool): dump formatted plans of the named
 * queries so pushdown/pruning/broadcast/shuffle shape can be reviewed. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("recon_classify", "q1_pricing_summary", "q5_local_supplier",
        "dedup_minhash_lsh", "q_asof_join", "q_range_join",
        "q10_returned_items", "q19_disjunctive", "text_repetition",
        "q_profile_orders")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-explain-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      if (n == "bucketed_recon") explainBucketedRecon(spark, dir)
      else if (n == "dsv2_scan") explainDsv2Scan(spark, dir)
      else SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }

  /** Audit target for the zero-exchange bucketed reconcile
   * (BucketedJoinSpec): base+MV saved bucketed by the MV PK, then the
   * full classify plan — expect no Exchange node anywhere. */
  private def explainBucketedRecon(spark: SparkSession, dir: String): Unit = {
    import graft.MvSyncDemo
    spark.sql("DROP TABLE IF EXISTS x_recon_base")
    spark.sql("DROP TABLE IF EXISTS x_recon_mv")
    MvSyncDemo.baseDf(spark, dir).write.bucketBy(8, "o_custkey", "o_orderkey")
      .sortBy("o_custkey", "o_orderkey").mode("overwrite").saveAsTable("x_recon_base")
    MvSyncDemo.mvDf(spark, dir).write.bucketBy(8, "o_custkey", "o_orderkey")
      .sortBy("o_custkey", "o_orderkey").mode("overwrite").saveAsTable("x_recon_mv")
    // restore the session confs afterwards — later queries in the same
    // invocation must be audited under the engine defaults
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try graft.reconcile.MvReconciler.reconcile(
      spark.table("x_recon_base"), spark.table("x_recon_mv"),
      MvSyncDemo.baseSchema, MvSyncDemo.mvSchema).explain("formatted")
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** Audit target for the DataSource V2 seam (Dsv2ParquetSpec): the
   * base table written to parquet, re-read through
   * [[graft.sources.GraftParquetProvider]] with a projection and a
   * filter — expect the GraftParquetScan node's PushedFilters and
   * pruned ReadSchema lines to show Catalyst's pruneColumns/pushFilters
   * reached the source. */
  private def explainDsv2Scan(spark: SparkSession, dir: String): Unit = {
    import graft.MvSyncDemo
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsv2-explain").toString
    try {
      MvSyncDemo.baseDf(spark, dir).write.parquet(s"$tmp/base")
      graft.sources.Dsv2ParquetSource(s"$tmp/base")
        .load(spark, MvSyncDemo.baseSchema)
        .filter(col("o_orderkey") > 1000L && col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .explain("formatted")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }
}
