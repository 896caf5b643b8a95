package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/**
 * Co-located join via bucketed tables — the pre-shuffle strategy for
 * repeated large joins at 100 TB: both sides written bucketed+sorted on
 * the join key join WITHOUT any shuffle exchange (and without a sort,
 * when sortBy matches). Verified against the physical plan, not just
 * results.
 */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
    (if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0) +
      p.children.map(shuffles).sum

  /** The 100 TB recon story made concrete: base and MV written bucketed
   * (+sorted) by the MV PK join exchange-free through the ENTIRE
   * classify plan — dropDuplicates' aggregate and the full-outer join
   * both have their clustered-distribution requirement satisfied by the
   * bucketing, so the one reconcile shuffle disappears entirely. A
   * periodic 100 TB reconcile job would write both scans bucketed once
   * and re-run classification with zero data movement. */
  test("full reconcile over MV-PK-bucketed tables plans zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_recon_base")
    spark.sql("DROP TABLE IF EXISTS b_recon_mv")
    val dir = "/root/testdata/sf0.001"
    graft.MvSyncDemo.baseDf(spark, dir).write
      .bucketBy(8, "o_custkey", "o_orderkey")
      .sortBy("o_custkey", "o_orderkey")
      .mode("overwrite").saveAsTable("b_recon_base")
    graft.MvSyncDemo.mvDf(spark, dir).write
      .bucketBy(8, "o_custkey", "o_orderkey")
      .sortBy("o_custkey", "o_orderkey")
      .mode("overwrite").saveAsTable("b_recon_mv")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val classified = graft.reconcile.MvReconciler.reconcile(
        spark.table("b_recon_base"), spark.table("b_recon_mv"),
        graft.MvSyncDemo.baseSchema, graft.MvSyncDemo.mvSchema)
      val exec = classified.queryExecution.executedPlan
      assert(shuffles(exec) == 0,
        s"bucketed reconcile should plan no exchange:\n$exec")

      // identical classification to the plain-parquet reconcile
      def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
        df.groupBy("problem").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = counts(graft.reconcile.MvReconciler.reconcile(
        graft.MvSyncDemo.baseDf(spark, dir), graft.MvSyncDemo.mvDf(spark, dir),
        graft.MvSyncDemo.baseSchema, graft.MvSyncDemo.mvSchema))
      assert(counts(classified) == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("join of two tables bucketed on the key plans no shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // force a non-broadcast join so bucketing (not table size) decides,
    // and disable AQE so the static executedPlan is inspectable
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      checkBucketedJoin()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  private def checkBucketedJoin(): Unit = {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy("o_orderpriority").count()

    val exec = joined.queryExecution.executedPlan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0) +
        p.children.map(shuffles).sum
    // the join itself is exchange-free; only the final tiny groupBy
    // aggregation may shuffle its partial results
    val joinSubtree = exec.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joinSubtree.isDefined, s"no shuffled join found:\n$exec")
    assert(shuffles(joinSubtree.get) == 0,
      s"bucketed join should not shuffle:\n${joinSubtree.get}")
    // and the result matches the plain-parquet join
    val expected = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
