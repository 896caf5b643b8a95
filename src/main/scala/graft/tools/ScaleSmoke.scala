package graft.tools

import graft.MvSyncDemo
import graft.config.Settings
import graft.reconcile.MvReconciler
import graft.report.StatsCollector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale smoke (builder-side tool): replicate the sf0.1 orders-derived
 * base/MV pair `factor`× with shifted keys (distinct key space, same
 * damage distribution) and run the full classify pipeline — evidence
 * that the single-shuffle reconcile plan holds when the key count grows
 * 40×, not just at the bench SF.
 *
 * Usage: sbt "runMain graft.tools.ScaleSmoke [factor]"
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(40)
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(factor).select(col("id").as("_rep")))
        .withColumn("o_orderkey",
          col("o_orderkey") + col("_rep") * 10000000L)
        .drop("_rep")
        .repartition(64)

    val base = replicate(MvSyncDemo.baseDf(spark, dir))
    val mv = replicate(MvSyncDemo.mvDf(spark, dir))
    val t0 = System.nanoTime()
    val classified = MvReconciler.reconcile(
      base, mv, MvSyncDemo.baseSchema, MvSyncDemo.mvSchema, Settings())
    val stats = StatsCollector.collect(classified)
    val secs = (System.nanoTime() - t0) / 1e9
    val keys = stats.totRecords
    println(f"[scale-smoke] factor=$factor keys=$keys classify+count=${secs}%.1fs " +
      f"(${keys / secs / 1e6}%.2fM keys/s)")
    println(s"[scale-smoke] $stats")
    spark.stop()
  }
}
