package graft.tools

import graft.MvSyncDemo
import graft.config.Settings
import graft.reconcile.MvReconciler
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler for operator stages (builder-side tool; the
 * question rotates per round — r06's decimal-vs-long money-sum
 * experiments are recorded in PLANS.md/BASELINE.md). Round-7 question:
 * how much of the reconcile cost is the defensive per-side
 * dropDuplicates (first-element cogroup parity, MvSync.java:325-338),
 * which is pure overhead when the source guarantees unique PKs —
 * every real Cassandra scan does (Settings.trustUniquePk). Timings use
 * the bench's noop sink (count() lets Catalyst prune expressions — it
 * under-measures). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      noop(df) // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(df); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-34s median=${ts(1)}%6.2fs  (${ts.mkString(", ")})")
    }

    def classified(s: Settings): DataFrame =
      MvReconciler.reconcile(
        MvSyncDemo.baseDf(spark, dir), MvSyncDemo.mvDf(spark, dir),
        MvSyncDemo.baseSchema, MvSyncDemo.mvSchema, s)
        .select("o_custkey", "o_orderkey", "problem", "mismatch_col")

    time("recon_classify parity (dedup)")(classified(Settings()))
    time("recon_classify trustUniquePk")(classified(Settings(trustUniquePk = true)))
    spark.stop()
  }
}
