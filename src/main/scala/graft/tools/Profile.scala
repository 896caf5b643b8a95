package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler (builder-side; rotates per round). r21 question #8:
 * the reconcile core's full-outer join runs as SortMergeJoin (two
 * sorts). Spark 3.3+ supports full-outer shuffled-hash; is the
 * SHUFFLE_HASH hint a win at the bench shape, and does it hold for the
 * whole classify (diff expressions after the join)? SMJ spills
 * gracefully at scale, so only a decisive local win + a bounded build
 * side would justify switching. */
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
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      noop(df)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); noop(df); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-44s median=${ts(2)}%6.2fs  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val Trusted = graft.config.Settings(trustUniquePk = true)
    time("recon_classify (SMJ, current)") {
      graft.operators.ReconQueries.reconClassify(spark, dir)
    }
    time("recon_classify with SHUFFLE_HASH session pref") {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      try graft.operators.ReconQueries.reconClassify(spark, dir)
      finally spark.conf.unset("spark.sql.join.preferSortMergeJoin")
    }
    spark.stop()
  }
}
