package graft.tools

import graft.operators.RelationalQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for operator stages (builder-side tool; the
 * question rotates per round — r06: decimal-vs-long money sums; r07:
 * the defensive dropDuplicates cost; results recorded in PLANS.md/
 * BASELINE.md). Round-10 question: q21's two count_distinct
 * aggregations were the slowest extended line (2.12s driver r9) — how
 * much does replacing them with min≠max multiplicity tests (full-fact
 * side) and a min/max window over the checkpointed lateF (late side)
 * recover? The r9 shape is inlined below as the baseline; the wired
 * query is the new shape. */
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

    /** The r9 q21 shape: per-order count_distinct on both the full fact
     * table and lateF, joined back. */
    def q21CountDistinct(): DataFrame = {
      def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
      val li = t("lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
      val fOrders = t("orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val lateF = li.join(fOrders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .localCheckpoint()
      val osup = li.groupBy(col("l_orderkey").as("a_orderkey"))
        .agg(count_distinct(col("l_suppkey")).as("nsup"))
      val lsup = lateF.groupBy(col("l_orderkey").as("b_orderkey"))
        .agg(count_distinct(col("l_suppkey")).as("nlate"))
      lateF
        .join(osup, col("l_orderkey") === col("a_orderkey"))
        .join(lsup, col("l_orderkey") === col("b_orderkey"))
        .filter(col("nsup") > 1 && col("nlate") === 1)
        .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }

    time("q21 r9 (2x count_distinct)")(q21CountDistinct())
    time("q21 r10 (min/max + window)")(RelationalQueries.q21WaitSuppliers(spark, dir))
    // results must be identical row-for-row
    val diff = RelationalQueries.q21WaitSuppliers(spark, dir)
      .except(q21CountDistinct())
      .union(q21CountDistinct().except(RelationalQueries.q21WaitSuppliers(spark, dir)))
      .count()
    println(s"q21 shape diff rows: $diff (must be 0)")
    spark.stop()
  }
}
