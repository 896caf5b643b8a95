package graft.tools

import graft.operators.RelationalQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for operator stages (builder-side tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    time("read count")(li.count())
    time("q1 cold")(RelationalQueries.q1PricingSummary(spark, dir).count())
    time("q1 warm")(RelationalQueries.q1PricingSummary(spark, dir).count())
    val rep = li
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .repartition(32)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,4)")), 2).cast("double").as("sum_base_price"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")), 2).cast("double").as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(sum(col("l_discount").cast("decimal(18,4)")).cast("double") / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
    time("q1 repartitioned")(rep.count())
    time("q1 repartitioned again")(rep.count())
    val longSum = li
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"),
        (col("l_extendedprice") * 100).cast("long").as("price_c"),
        ((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000).cast("long").as("disc_price_dm"),
        (col("l_discount") * 100).cast("long").as("disc_c"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("price_c")) / 100.0, 2).as("sum_base_price"),
        round(sum(col("disc_price_dm")) / 10000.0, 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round((sum(col("disc_c")) / 100.0) / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
    time("q1 long-scaled")(longSum.count())
    time("q1 long-scaled again")(longSum.count())
    spark.stop()
  }
}
