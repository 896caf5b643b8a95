package graft.tools

import graft.operators.RelationalQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for operator stages (builder-side tool). Round-6
 * question: where do q1's 3.2s / q3's 2.8s go (driver BENCH_r05), and
 * is the decimal(18,4) cast-sum-cast round trip or the single-row-group
 * scan the bottleneck? Timings use the bench's noop sink (count() lets
 * Catalyst prune the aggregate expressions — it under-measures). */
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

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val filtered = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))

    time("q1 current")(RelationalQueries.q1PricingSummary(spark, dir))
    time("q1 double-sum") {
      filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }
    time("q1 spread-scan") {
      filtered.repartition(32).groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice").cast("decimal(18,4)")), 2).cast("double").as("sum_base_price"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")), 2).cast("double").as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(sum(col("l_discount").cast("decimal(18,4)")).cast("double") / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }
    time("q1 cents-long") {
      filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0, 2).as("sum_base_price"),
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long")) / 10000.0, 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(sum(round(col("l_discount") * 100).cast("long")) / 100.0 / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }
    time("q1 cents-decimal20") {
      filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(round(col("l_extendedprice") * 100).cast("long").cast("decimal(20,0)")).cast("double") / 100.0, 2).as("sum_base_price"),
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long").cast("decimal(20,0)")).cast("double") / 10000.0, 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(sum(round(col("l_discount") * 100).cast("long").cast("decimal(20,0)")).cast("double") / 100.0 / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }
    time("q3 current")(RelationalQueries.q3ShippingPriority(spark, dir))

    // q3 stages in isolation
    val cutoff = lit("1998-03-15").cast("timestamp")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") < cutoff)
    val li2 = li.filter(col("l_shipdate") > cutoff)
    time("q3 joins-only") {
      li2.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select("l_orderkey", "o_orderpriority", "l_extendedprice", "l_discount")
    }
    time("q3 double-sum") {
      li2.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }
    time("q3 spread-scan") {
      li2.repartition(32).join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderpriority"))
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")), 2).cast("double").as("revenue"))
    }
    spark.stop()
  }
}
