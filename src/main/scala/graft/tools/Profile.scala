package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler (builder-side; rotates per round). r21 question #6:
 * q2's min-cost join — rsupply ⋈ (groupBy partkey min cost) runs as an
 * SMJ with two exchanges; the min side is ~20k rows (broadcastable),
 * or the whole self-join collapses into a min-over-window. */
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
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    def supEu = t("supplier")
      .join(t("nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t("region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    def rsupply = t("lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(supEu.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice")).as("cost"))
      .localCheckpoint()
    def finish(joined: DataFrame) = joined
      .join(broadcast(t("part").filter(col("p_size") === 15)
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supEu), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("cost"))

    time("q2 current (SMJ vs min agg)") {
      val rs = rsupply
      val minc = rs.groupBy(col("l_partkey").as("m_partkey"))
        .agg(min(col("cost")).as("m_cost"))
      finish(rs.join(minc,
        col("l_partkey") === col("m_partkey") && col("cost") === col("m_cost")))
    }
    time("q2 broadcast(minc)") {
      val rs = rsupply
      val minc = rs.groupBy(col("l_partkey").as("m_partkey"))
        .agg(min(col("cost")).as("m_cost"))
      finish(rs.join(broadcast(minc),
        col("l_partkey") === col("m_partkey") && col("cost") === col("m_cost")))
    }
    time("q2 window min over partkey") {
      val rs = rsupply
      val w = Window.partitionBy("l_partkey")
      finish(rs.withColumn("m_cost", min(col("cost")).over(w))
        .filter(col("cost") === col("m_cost")).drop("m_cost"))
    }
    time("q2 window, no checkpoint") {
      val rs = t("lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(supEu.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice")).as("cost"))
      val w = Window.partitionBy("l_partkey")
      finish(rs.withColumn("m_cost", min(col("cost")).over(w))
        .filter(col("cost") === col("m_cost")).drop("m_cost"))
    }
    spark.stop()
  }
}
