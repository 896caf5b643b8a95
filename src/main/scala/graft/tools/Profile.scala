package graft.tools

import graft.functions.TextFunctions._
import graft.operators.Dedup
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("read")(docs.count())
    val toks = tokens(col("text"))
    time("tokens")(docs.select(size(toks).as("n")).agg(sum("n")).head().getLong(0))
    val d = docs.select(col("doc_id"), array_distinct(shingles(toks, 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles")(d.count())
    val sig = d.withColumn("sig", Dedup.minhashSignature(col("sh")))
    time("shingles+sig")(sig.count())
    val dc = d.cache()
    time("cache d")(dc.count())
    spark.stop()
  }
}
