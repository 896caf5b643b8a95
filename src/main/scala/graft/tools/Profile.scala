package graft.tools

import graft.functions.ShingleFunctions._
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
    val d = docs.repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), shingle_hashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingle_hashes")(d.count())
    val banded = d.select(col("doc_id"),
      posexplode(minhash_bands(col("sh"), Dedup.NumBands, Dedup.RowsPerBand)))
      .toDF("doc_id", "band", "bucket")
    time("banded")(banded.count())
    time("full minhash query")(Dedup.dedupMinhashLsh(spark, dir).count())
    time("full minhash query again")(Dedup.dedupMinhashLsh(spark, dir).count())
    time("jaccard string path")(Dedup.dedupJaccardPairs(spark, dir).count())
    spark.stop()
  }
}
