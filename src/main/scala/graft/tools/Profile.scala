package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler for operator stages (builder-side tool; the
 * question rotates per round — r06: decimal-vs-long money sums; r07:
 * the defensive dropDuplicates cost; r10: q21 count_distinct vs
 * min/max multiplicity, measured 2.12s → 1.18s, recorded in
 * BASELINE.md). Round-15 question: the BPE encode kernel applies V'
 * literal replaces per word (allocating a fresh string each) where
 * subword_encode does O(len·maxLen) hash probes — how do the three
 * tokenizer rows compare at the bench SF, and is BPE's extended line
 * going to read as a regression when it lands? ANSWER (sf0.1, median
 * of 3 warmed): whitespace 0.38s, subword 0.56s, BPE 0.72s unmemoized
 * → 0.49s with the model-scoped word→pieces memo (the HF-tokenizers
 * cache; Zipfian corpora make the hit rate ~100%), i.e. BPE encode
 * lands at subword-kernel parity. */
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
      println(f"$name%-34s median=${ts(1)}%6.2fs  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    time("text_tokens (whitespace)")(TextAnalysis.textTokens(spark, dir))
    time("text_tokens_subword (hash probes)")(TextAnalysis.textTokensSubword(spark, dir))
    time("text_tokens_bpe (V' replaces)")(TextAnalysis.textTokensBpe(spark, dir))
    spark.stop()
  }
}
