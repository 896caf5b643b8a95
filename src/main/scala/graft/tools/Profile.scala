package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler. r21 question #10b: in-session A/B of the decon
 * dictionary memo — per-pass dictionary jobs + automaton rebuild
 * (dictCacheKey=None) vs the memoized path the wired queries now use. */
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
    def d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    time("exact_substring UNCACHED (key=None)") {
      Curation.exactContamination(
        d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0))
    }
    time("exact_substring MEMOIZED (wired)") {
      Curation.deconExactSubstring(spark, dir)
    }
    time("exact_tiled UNCACHED (key=None)") {
      Curation.exactContaminationTiled(
        d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0))
    }
    time("exact_tiled MEMOIZED (wired)") {
      Curation.deconExactTiled(spark, dir)
    }
    // r22 question: minhash signature-table materialization vs kernel
    // recompute at sf0.1 (the 40× smoke's r11 ranking inverted this
    // round — recompute got ~2× faster since r11's record)
    locally {
      import graft.operators.Dedup
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      time("minhash pairs MATERIALIZED (wired default)") {
        Dedup.minhashLshPairs(docs, materialize = true)
      }
      time("minhash pairs RECOMPUTE (materialize=false)") {
        Dedup.minhashLshPairs(docs, materialize = false)
      }
    }
    // r22 question: the AllTypes classify over a per-JVM checkpointed
    // fixture vs over the fresh range() derivation every action paid
    // before (same reconcile, same 22-type matrix)
    locally {
      import graft.reconcile.{AllTypesFixture, MvReconciler}
      import graft.config.Settings
      val trusted = Settings(trustUniquePk = true)
      def classify(b: org.apache.spark.sql.DataFrame,
          m: org.apache.spark.sql.DataFrame) =
        MvReconciler.reconcile(b, m,
          AllTypesFixture.schema, AllTypesFixture.schema, trusted)
          .select("id", "problem", "mismatch_col", "mismatch_base", "mismatch_mv")
      time("alltypes classify DERIVE-PER-ACTION (old)") {
        classify(AllTypesFixture.derive(spark, mvSide = false),
          AllTypesFixture.derive(spark, mvSide = true))
      }
      time("alltypes classify FIXTURE MEMO (wired)") {
        classify(AllTypesFixture.base(spark), AllTypesFixture.mv(spark))
      }
    }
    spark.stop()
  }
}
