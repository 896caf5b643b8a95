package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe (builder-side): does a Filter condition with TWO
 * size(tokens) higher-order-function evaluations cost 2× one? Decides
 * whether pipelineCurate's quality gate needs the materialize-first
 * treatment or whether codegen CSE already collapses the copies.
 *
 * MEASURED (r15, 100k docs, best of 3): between-2-evals 1.08-1.12s
 * vs single-eval 0.99-1.12s — the second HOF copy in a FILTER is
 * effectively free (CSE'd), so pipelineCurate's gate comment stands;
 * the lambda-free regexp_extract_all alternative reads 1.6-1.8s (the
 * regex engine loses to split+filter here), so do NOT "optimize" the
 * gate that way. The duplicate-tokenize tax IS real in PROJECT lists
 * computing several token-derived output columns: inlined-3× 2.12s vs
 * materialized-attribute 1.62s — which is why text_quality /
 * text_langid / text_quality_model materialize the token array first
 * (r15 plan audit). */
object TokGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .crossJoin(spark.range(20).select(col("id").as("_r")))
      .select(col("doc_id"), col("text")).localCheckpoint()
    println(s"rows=${d.count()}")
    def toks = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    def timeIt(name: String)(f: => Long): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }
      println(f"$name: ${ts.min}%.2fs")
    }
    timeIt("between-2-evals")(
      d.filter(size(toks).between(20, 100000)).count())
    timeIt("single-eval    ")(d.filter(size(toks) >= 20).count())
    timeIt("regexp-between ")(d.filter(
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
        .between(20, 100000)).count())
    // the PROJECT-list case (text_quality's old shape): several
    // token-derived output columns with the tokenizer inlined vs the
    // array materialized as an attribute first
    def execute(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    timeIt("project-inlined-3x") {
      execute(d.select(col("doc_id"),
        size(toks).as("a"),
        size(filter(toks, t => t.isin("the", "a"))).as("b"),
        (size(toks) > 10).as("c")))
      0L
    }
    timeIt("project-mat-attr  ") {
      execute(d.select(col("doc_id"), toks.as("t0"))
        .select(col("doc_id"),
          size(col("t0")).as("a"),
          size(filter(col("t0"), t => t.isin("the", "a"))).as("b"),
          (size(col("t0")) > 10).as("c")))
      0L
    }
    spark.stop()
  }
}
