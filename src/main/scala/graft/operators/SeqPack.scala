package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM pretraining: lay the corpus out as one
 * contiguous token stream in a canonical document order and cut it into
 * fixed-capacity context windows ("bins"). Every document is assigned
 * the bin where its first token lands — the classic concat-and-chunk
 * packing that turns variable-length documents into fixed-shape
 * training batches.
 *
 * The core primitive is a GLOBAL RUNNING TOTAL, which a naive
 * `Window.orderBy(...)` computes on a SINGLE task (Spark moves every
 * row to one partition — a non-starter at 100 TB). [[runningTotal]] is
 * the distributed two-pass prefix sum instead, entirely declarative:
 *
 *  1. derive a deterministic CONTIGUOUS block key
 *     (`orderKey DIV blockSize` — a pure function of the key, unlike
 *     `spark_partition_id()`, whose nondeterminism also defeats
 *     exchange reuse),
 *  2. cumulative-sum WITHIN each block (window keyed by the block —
 *     one hash exchange of the data, blocks processed in parallel),
 *  3. per-block totals → exclusive prefix offsets. The totals
 *     aggregate partial-sums map-side, so its exchange carries one row
 *     per block; the ordered offset window is single-task over the
 *     BLOCK COUNT, never the data,
 *  4. broadcast the offsets back and add.
 *
 * The result depends only on the global key order — block placement
 * cancels out — so it is identical under any input partitioning and
 * any blockSize (spec-checked) and matches the oracle's single-window
 * cumsum bit-for-bit (integer arithmetic throughout).
 */
object SeqPack {

  /** Append `outCol` = running total of `valueCol` in ascending
   * `orderCol` order (inclusive prefix sum), distributed as described
   * above. `orderCol` must be a unique non-negative integer key (it is
   * the total order; DIV-blocking assumes sign-free division). Pick
   * `blockSize` so a block's rows fit one task comfortably — result is
   * blockSize-independent. */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, blockSize: Long = 1L << 16): DataFrame = {
    val blocked = df.withColumn("_blk",
      expr(s"CAST($orderCol AS BIGINT) DIV $blockSize"))
    val wIn = Window.partitionBy("_blk").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = blocked.withColumn("_cum", sum(col(valueCol)).over(wIn))
    val wOff = Window.orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blocked.groupBy("_blk")
      .agg(sum(col(valueCol)).as("_btot"))
      .withColumn("_off", coalesce(sum(col("_btot")).over(wOff), lit(0L)))
      .select("_blk", "_off")
    within.join(broadcast(offsets), Seq("_blk"))
      .withColumn(outCol, col("_cum") + col("_off"))
      .drop("_blk", "_cum")
  }

  /** Contiguous packing: documents in `doc_id` order form one token
   * stream; each doc's bin is where its FIRST token falls
   * (`(running − n) / capacity` in exact integer math). Docs may
   * straddle a boundary — that is the semantics of concat-and-chunk
   * pretraining, where windows are cut mid-document. */
  def packContiguous(d: DataFrame, capacity: Long): DataFrame =
    packCounts(
      d.select(col("doc_id"), size(tokens(col("text"))).cast("bigint").as("n_tokens")),
      capacity)

  /** The packing core over an explicit `(doc_id, n_tokens)` relation —
   * shared by the whitespace form and the subword-count twin. */
  def packCounts(counts: DataFrame, capacity: Long): DataFrame =
    runningTotal(counts, "doc_id", "n_tokens", "running_total")
      // integer DIV, not Column./ (double division) — exact at any
      // magnitude and identical to the oracle's `//` for non-negatives
      .withColumn("bin_id",
        expr(s"CAST((running_total - n_tokens) DIV $capacity AS BIGINT)"))
      .select("doc_id", "n_tokens", "running_total", "bin_id")

  /** Wired query: the documents corpus packed into 2048-token windows. */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packContiguous(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"), 2048L)

  /** Packing re-based on SUBWORD counts (r13 verdict #1): the context
   * window is a 2048-SUBWORD budget, so bin boundaries move relative to
   * the whitespace twin (the corpus measures ~3× more subword tokens).
   * Cost over the whitespace form is the codegen'd encode kernel inside
   * the same scan; the distributed prefix sum is unchanged. */
  def packSequencesSubword(spark: SparkSession, dir: String): DataFrame = {
    val model = graft.operators.TextAnalysis.subwordModel(spark, dir)
    packCounts(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), tokens(col("text")).as("t0"))
        .select(col("doc_id"),
          size(graft.functions.SubwordFunctions.subword_encode(col("t0"), model))
            .cast("bigint").as("n_tokens")),
      2048L)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pack_sequences" -> packSequences,
    "pack_sequences_subword" -> packSequencesSubword)

  val oracleSql: Map[String, String] = Map(
    "pack_sequences" ->
      """WITH d AS (
           SELECT doc_id,
             len(list_filter(regexp_split_to_array(text, '\s+'),
                             t -> len(t) > 0)) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
           FROM d)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(running AS BIGINT) AS running_total,
           CAST((running - n_tokens) // 2048 AS BIGINT) AS bin_id
         FROM c""",
    "pack_sequences_subword" ->
      s"""WITH RECURSIVE ${graft.operators.TextAnalysis.subwordCtes()},
         pc AS (
           SELECT doc_id, n_subword_tokens AS n_tokens,
             sum(n_subword_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
           FROM sw)
         SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(running AS BIGINT) AS running_total,
           CAST((running - n_tokens) // 2048 AS BIGINT) AS bin_id
         FROM pc""")
}
