package graft.operators

import graft.functions.LayoutFunctions.morton2
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Write-side data layout — the operations that decide how fast every
 * LATER query runs at 100 TB. Three tools:
 *
 *  - [[clusterByRange]]: range-partition + sort on the query keys, so
 *    each output file covers a disjoint key interval and parquet
 *    row-group min/max statistics prune point/range scans to a handful
 *    of files (the `ORDER BY` table layout of warehouse engines).
 *  - [[clusterByZOrder]]: the two-dimensional version — cluster on the
 *    Morton interleave of two key columns (codegen'd
 *    [[graft.functions.Morton2]] kernel), so filters on EITHER column
 *    prune, at a modest cost to each single column's clustering
 *    (Delta/Iceberg OPTIMIZE ZORDER semantics).
 *  - [[compact]]: bin-pack a directory of small files into
 *    ~`targetBytes` outputs — the small-file problem of incremental
 *    ingest; a coalesce (no shuffle) since only the file count shrinks.
 *
 * None of these change row contents — `q_zorder_values` oracle-checks
 * the Morton kernel itself value-level; LayoutSpec asserts the layout
 * properties (disjoint per-file ranges, file counts, row preservation).
 */
object Layout {

  /** Range-cluster `df` on `cols`: `partitions` output splits, each
   * sorted and covering a disjoint key interval. The range partitioner
   * samples split bounds, so skewed keys still yield balanced files. */
  def clusterByRange(df: DataFrame, partitions: Int, cols: Column*): DataFrame =
    df.repartitionByRange(partitions, cols: _*)
      .sortWithinPartitions(cols: _*)

  /** Z-order-cluster `df` on two integral key columns via their Morton
   * code. The code column is used for partitioning and intra-file order
   * only — it is not added to the output schema. */
  def clusterByZOrder(df: DataFrame, partitions: Int, x: Column, y: Column): DataFrame = {
    val z = morton2(x.cast("long"), y.cast("long"))
    df.repartitionByRange(partitions, z).sortWithinPartitions(z)
  }

  /** Compact the parquet directory `inDir` into ~`targetBytes` files at
   * `outDir`. Returns the ACTUAL written file count — coalesce can only
   * MERGE partitions, so when the computed target exceeds the scan's
   * partition count (a few oversized inputs with a small `targetBytes`)
   * the output has fewer files than the target; oversized files are
   * never split (splitting is a shuffle — use [[clusterByRange]] when
   * re-spreading is the goal). Coalesce, not repartition: merging
   * partitions needs no exchange, and the input order (e.g. a prior
   * clusterByRange) is preserved within each merged file. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    def parquetFiles(dir: String) = {
      val path = new org.apache.hadoop.fs.Path(dir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(path)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    }
    val totalBytes = parquetFiles(inDir).map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).coalesce(n)
      .write.mode("overwrite").parquet(outDir)
    parquetFiles(outDir).length
  }

  /** Oracle-checked Morton kernel query: the z-value of every document's
   * (doc_id, n_chars) pair — DuckDB restates the interleave as a 32-step
   * bit fold. */
  def qZorderValues(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"),
        morton2(col("doc_id"), col("n_chars")).as("zvalue"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder_values" -> qZorderValues)

  // NOTE: the fold's i=31 odd-bit term shifts <<63; DuckDB evaluates it
  // via HUGEINT promotion where Scala wraps into the long sign bit, so
  // the two agree only while doc_id and n_chars stay below 2^31. That
  // holds for doc ids and char counts at any testdata SF (and for any
  // realistic per-doc char count); a key domain reaching 2^31 would need
  // a pre-mask on BOTH sides, not a wider fold.
  val oracleSql: Map[String, String] = Map(
    "q_zorder_values" ->
      """SELECT doc_id, n_chars,
           CAST(list_sum(list_transform(range(0, 32),
             i -> (((doc_id >> i) & 1) << (2 * i))
                + (((n_chars >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS zvalue
         FROM documents""")
}
