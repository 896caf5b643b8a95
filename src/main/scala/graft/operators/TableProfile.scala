package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Table profiling — the ANALYZE/statistics-collection surface of an
 * analytics engine: per-column row/null/distinct counts and min/max
 * bounds in ONE pass over the table. These are the numbers a cost-based
 * optimizer, a data-quality monitor, or a layout planner (Layout)
 * consumes. Two narrow passes, each hash-aggregated:
 *  - counts + typed min/max: ONE global aggregate, partial per
 *    partition, no grouping → no sort, no shuffle beyond 1 row per
 *    partition;
 *  - exact distinct counts: stack to (column, rendered-value) pairs —
 *    rendering is injective per type, so distinctness is preserved —
 *    then a two-level hash aggregate whose exchange carries only the
 *    per-partition-deduped pairs (~Σ per-column distincts).
 * The tempting one-pass multi-count_distinct aggregate is WORSE at any
 * scale: Catalyst plans it as Expand (k+1 row-copies of every row) into
 * a SortAggregate keyed on all k columns at once (string min/max keeps
 * it out of hash aggregation) — a wide sort of k×N rows. Measured at
 * sf0.1: 3.8s one-pass → hash-friendly split below (the parquet scan
 * is the cheap part; it's the sort that doesn't survive 100 TB).
 *
 * Rendering: min/max are strings so one long schema serves every
 * column type. Doubles are rendered as exact cent integers (the
 * engine-portable fixed-point trick from `exactMoneySum`) — double
 * min/max themselves are exact (no accumulation), only their decimal
 * RENDERING differs across engines, so the cents form pins the oracle.
 */
object TableProfile {

  /** How a column's min/max render into the profile string. */
  sealed trait Render
  case object Verbatim extends Render
  case object Cents extends Render

  /** One profile row per listed column:
   * (column, n_rows, n_nulls, n_distinct, min_value, max_value). */
  def profile(df: DataFrame, cols: Seq[(String, Render)]): DataFrame = {
    def rendered(f: Column => Column, name: String, r: Render): Column = r match {
      case Verbatim => f(col(name)).cast("string")
      case Cents => round(f(col(name)) * 100).cast("long").cast("string")
    }
    // pass 1: row/null counts + typed min/max (min before rendering —
    // string ordering is NOT numeric ordering), global aggregate
    val aggs: Seq[Column] = cols.flatMap { case (name, r) =>
      Seq(
        count(col(name)).as(s"cnt_$name"),
        rendered(min, name, r).as(s"min_$name"),
        rendered(max, name, r).as(s"max_$name"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stacked = cols.map { case (name, _) =>
      s"'$name', cnt_$name, min_$name, max_$name"
    }.mkString(", ")
    val bounds = one.select(col("n_rows"), expr(
      s"stack(${cols.size}, $stacked) AS (column, n_nonnull, min_value, max_value)"))
    // pass 2: exact distinct counts over narrow (column, value) pairs;
    // CAST→STRING is injective for the profiled types so the count is
    // exact, and the plan stays a two-level HASH aggregate (null value
    // rows are count_distinct-ignored, like count(DISTINCT x)).
    // Float/double columns are normalized `+ 0.0` first: IEEE754 maps
    // -0.0 + 0.0 → 0.0, so the string count agrees with numeric DISTINCT
    // (which treats ±0.0 as one value) even when the data carries -0.0.
    val pairs = cols.map { case (name, _) =>
      val isFp = df.schema.find(_.name == name).exists(f =>
        f.dataType == org.apache.spark.sql.types.DoubleType ||
          f.dataType == org.apache.spark.sql.types.FloatType)
      val v = if (isFp) s"($name + 0.0)" else name
      s"'$name', CAST($v AS STRING)"
    }.mkString(", ")
    val distincts = df
      .select(expr(s"stack(${cols.size}, $pairs) AS (column, v)"))
      .groupBy("column").agg(count_distinct(col("v")).as("n_distinct"))
    // LEFT join + coalesce: an EMPTY table has no (column, value) pairs
    // at all, so the distinct side is empty — the profile must still
    // emit one all-zero row per column, not zero rows (r9 advice)
    bounds.join(broadcast(distincts), Seq("column"), "left")
      .select(col("column"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
  }

  /** Wired profile of the orders table (all six columns). */
  def qProfileOrders(spark: SparkSession, dir: String): DataFrame =
    profile(spark.read.parquet(s"$dir/orders.parquet"), Seq(
      "o_orderkey" -> Verbatim,
      "o_custkey" -> Verbatim,
      "o_orderstatus" -> Verbatim,
      "o_totalprice" -> Cents,
      "o_orderdate" -> Verbatim,
      "o_orderpriority" -> Verbatim))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_orders" -> qProfileOrders)

  private def colSql(name: String, minMax: String => String): String =
    s"""SELECT '$name' AS "column", count(*) AS n_rows,
        count(*) - count($name) AS n_nulls,
        count(DISTINCT $name) AS n_distinct,
        ${minMax(s"min($name)")} AS min_value,
        ${minMax(s"max($name)")} AS max_value FROM orders"""

  private def verbatim(e: String) = s"CAST($e AS VARCHAR)"
  private def cents(e: String) = s"CAST(CAST(round($e * 100) AS BIGINT) AS VARCHAR)"

  val oracleSql: Map[String, String] = Map(
    "q_profile_orders" -> Seq(
      colSql("o_orderkey", verbatim),
      colSql("o_custkey", verbatim),
      colSql("o_orderstatus", verbatim),
      colSql("o_totalprice", cents),
      colSql("o_orderdate", verbatim),
      colSql("o_orderpriority", verbatim)).mkString(" UNION ALL "))
}
