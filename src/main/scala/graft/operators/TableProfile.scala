package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Table profiling — the ANALYZE/statistics-collection surface of an
 * analytics engine: per-column row/null/distinct counts and min/max
 * bounds in ONE pass over the table. These are the numbers a cost-based
 * optimizer, a data-quality monitor, or a layout planner (Layout)
 * consumes; at 100 TB the single-pass property is the whole point —
 * the multi-distinct aggregate runs as Spark's Expand (k row-copies
 * map-side, partial-aggregated before the one exchange), never k scans.
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

  /** One profile row per listed column, computed in a single aggregate
   * pass: (column, n_rows, n_nulls, n_distinct, min_value, max_value). */
  def profile(df: DataFrame, cols: Seq[(String, Render)]): DataFrame = {
    def rendered(f: Column => Column, name: String, r: Render): Column = r match {
      case Verbatim => f(col(name)).cast("string")
      case Cents => round(f(col(name)) * 100).cast("long").cast("string")
    }
    val aggs: Seq[Column] = cols.flatMap { case (name, r) =>
      Seq(
        count(col(name)).as(s"cnt_$name"),
        count_distinct(col(name)).as(s"dst_$name"),
        rendered(min, name, r).as(s"min_$name"),
        rendered(max, name, r).as(s"max_$name"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stacked = cols.map { case (name, _) =>
      s"'$name', cnt_$name, dst_$name, min_$name, max_$name"
    }.mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stacked) AS (column, n_nonnull, n_distinct, min_value, max_value)"))
      .select(col("column"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
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
