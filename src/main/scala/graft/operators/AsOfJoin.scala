package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of (temporal backward) join — for each left row, the single latest
 * right row with `right.ts <= left.ts` per key. Spark has no native as-of
 * operator; the naive formulation (range join + per-key max) explodes to
 * O(|L|·|R|) per key before pruning.
 *
 * This implementation is the scalable composition: tag both sides, UNION,
 * and carry the most recent right payload forward with one
 * `last(_, ignoreNulls)` window per key ordered by (ts, side) — right
 * rows sort before left rows at equal ts, so ties match (`>=`
 * semantics, same as DuckDB/Pandas ASOF). Cost: ONE shuffle + sort of
 * |L|+|R| rows on the key — no row multiplication at any scale, skew
 * bounded by the hottest key like any windowed op.
 *
 * The right payload travels as a single struct so the carried columns
 * stay row-atomic (a null value inside a newer right row never falls
 * back to an older row's value).
 */
object AsOfJoin {

  /**
   * @param left  probe side; all its columns are preserved
   * @param right build side
   * @param keys  equi-join key columns (present on both sides)
   * @param tsCol ordering column name (present on both sides; any
   *              orderable type, typically epoch micros LongType)
   * @param carry right-side columns to attach (prefixed `r_`)
   * @param inner when true drop left rows with no prior right row
   *              (ASOF JOIN); when false keep them with nulls (ASOF LEFT
   *              JOIN)
   */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      carry: Seq[String],
      inner: Boolean = true): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val rStructType = StructType(carry.map(c => right.schema(c)))

    val lSel: Seq[Column] = keys.map(col) ++ Seq(
      col(tsCol).as("_ts"), lit(1).as("_side")) ++
      leftPayload.map(col) ++
      Seq(lit(null).cast(rStructType).as("_r"))
    val rSel: Seq[Column] = keys.map(col) ++ Seq(
      col(tsCol).as("_ts"), lit(0).as("_side")) ++
      leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      Seq(struct(carry.map(col): _*).as("_r"))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = left.select(lSel: _*)
      .unionByName(right.select(rSel: _*))
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val pruned = if (inner) carried.filter(col("_r").isNotNull) else carried
    val out = keys.map(col) ++ Seq(col("_ts").as(tsCol)) ++
      leftPayload.map(col) ++
      carry.map(c => col("_r").getField(c).as(s"r_$c"))
    pruned.select(out: _*)
  }
}
