package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Range (interval-containment) join — match each point row to every
 * interval row of the same key with `start <= ts <= end`.
 *
 * Spark plans a raw inequality join as BroadcastNestedLoopJoin (O(|P|·|I|)
 * comparisons, a non-starter at scale). This implementation buckets time
 * into fixed-width bins: each interval explodes into the bins it covers
 * (≤ ⌈len/width⌉+1 rows — pick width ≈ the typical interval length so
 * this stays ~2), each point lands in exactly one bin, and the match
 * becomes an EQUI-join on (key, bin) + an exact containment filter.
 * One hash-shuffle join, no row explosion, AQE-skew-handled — the same
 * shape Flink/KDB interval joins lower to.
 *
 * A point joins each interval at most once (the point's single bin is
 * joined against the interval's copy in that bin), so no dedup pass is
 * needed.
 */
object RangeJoin {

  /**
   * @param points      point side; keeps all its columns
   * @param intervals   interval side; keeps all its columns (they must
   *                    not collide with point columns — alias upstream)
   * @param keys        equi-key columns present on both sides
   * @param pointTs     point timestamp column (LongType)
   * @param startCol    interval start column (LongType, inclusive)
   * @param endCol      interval end column (LongType, inclusive)
   * @param bucketWidth bin width in the ts unit
   */
  def pointsInIntervals(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTs: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def bin(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val i = intervals.withColumn("_bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val p = points.withColumn("_bin", bin(col(pointTs)))
    p.join(i, keys :+ "_bin")
      .filter(col(pointTs).between(col(startCol), col(endCol)))
      .drop("_bin")
  }
}
