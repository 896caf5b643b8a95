package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a typed
 * [[Aggregator]] — the point-frequency member of the sketch family
 * ([[KmvDistinct]]: cardinality, [[MisraGries]]: heavy hitters,
 * [[KllRankSketch]]: ranks): d×w counters, merge = elementwise sum
 * (so map-side partial aggregation applies and shards re-aggregate),
 * estimate = min over d rows, with the one-sided guarantee
 * estimate ≥ true count (every counter a term touches holds its full
 * count plus non-negative collision mass) and
 * estimate ≤ true + εN w.h.p. at w = e/ε.
 *
 * Row hashes reuse the repo's permutation family — row j's bucket is
 * `avalanche(h + (j+1)·GOLD) mod w` on the avalanche-widened term
 * hash, the EXACT construction of [[ShingleHash.minhashBands]] — so
 * the DuckDB oracle reproduces bucket indices, collision sums, and
 * the min itself value-for-value
 * ([[graft.operators.HashOracleSql.cmsCounts]]).
 *
 * Insertion is count-weighted: inserting (h, c) ≡ c unit inserts (the
 * sketch is linear in its input — property-tested), so the sketch can
 * be built EITHER from a raw occurrence stream (the 100 TB streaming
 * mode: fixed d·w state, no vocab-sized anything) or from an
 * already-aggregated (term, count) relation, identically.
 */
object CountMin extends Serializable {
  val Gold = 0x9e3779b97f4a7c15L

  /** Row-j bucket of avalanched term hash `h` (Long arithmetic wraps =
   * mod 2⁶⁴, matching the oracle's HUGEINT chain). */
  def bucket(h: Long, j: Int, w: Int): Int =
    java.lang.Long.remainderUnsigned(
      ShingleHash.avalanche(h + (j + 1) * Gold), w).toInt

  /** Add `c` to the d counters of `h` (mutates cells, laid out row-major
   * d×w). */
  def insert(cells: Array[Long], h: Long, c: Long, d: Int, w: Int): Unit = {
    var j = 0
    while (j < d) {
      cells(j * w + bucket(h, j, w)) += c
      j += 1
    }
  }

  /** Point estimate: min over the d counters of `h`. */
  def estimate(cells: Array[Long], h: Long, d: Int, w: Int): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < d) {
      val v = cells(j * w + bucket(h, j, w))
      if (v < best) best = v
      j += 1
    }
    best
  }
}

/** Aggregation buffer: the row-major d×w counter array. */
final case class CmsBuf(cells: Array[Long])

/** Aggregate (termHash, count) pairs into a [[CmsBuf]]; state is a
 * FIXED d·w·8 bytes regardless of input size. */
class CmsAgg(depth: Int, width: Int)
    extends Aggregator[(Long, Long), CmsBuf, CmsBuf] {
  require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")

  override def zero: CmsBuf = CmsBuf(new Array[Long](depth * width))

  override def reduce(b: CmsBuf, a: (Long, Long)): CmsBuf = {
    CountMin.insert(b.cells, a._1, a._2, depth, width)
    b
  }

  override def merge(b1: CmsBuf, b2: CmsBuf): CmsBuf = {
    val c1 = b1.cells
    val c2 = b2.cells
    var i = 0
    while (i < c1.length) { c1(i) += c2(i); i += 1 }
    b1
  }

  override def finish(r: CmsBuf): CmsBuf = r
  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
}

/** `hash64(s)`: the repo's 64-bit string hash — FNV-1a widened through
 * the xxHash64-finalizer avalanche ([[SimHash64.hash64]], the same
 * per-token kernel SimHash folds) — as a standalone codegen'd column. */
case class Hash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.hash64($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Hash64 =
    copy(child = newChild)
}

/** `cms_estimate(hash)`: row-local point-frequency lookup; the counter
 * array is a MODEL PARAMETER riding as one `ctx.addReferenceObj` slot
 * (the [[CentroidAssign]] pattern) — d·w·8 bytes shared per task
 * binary, O(1) generated code. */
case class CmsEstimate(child: Expression, cells: Array[Long], depth: Int,
    width: Int) extends UnaryExpression {
  require(cells.length == depth * width, "cells must be depth x width")
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(input: Any): Any =
    CountMin.estimate(cells, input.asInstanceOf[Long], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CountMin.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cs = ctx.addReferenceObj("cmsCells", cells, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.estimate($cs, $c, $depth, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object CmsFunctions {
  def hash64(c: Column): Column =
    GraftSqlBridge.column(Hash64(GraftSqlBridge.expression(c)))
  def cms_estimate(c: Column, cells: Array[Long], d: Int, w: Int): Column =
    GraftSqlBridge.column(
      CmsEstimate(GraftSqlBridge.expression(c), cells, d, w))
}
