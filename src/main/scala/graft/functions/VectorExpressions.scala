package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native vector kernels for the similarity operators. The composable
 * forms (`aggregate(zip_with(...))`) evaluate interpreted — higher-order
 * functions have no codegen — and allocate a zipped array per row pair;
 * these expressions run the same arithmetic in a tight generated-code
 * loop.
 *
 * Bit-exactness: [[VectorKernels.cosineFloat]] reproduces the sequential
 * left-fold evaluation order of the previous
 * `aggregate(zip_with(a,b,*), 0.0, +)` form (and of DuckDB's
 * `list_cosine_similarity`) — each float is widened to double, products
 * accumulate left-to-right, `dot / (sqrt(na) * sqrt(nb))` — so the
 * DuckDB oracle hash-match is preserved to the last ulp.
 */
object VectorKernels extends Serializable {

  /** Cosine similarity of two float vectors in double precision. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
   * an avalanche-hash-derived uniform in [-1, 1). */
  def planeComponent(plane: Int, dim: Int): Double = {
    val h = ShingleHash.avalanche(
      (plane.toLong + 1) * 0x9e3779b97f4a7c15L + (dim.toLong + 1) * 0xff51afd7ed558ccdL)
    ((h >>> 11).toDouble / (1L << 52).toDouble) * 2.0 - 1.0
  }

  /** [[cosineFloat]] against a plain `float[]` centroid — same widen-to-
   * double sequential left fold, so a centroid shipped as a reference
   * object scores bit-identically to one shipped as an array literal. */
  def cosineAgainst(a: ArrayData, cent: Array[Float]): Double = {
    val n = math.min(a.numElements(), cent.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = cent(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Negated cosine with NaN mapped to +∞ — reproduces Spark's total
   * ordering over the previous `(−sim, cid)` struct form, where a NaN
   * score sorts greatest and therefore never wins over a real score
   * (NaN arises only from a zero/empty vector). */
  private def negScore(v: ArrayData, cent: Array[Float]): Double = {
    val ns = -cosineAgainst(v, cent)
    if (java.lang.Double.isNaN(ns)) Double.PositiveInfinity else ns
  }

  /** Argmax centroid id: highest cosine, tie → lowest position (the
   * matrix rows are sorted by cid, so lowest position = lowest cid —
   * the oracle's `ORDER BY cos DESC, cid`). One O(C·dim) pass; the
   * generated code is a single call regardless of C. */
  def centroidArgmax(v: ArrayData, matrix: Array[Array[Float]], cids: Array[Int]): Int = {
    var best = negScore(v, matrix(0))
    var bestPos = 0
    var j = 1
    while (j < matrix.length) {
      val s = negScore(v, matrix(j))
      if (s < best) { best = s; bestPos = j }
      j += 1
    }
    cids(bestPos)
  }

  /** Top-k centroid ids by (cosine desc, cid asc): one scoring pass plus
   * an O(C·k) selection — k is the probe count (tiny). */
  def centroidTopK(v: ArrayData, matrix: Array[Array[Float]], cids: Array[Int],
      k: Int): ArrayData = {
    val c = matrix.length
    val scores = new Array[Double](c)
    var j = 0
    while (j < c) { scores(j) = negScore(v, matrix(j)); j += 1 }
    val taken = new Array[Boolean](c)
    val kk = math.min(k, c)
    val out = new Array[Int](kk)
    var r = 0
    while (r < kk) {
      var bestPos = -1
      var best = Double.PositiveInfinity
      var i = 0
      while (i < c) {
        // strict < keeps the earliest (lowest-cid) position on ties
        if (!taken(i) && scores(i) < best) { best = scores(i); bestPos = i }
        i += 1
      }
      // all remaining +∞ (NaN scores): fall back to lowest untaken cid
      if (bestPos < 0) { var i2 = 0; while (taken(i2)) i2 += 1; bestPos = i2 }
      taken(bestPos) = true
      out(r) = cids(bestPos)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane LSH bucket: bit p = sign(v · h_p), p < numPlanes. */
  def hyperplaneBucket(v: ArrayData, numPlanes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        proj += v.getFloat(i).toDouble * planeComponent(p, i)
        i += 1
      }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** `cosine_sim(a, b)` over `array<float>` columns. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.cosineFloat($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `hyperplane_bucket(v, numPlanes)`: random-hyperplane LSH signature. */
case class HyperplaneBucket(child: Expression, numPlanes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneBucket(input.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.hyperplaneBucket($c, $numPlanes);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/**
 * `centroid_assign(v)`: id of the highest-cosine centroid (tie → lowest
 * cid). The centroid matrix is a MODEL PARAMETER, not a child expression:
 * it rides into the generated code as one `ctx.addReferenceObj` slot, so
 * code size stays O(1) in C — the previous form expanded all C centroid
 * vectors as array literals inside one projection, an O(N·C)-literals
 * expression tree that hit both a compute and a generated-code-size wall
 * near C ≈ 10³ (r9 verdict). Arithmetic is [[VectorKernels.cosineAgainst]]
 * — bit-identical to the literal form, so oracle hashes are unchanged.
 */
case class CentroidAssign(child: Expression, matrix: Array[Array[Float]],
    cids: Array[Int]) extends UnaryExpression {
  require(matrix.nonEmpty && matrix.length == cids.length,
    "centroid_assign needs a non-empty centroid model (an empty fit means " +
      "the quantizer was trained on an empty sample — fail here, not with " +
      "an index error mid-task)")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_assign"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.centroidArgmax(input.asInstanceOf[ArrayData], matrix, cids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val m = ctx.addReferenceObj("centroidMatrix", matrix, "float[][]")
    val ids = ctx.addReferenceObj("centroidIds", cids, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.centroidArgmax($c, $m, $ids);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidAssign =
    copy(child = newChild)
}

/** `centroid_topk(v, k)`: the k highest-cosine centroid ids, ordered
 * (cosine desc, cid asc) — the IVF probe list. Same reference-object
 * centroid matrix as [[CentroidAssign]]. */
case class CentroidTopK(child: Expression, matrix: Array[Array[Float]],
    cids: Array[Int], k: Int) extends UnaryExpression {
  require(matrix.nonEmpty && matrix.length == cids.length && k > 0,
    "centroid_topk needs a non-empty centroid model and k > 0")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_topk"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.centroidTopK(input.asInstanceOf[ArrayData], matrix, cids, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val m = ctx.addReferenceObj("centroidMatrix", matrix, "float[][]")
    val ids = ctx.addReferenceObj("centroidIds", cids, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.centroidTopK($c, $m, $ids, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopK =
    copy(child = newChild)
}

object VectorFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSim(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def hyperplane_bucket(v: Column, numPlanes: Int): Column =
    GraftSqlBridge.column(HyperplaneBucket(GraftSqlBridge.expression(v), numPlanes))
  def centroid_assign(v: Column, matrix: Array[Array[Float]], cids: Array[Int]): Column =
    GraftSqlBridge.column(CentroidAssign(GraftSqlBridge.expression(v), matrix, cids))
  def centroid_topk(v: Column, matrix: Array[Array[Float]], cids: Array[Int], k: Int): Column =
    GraftSqlBridge.column(CentroidTopK(GraftSqlBridge.expression(v), matrix, cids, k))
}
