package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
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

object VectorFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSim(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def hyperplane_bucket(v: Column, numPlanes: Int): Column =
    GraftSqlBridge.column(HyperplaneBucket(GraftSqlBridge.expression(v), numPlanes))
}
