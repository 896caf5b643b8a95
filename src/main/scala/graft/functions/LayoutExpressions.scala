package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Data-layout kernel: the Morton (Z-order) code used by
 * [[graft.operators.Layout.clusterByZOrder]] to cluster a table on TWO
 * dimensions at once, so parquet row-group min/max statistics prune
 * scans filtered on either column (the technique behind Delta/Iceberg
 * OPTIMIZE ZORDER). A codegen'd Expression — five mask-shift steps per
 * operand, no allocation — because it sits in the write path of
 * full-table layout jobs.
 */
object LayoutKernels extends Serializable {

  /** Spread the low 32 bits of `v` to the even bit positions. */
  def spreadBits(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton interleave of the low 32 bits of x (even bits) and
   * y (odd bits): nearby (x, y) points get nearby codes. */
  def morton2(x: Long, y: Long): Long =
    spreadBits(x) | (spreadBits(y) << 1)
}

/** `morton2(x, y)` over integral columns (low 32 bits interleaved). */
case class Morton2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "morton2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LayoutKernels.morton2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LayoutKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls.morton2($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Morton2 =
    copy(left = newLeft, right = newRight)
}

object LayoutFunctions {
  /** Morton (Z-order) code column; children must be LongType. */
  def morton2(x: Column, y: Column): Column =
    GraftSqlBridge.column(Morton2(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(y)))
}
