package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector arithmetic over ARRAY<DOUBLE> — the hot inner loop of
  * every kNN/ANN operator. The composed `zip_with`+`aggregate` form has
  * the same semantics but evaluates its lambdas interpreted, per element;
  * these are one-pass JVM loops reached via a single codegen'd static
  * call.
  *
  * Bit-compatibility contract (same as the oracle twins): per-element ops
  * are exact IEEE-754 doubles, accumulation is index order — identical
  * bits to the HOF fold and DuckDB's list_sum comprehension.
  *
  * Length mismatch returns null, mirroring `zip_with`'s null padding
  * poisoning the sum (can't happen for fixed-dim embedding columns, but
  * semantics must not silently differ).
  */
object VectorMath {

  def l2sq(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null element poisons the fold, as in the composed zip_with form
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def dot(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def normSq(a: ArrayData): Any = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getDouble(i); acc += v * v; i += 1
    }
    acc
  }
}

/** Base for the binary double-array expressions. */
abstract class VectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  protected def staticName: String
  override protected def nullSafeEval(a: Any, b: Any): Any =
    call(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def call(a: ArrayData, b: ArrayData): Any
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = s"graft.expr.VectorMath.$staticName"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = $f($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) r).doubleValue(); }
    """)
  }
}

case class L2SqExpr(left: Expression, right: Expression)
    extends VectorBinary {
  override protected def staticName: String = "l2sq"
  override protected def call(a: ArrayData, b: ArrayData): Any =
    VectorMath.l2sq(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): L2SqExpr = copy(left = l, right = r)
}

case class DotExpr(left: Expression, right: Expression)
    extends VectorBinary {
  override protected def staticName: String = "dot"
  override protected def call(a: ArrayData, b: ArrayData): Any =
    VectorMath.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DotExpr = copy(left = l, right = r)
}

case class NormSqExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    VectorMath.normSq(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = graft.expr.VectorMath.normSq($c);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) r).doubleValue(); }
    """)
  override protected def withNewChildInternal(c: Expression): NormSqExpr =
    copy(child = c)
}
