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

/** Static kernel for [[SignedProjExpr]] — quantize-then-project in one
  * JVM loop. Parity contract with the composed form (and the DuckDB
  * oracle): quantization is Spark `round()` semantics (BigDecimal
  * HALF_UP on the float→double value times 1e6 — identical to
  * `round(x * 1e6)`), signs come from the same (i, j) integer mixer,
  * and accumulation is exact LONG math (order-free). */
object ProjMath {
  private val Scale = 1000000L

  def sign(i: Int, j: Int): Long =
    if ((i.toLong * 73856093L + j.toLong * 19349663L) % 97 < 48) 1L
    else -1L

  def quantize(x: Double): Long =
    java.math.BigDecimal.valueOf(x * Scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def project(a: ArrayData, projDim: Int): Any = {
    val n = a.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      q(i) = quantize(a.getFloat(i).toDouble)
      i += 1
    }
    val out = new Array[Long](projDim)
    var j = 0
    while (j < projDim) {
      var acc = 0L
      i = 0
      while (i < n) { acc += q(i) * sign(i + 1, j + 1); i += 1 }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Quantized signed random projection ARRAY<FLOAT> → ARRAY<LONG>
  * ([[graft.operators.Cluster.embedProject]]'s hot path): one static
  * call inside whole-stage codegen, replacing a projDim×dim flat
  * expression tree whose Janino compile dominated cold runs. */
case class SignedProjExpr(child: Expression, projDim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    ProjMath.project(input.asInstanceOf[ArrayData], projDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = graft.expr.ProjMath.project($c, $projDim);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
    """)
  override protected def withNewChildInternal(c: Expression): SignedProjExpr =
    copy(child = c)
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
