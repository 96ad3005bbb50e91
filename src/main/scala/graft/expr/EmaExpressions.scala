package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer-micro exponential moving average — the sequential scan of
  * `$expMovingAvg` as ONE linear pass per partition (the operator is
  * inherently order-recursive; a per-row window formulation would be
  * O(n²) in the partition).
  *
  * The recurrence is the generalized weighted form carried in EXACT
  * integer micros: s₁ = x₁·10⁶, sᵢ = ⌊(numX·xᵢ·10⁶ + numS·sᵢ₋₁) /
  * den⌋ — floor division so negative values bin identically on both
  * engines (the oracle replays the identical recurrence as a
  * recursive CTE). Mongo's N form is (numX, numS, den) = (2, N−1,
  * N+1) — α = 2/(N+1); the alpha form (r18) quantizes α to exact
  * parts-per-million A and runs (A, 10⁶−A, 10⁶). The float EMA Mongo
  * computes is index-internal precision; the engine's documented
  * surrogate is this micro-exact integerization (the textScore/cosµ
  * stance). Bounds keep every intermediate inside a long with
  * headroom (|x| ≤ 10⁶ and |s| ≤ ~10¹², so |num| ≤ numX·10¹² +
  * numS·10¹² ≤ 2·10¹⁸ in the worst alpha case — under Long.MaxValue
  * 9.2·10¹⁸): violations raise per row, never wrap. */
object IntEma {
  def scan(xs: ArrayData, numX: Long, numS: Long, den: Long)
      : ArrayData = {
    val len = xs.numElements()
    val out = new Array[Long](len)
    var s = 0L
    var i = 0
    while (i < len) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(
          "$expMovingAvg input must be non-null for every document " +
            "in the partition (route nulls out with $match first)")
      val x = xs.getLong(i)
      if (math.abs(x) > 1000000L)
        throw new IllegalArgumentException(
          s"$$expMovingAvg input out of the exact bracket |x| <= 1e6 " +
            s"(micro-integer state must stay inside a long): $x")
      s =
        if (i == 0) x * 1000000L
        else Math.floorDiv(numX * x * 1000000L + numS * s, den)
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class IntEmaScan(child: Expression, numX: Long, numS: Long,
    den: Long) extends UnaryExpression {
  require(numX > 0 && numS >= 0 && den > 0 && numX + numS == den,
    s"IntEmaScan weights must be a convex integer split of den: " +
      s"$numX + $numS != $den")
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    IntEma.scan(input.asInstanceOf[ArrayData], numX, numS, den)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.IntEma.scan($c, ${numX}L, ${numS}L, ${den}L)")
  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(c: Expression): IntEmaScan =
    copy(child = c)
}
