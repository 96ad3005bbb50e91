package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayContains, InSet,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, ByteType,
  DataType, IntegerType, LongType, ShortType, StringType}

/** Catalyst optimizer extension (`Rule[LogicalPlan]` — the third leg of
  * the extension architecture beside the expression family and the
  * planner strategy): rewrite `array_contains(<literal array>, x)` to
  * `InSet(x, <hash set>)`.
  *
  * Spark performs this strength reduction for `IN (…)` predicates
  * (OptimizeIn, threshold `spark.sql.optimizer.inSetConversionThreshold`)
  * but NOT for `array_contains` over a foldable array — which is the
  * form a broadcast-literal vocabulary naturally takes (the WordPiece /
  * Viterbi vocab probes run it once per candidate piece per position
  * per row). The rewrite turns an O(|vocab|) linear scan into an O(1)
  * hash probe.
  *
  * EXACT-semantics guard: for a null-free literal array,
  * `array_contains(arr, v)` is null iff v is null, else membership —
  * precisely `InSet`'s contract. An array CONTAINING null returns null
  * for misses (three-valued), which InSet does not replicate, so such
  * arrays are left untouched. Applied only past [[MinSize]] elements,
  * mirroring OptimizeIn's threshold logic.
  */
object LiteralArrayContainsToInSet extends Rule[LogicalPlan] {

  val MinSize = 8

  /** Flat-comparable element types (hash/equals on the internal value
    * is the SQL equality — nested types have their own semantics and
    * are left alone). Double/Float are EXCLUDED: InSet membership uses
    * boxed equals, under which -0.0 != 0.0 (and NaN == NaN), while
    * array_contains uses SQL equality (-0.0 == 0.0) — probing -0.0
    * against a literal array holding 0.0 would flip true→false after
    * the rewrite, so floating arrays are left to the linear scan. */
  private val flat: Set[DataType] = Set(StringType, LongType,
    IntegerType, ShortType, ByteType, BooleanType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayContains(Literal(data: ArrayData, ArrayType(et, _)), v)
          if flat.contains(et) && data.numElements() >= MinSize &&
            (0 until data.numElements()).forall(!data.isNullAt(_)) =>
        InSet(v, data.toObjectArray(et).toSet)
    }
}

/** Runtime registration for sessions built without
  * `spark.sql.extensions=graft.sql.GraftExtensions` — the optimizer
  * twin of [[NativeAsof.register]]. */
object GraftRules {
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations
        .contains(LiteralArrayContainsToInSet))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ LiteralArrayContainsToInSet
}
