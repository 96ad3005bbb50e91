package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayContains,
  ArrayExists, ArrayFilter, ArrayPosition, Cast, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, InSet, LambdaFunction, LessThan,
  LessThanOrEqual, Literal, Not, Size}
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

/** Shared zero/one literal probes for the count-comparison rewrites —
  * comparisons arrive type-coerced, so the literal is Int against a raw
  * `size(...)` and Long against a `cast(size(...) as bigint)` or an
  * `array_position(...)` (which is natively Long). */
private[plans] object CmpLit {
  def isZero(e: Expression): Boolean = e match {
    case Literal(0, IntegerType)  => true
    case Literal(0L, LongType)    => true
    case _                        => false
  }
  def isOne(e: Expression): Boolean = e match {
    case Literal(1, IntegerType)  => true
    case Literal(1L, LongType)    => true
    case _                        => false
  }
}

/** Strength reduction Spark lacks: `size(filter(arr, p)) > 0` (and its
  * `>= 1` / `= 0` mirror forms) → `exists(arr, p)` with
  * nulls-as-false. The left shape materializes the WHOLE filtered
  * array and counts it; `exists` short-circuits on the first
  * satisfying element — on a stopword probe over a long document the
  * predicate usually hits within the first few tokens.
  *
  * EXACT-semantics guards:
  *  - `Size.legacySizeOfNull` must be false (the Spark 3+ default):
  *    then `size(null)` is null and every rewritten comparison is null,
  *    exactly matching `exists(null, p)`. Under the legacy flag
  *    `size(null)` is -1 (comparisons turn false, not null) — no
  *    rewrite.
  *  - The rewritten [[ArrayExists]] carries
  *    `followThreeValuedLogic = false`: `filter` keeps only
  *    predicate-TRUE elements, so a row with no true and some null
  *    predicates counts 0 (false), which is nulls-as-false `exists` —
  *    NOT the 3VL default (which would return null there).
  *  - Single-argument lambdas only: `filter` also accepts an
  *    `(elem, idx)` form `exists` has no counterpart for.
  */
object SizeOfFilterToExists extends Rule[LogicalPlan] {

  /** Unwrap `size(filter(...))`, tolerating a widening integral cast
    * (size is always in [0, 2^31), so `cast(size(x) as bigint) > 0L`
    * is the same predicate). */
  private def filtered(e: Expression): Option[ArrayFilter] = e match {
    case Size(f @ ArrayFilter(_, fn: LambdaFunction), false)
        if fn.arguments.size == 1 => Some(f)
    case c: Cast if c.dataType == LongType => filtered(c.child)
    case _ => None
  }

  private def ex(f: ArrayFilter): Expression =
    ArrayExists(f.argument, f.function, followThreeValuedLogic = false)

  import CmpLit._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // some element passes: size > 0 | size >= 1 | 0 < size | 1 <= size
      case GreaterThan(s, z) if isZero(z) && filtered(s).isDefined =>
        ex(filtered(s).get)
      case GreaterThanOrEqual(s, o) if isOne(o) && filtered(s).isDefined =>
        ex(filtered(s).get)
      case LessThan(z, s) if isZero(z) && filtered(s).isDefined =>
        ex(filtered(s).get)
      case LessThanOrEqual(o, s) if isOne(o) && filtered(s).isDefined =>
        ex(filtered(s).get)
      // no element passes: size = 0 | 0 = size | size <= 0 | size < 1
      case EqualTo(s, z) if isZero(z) && filtered(s).isDefined =>
        Not(ex(filtered(s).get))
      case EqualTo(z, s) if isZero(z) && filtered(s).isDefined =>
        Not(ex(filtered(s).get))
      case LessThanOrEqual(s, z) if isZero(z) && filtered(s).isDefined =>
        Not(ex(filtered(s).get))
      case LessThan(s, o) if isOne(o) && filtered(s).isDefined =>
        Not(ex(filtered(s).get))
    }
}

/** Strength reduction: `array_position(<literal array>, v) > 0` (and
  * mirrors) → `InSet(v, <hash set>)` — the membership-test spelling of
  * [[LiteralArrayContainsToInSet]]. A literal-vocabulary stopword probe
  * written with `array_position` is an O(|vocab|) linear scan per call;
  * the rewrite makes it an O(1) hash probe. Fires inside higher-order
  * lambdas too (the natural home of the shape: `filter(tokens, t =>
  * array_position(stopwords, t) > 0)`), where it composes with
  * [[SizeOfFilterToExists]].
  *
  * EXACT-semantics notes:
  *  - `array_position` never matches null ELEMENTS (they're skipped),
  *    so a null-bearing literal array is safely rewritten by dropping
  *    its nulls from the set — unlike array_contains there is no
  *    three-valued miss to preserve.
  *  - null PROBE → null on both sides (InSet contract).
  *  - Same flat-type restriction as the contains rule: Double/Float
  *    excluded (InSet's boxed equals vs SQL equality on -0.0/NaN).
  */
object ArrayPositionToInSet extends Rule[LogicalPlan] {

  val MinSize = 8

  private val flat: Set[DataType] = Set(StringType, LongType,
    IntegerType, ShortType, ByteType, BooleanType)

  private def member(e: Expression): Option[Expression] = e match {
    case ArrayPosition(Literal(data: ArrayData, ArrayType(et, _)), v)
        if flat.contains(et) && data.numElements() >= MinSize =>
      val elems = data.toObjectArray(et).filter(_ != null)
      Some(InSet(v, elems.toSet))
    case _ => None
  }

  import CmpLit._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // membership: pos > 0 | pos >= 1 | 0 < pos | 1 <= pos
      case GreaterThan(p, z) if isZero(z) && member(p).isDefined =>
        member(p).get
      case GreaterThanOrEqual(p, o) if isOne(o) && member(p).isDefined =>
        member(p).get
      case LessThan(z, p) if isZero(z) && member(p).isDefined =>
        member(p).get
      case LessThanOrEqual(o, p) if isOne(o) && member(p).isDefined =>
        member(p).get
      // absence: pos = 0 | 0 = pos | pos <= 0 | pos < 1
      case EqualTo(p, z) if isZero(z) && member(p).isDefined =>
        Not(member(p).get)
      case EqualTo(z, p) if isZero(z) && member(p).isDefined =>
        Not(member(p).get)
      case LessThanOrEqual(p, z) if isZero(z) && member(p).isDefined =>
        Not(member(p).get)
      case LessThan(p, o) if isOne(o) && member(p).isDefined =>
        Not(member(p).get)
    }
}

/** Runtime registration for sessions built without
  * `spark.sql.extensions=graft.sql.GraftExtensions` — the optimizer
  * twin of [[NativeAsof.register]]. */
object GraftRules {
  val all: Seq[Rule[LogicalPlan]] = Seq(LiteralArrayContainsToInSet,
    ArrayPositionToInSet, SizeOfFilterToExists)
  def register(s: SparkSession): Unit =
    all.foreach { r =>
      if (!s.experimental.extraOptimizations.contains(r))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ r
    }
}
