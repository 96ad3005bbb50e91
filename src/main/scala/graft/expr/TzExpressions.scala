package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Baked zone-rules table for NAMED-timezone (DST) date arithmetic —
  * the device that makes named zones oracle-exact: both engines replay
  * the SAME transition table (this one, derived once from the JVM's
  * `java.time.zone.ZoneRules` and serialized into the oracle SQL as a
  * list literal), so the tzdata-vintage divergence that kept named
  * zones loud through r14 is gone by construction — there is exactly
  * one rules source, pinned to the build JVM's tzdata and bounded by
  * an explicit horizon past which lookups raise rather than freeze
  * the last rule.
  *
  * Layout: `offs(i)` applies to instants in `[trans(i), trans(i+1))`;
  * `trans(0) == Long.MinValue` (the pre-history offset — LMT or the
  * zone's standard time, exactly java.time's answer for early
  * instants). Recurring rules (the "every last Sunday of March"
  * form) are materialized year-by-year up to [[TzTable.HorizonYear]].
  *
  * Local→instant resolution is java.time's (ISO-8601 calendar):
  *  - unambiguous local time → its unique instant;
  *  - gap (spring-forward, local time does not exist) → the local
  *    shifts FORWARD by the gap length, i.e. instant = local − the
  *    pre-transition offset;
  *  - overlap (fall-back, local time exists twice) → the base
  *    instant's offset when the operation has a base and that offset
  *    is still valid (java.time's `withEarlierOffsetAtOverlap`
  *    context rule for arithmetic), else the EARLIER instant (the
  *    pre-transition, larger offset).
  * MongoDB's timelib agrees on the gap shift; its overlap choice is
  * not publicly specified, so divergence risk vs Mongo is confined to
  * the one repeated hour per transition per year and is documented at
  * the operator.
  */
final case class TzTable(zoneId: String, trans: Array[Long],
    offs: Array[Long], horizon: Long) {

  import TzTable.Probe

  /** Index of the interval containing instant t (last i with
    * trans(i) <= t) — binary search, O(log n), allocation-free. */
  private def idx(t: Long): Int = {
    var lo = 0
    var hi = trans.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (trans(mid) <= t) lo = mid else hi = mid - 1
    }
    lo
  }

  /** UTC offset (seconds) in force at instant t (epoch seconds). */
  def offsetAt(t: Long): Long = {
    if (t >= horizon)
      throw new IllegalArgumentException(
        s"instant past the baked tz horizon (${TzTable.HorizonYear}) " +
          s"for zone $zoneId — recurring DST rules beyond the horizon " +
          "are not materialized; widen TzTable.HorizonYear")
    offs(idx(t))
  }

  /** Local-frame seconds → epoch seconds under the resolution rules
    * above. `pref` is the preferred offset for overlaps (the base
    * instant's offset), or Long.MinValue for "no preference" (→ the
    * earlier instant). */
  def localToInstant(local: Long, pref: Long): Long = {
    // conservative horizon guard: both probes must stay in-table
    if (local + Probe >= horizon)
      throw new IllegalArgumentException(
        s"local time past the baked tz horizon (${TzTable.HorizonYear}) " +
          s"for zone $zoneId")
    val oB = offs(idx(local - Probe)) // offset on the "past" side
    val oA = offs(idx(local + Probe)) // offset on the "future" side
    if (oB == oA) local - oA
    else {
      // exactly one transition T inside (local-Probe, local+Probe]
      // (bake-time invariant: transitions > 2*Probe apart)
      val t = trans(idx(local + Probe))
      val lo = math.min(oA, oB)
      val hi = math.max(oA, oB)
      if (local < t + lo) local - oB // wholly before the transition
      else if (local >= t + hi) local - oA // wholly after
      else if (oA > oB) local - oB // gap: shift forward by the gap
      else if (pref == oA || pref == oB) local - pref // overlap, base valid
      else local - oB // overlap: earlier instant (pre-transition offset)
    }
  }
}

object TzTable {
  /** Probe half-window for local→instant: larger than any legal UTC
    * offset (±18:00), so instant candidates for a local time always
    * fall within ±Probe of it. */
  val Probe = 64800L

  /** First year NOT covered by the baked tables. 2200 (r18 — widened
    * from 2100 so forecasting pipelines projecting decades ahead stay
    * in-table) keeps a two-transitions-a-year zone's table at ~550
    * rows — still small enough to serialize into every oracle SQL as
    * list literals and to bind as a literal array in the codegen'd
    * expressions. tzdata itself only projects current law forward, so
    * the far years encode TODAY'S recurring rules — the honest
    * best-available answer, identical on both engines. Out-of-horizon
    * lookups RAISE at [[TzTable.offsetAt]]/[[TzTable.localToInstant]]
    * — widening is this one constant, never a silent last-rule
    * freeze. */
  val HorizonYear = 2200

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, TzTable]()

  /** Baked table for a named zone id (cached). Unknown ids raise with
    * java.time's message; zones with transitions closer together than
    * the probe window (no real tzdata zone is) raise at bake time. */
  def of(zone: String): TzTable =
    cache.computeIfAbsent(zone, z => bake(z))

  private def bake(zone: String): TzTable = {
    import scala.jdk.CollectionConverters._
    val rules = java.time.ZoneId.of(zone).getRules
    val horizon = java.time.LocalDateTime.of(HorizonYear, 1, 1, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond
    val hist = rules.getTransitions.asScala
      .filter(_.getInstant.getEpochSecond < horizon).toVector
    val first: Long = hist.headOption
      .map(_.getOffsetBefore.getTotalSeconds.toLong)
      .getOrElse(
        rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds.toLong)
    val tBuf = scala.collection.mutable.ArrayBuffer[Long](Long.MinValue)
    val oBuf = scala.collection.mutable.ArrayBuffer[Long](first)
    hist.foreach { tr =>
      tBuf += tr.getInstant.getEpochSecond
      oBuf += tr.getOffsetAfter.getTotalSeconds.toLong
    }
    // recurring rules: materialize per-year from the year after the
    // last historic transition through the horizon
    val recurring = rules.getTransitionRules.asScala.toVector
    if (recurring.nonEmpty) {
      val lastHist = hist.lastOption
        .map(_.getInstant.getEpochSecond).getOrElse(Long.MinValue)
      val startYear = hist.lastOption
        .map(_.getInstant.atZone(java.time.ZoneOffset.UTC).getYear)
        .getOrElse(1900)
      val rec = (startYear to HorizonYear).flatMap(y =>
          recurring.map(_.createTransition(y)))
        .map(tr => (tr.getInstant.getEpochSecond,
          tr.getOffsetAfter.getTotalSeconds.toLong))
        .filter { case (t, _) => t > lastHist && t < horizon }
        .sortBy(_._1)
      rec.foreach { case (t, o) => tBuf += t; oBuf += o }
    }
    val trans = tBuf.toArray
    val offs = oBuf.toArray
    // invariants the lookup algorithms rely on
    var i = 2 // skip the MinValue sentinel gap
    while (i < trans.length) {
      require(trans(i) - trans(i - 1) > 2 * Probe + 7200,
        s"zone $zone has transitions closer than the probe window " +
          s"at ${trans(i)} — unsupported")
      i += 1
    }
    require(offs.forall(o => math.abs(o) <= 18L * 3600),
      s"zone $zone has an offset outside the ISO envelope")
    TzTable(zone, trans, offs, horizon)
  }
}

/** `offsetAt` as a native expression: one virtual call into the baked
  * table per row (binary search, allocation-free), staying inside
  * whole-stage codegen. Child is epoch SECONDS (long). */
case class ZoneOffsetAtExpr(child: Expression, table: TzTable)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(t: Any): Any =
    table.offsetAt(t.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tzTable", table,
      classOf[TzTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.offsetAt($c);")
  }
  override protected def withNewChildInternal(c: Expression)
      : ZoneOffsetAtExpr = copy(child = c)
}

/** `localToInstant` as a native expression. Left = local-frame
  * seconds; right = preferred offset for overlaps (Long.MinValue for
  * none). */
case class ZoneLocalToInstantExpr(left: Expression, right: Expression,
    table: TzTable) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override protected def nullSafeEval(l: Any, p: Any): Any =
    table.localToInstant(l.asInstanceOf[Long], p.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tzTable", table,
      classOf[TzTable].getName)
    nullSafeCodeGen(ctx, ev,
      (l, p) => s"${ev.value} = $ref.localToInstant($l, $p);")
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ZoneLocalToInstantExpr = copy(left = l, right = r)
}
