package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** A NATIVE as-of join — the whole-operator Catalyst extension path the
  * brief reserves for semantics Spark's built-ins can't express as one
  * operator: custom `LogicalPlan` node → `SparkStrategy` → `SparkPlan`,
  * entering the session through `experimental.extraStrategies` (and the
  * `SparkSessionExtensions.injectPlannerStrategy` path in
  * [[graft.sql.GraftExtensions]]).
  *
  * Semantics: for every left row, the single right row with the same
  * key and the LARGEST time ≤ the left time (backward as-of, ties
  * match), emitting the right value column or null — i.e. DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`.
  *
  * Physical shape — the point of going native: the exec DECLARES
  * `ClusteredDistribution` on each side's key and per-partition
  * `(key, time)` ordering, so EnsureRequirements plants exactly one
  * hash exchange per side plus in-partition sorts (the sort-merge-join
  * shape), and the operator itself is a single O(n+m) forward merge
  * with O(1) state — no union row inflation, no window buffer, no
  * range explosion. At 100 TB this is one co-partitioned shuffle pair
  * and a streaming merge per partition, the same scale class as the
  * engine's union+window formulation ([[graft.operators.Relational
  * .asofJoin]], kept as the pure-DataFrame twin) minus the union
  * materialization and window machinery.
  *
  * Contract (kept deliberately narrow — the gate projects to it): key,
  * time and value columns are long-backed (LONG or TIMESTAMP/NTZ) and
  * key/time are non-null; the value column may emit null (no match).
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
    leftKeyIdx: Int, leftTimeIdx: Int,
    rightKeyIdx: Int, rightTimeIdx: Int, rightValueIdx: Int)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output :+ right.output(rightValueIdx).withNullability(true)

  // the node consumes EVERY child column (ordinal-addressed), so
  // parent-driven column pruning must not narrow the children — without
  // this, references is empty and the optimizer prunes the right child
  // out from under the ordinals
  override def references: org.apache.spark.sql.catalyst.expressions
      .AttributeSet =
    org.apache.spark.sql.catalyst.expressions
      .AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoin =>
      AsofJoinExec(planLater(j.left), planLater(j.right),
        j.leftKeyIdx, j.leftTimeIdx, j.rightKeyIdx, j.rightTimeIdx,
        j.rightValueIdx, j.output) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeyIdx: Int, leftTimeIdx: Int,
    rightKeyIdx: Int, rightTimeIdx: Int, rightValueIdx: Int,
    output: Seq[Attribute])
  extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(left.output(leftKeyIdx))) ::
      ClusteredDistribution(Seq(right.output(rightKeyIdx))) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(leftKeyIdx), Ascending),
      SortOrder(left.output(leftTimeIdx), Ascending)),
    Seq(SortOrder(right.output(rightKeyIdx), Ascending),
      SortOrder(right.output(rightTimeIdx), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val (lki, lti) = (leftKeyIdx, leftTimeIdx)
    val (rki, rti, rvi) = (rightKeyIdx, rightTimeIdx, rightValueIdx)
    val outAttrs = output
    val leftAttrs = left.output
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      // bind the output attributes against (left row ++ 1-field value
      // row) — emits UnsafeRows so any downstream operator can consume
      val proj = UnsafeProjection.create(outAttrs, leftAttrs :+ outAttrs.last)
      val joined = new JoinedRow
      val valueRow = new GenericInternalRow(1)
      // single forward merge, O(1) state: the right cursor plus the
      // latest right row at-or-before the current left (key, time)
      // loud on the contract breach the entry-point types can't see:
      // parquet attributes are nullable, and a null key/time slot would
      // silently read as 0 through getLong and produce wrong matches
      def nonNull(row: InternalRow, i: Int, side: String): Unit =
        if (row.isNullAt(i)) throw new IllegalStateException(
          s"as-of join: null $side key/time at ordinal $i — " +
            "key and time columns must be non-null")
      def nextRight(): InternalRow =
        if (rit.hasNext) {
          val r = rit.next().copy()
          nonNull(r, rki, "right"); nonNull(r, rti, "right"); r
        } else null
      var rHead: InternalRow = nextRight()
      var curVal = 0L
      var curNull = false // matched row carried a NULL value — propagate
      var curValid = false
      var curKey = 0L
      lit.map { lrow =>
        nonNull(lrow, lki, "left"); nonNull(lrow, lti, "left")
        val lk = lrow.getLong(lki)
        val lt = lrow.getLong(lti)
        if (curValid && curKey != lk) curValid = false
        while (rHead != null && (rHead.getLong(rki) < lk ||
            (rHead.getLong(rki) == lk && rHead.getLong(rti) <= lt))) {
          if (rHead.getLong(rki) == lk) {
            curNull = rHead.isNullAt(rvi)
            curVal = if (curNull) 0L else rHead.getLong(rvi)
            curValid = true
            curKey = lk
          }
          rHead = nextRight()
        }
        if (curValid && !curNull) valueRow.update(0, curVal)
        else valueRow.update(0, null)
        proj(joined(lrow, valueRow))
      }
    }
  }
}

/** Public entry: build the node from analyzed children and register the
  * strategy on the session (idempotent) — sessions built with
  * `spark.sql.extensions=graft.sql.GraftExtensions` already carry it. */
object NativeAsof {

  def register(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsofJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsofJoinStrategy

  /** `left` as-of-joined to `right` on equal key and the largest right
    * time ≤ left time; appends `right`'s value column (nullable).
    * Column positions are resolved by NAME here, then carried as
    * ordinals in the plan node. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightValue: String): DataFrame = {
    val s = left.sparkSession
    register(s)
    val l = left.queryExecution.analyzed
    val r = right.queryExecution.analyzed
    def idx(p: LogicalPlan, name: String): Int = {
      val i = p.output.indexWhere(_.name == name)
      require(i >= 0, s"column $name not found in ${p.output.map(_.name)}")
      i
    }
    // enforce the documented contract LOUDLY: key/time must be
    // long-backed (the exec reads them with getLong — any other type
    // would reinterpret bits, and a null would silently read as 0)
    def longBacked(p: LogicalPlan, i: Int, role: String): Unit = {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType,
        TimestampType}
      val a = p.output(i)
      require(Seq(LongType, TimestampType, TimestampNTZType)
        .contains(a.dataType),
        s"as-of $role column '${a.name}' must be LONG or TIMESTAMP " +
          s"(long-backed), got ${a.dataType}")
    }
    val (lk, ltc) = (idx(l, leftKey), idx(l, leftTime))
    val (rk, rtc, rv) =
      (idx(r, rightKey), idx(r, rightTime), idx(r, rightValue))
    longBacked(l, lk, "left key"); longBacked(l, ltc, "left time")
    longBacked(r, rk, "right key"); longBacked(r, rtc, "right time")
    longBacked(r, rv, "right value")
    org.apache.spark.sql.graft.PlanBridge.ofRows(s,
      AsofJoin(l, r, lk, ltc, rk, rtc, rv))
  }
}
