package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  AQEShuffleReadExec}
import org.apache.spark.sql.functions._

/** AQE skew-join is the FIRST-LINE skew device (SURVEY §8): a runtime
  * re-plan splits an oversized shuffle partition into advisory-sized
  * reads, with no query rewrite at all — manual salting
  * ([[graft.operators.Skew]]) remains for the cases AQE cannot reach:
  * skewed AGGREGATIONS (skewJoin only splits join partitions; a
  * groupBy hot key still lands on one reducer) and joins whose skewed
  * side must stay unsplit (e.g. a later same-key window relying on
  * partition co-location). This spec proves the runtime split on a
  * 50k-vs-1k hot-key corpus: with skewJoin on, the final adaptive
  * plan's join is marked skew=true and the skewed side fans out past
  * the static partition count; with it off, the same query keeps the
  * static reader (and both return identical results).
  */
class AqeSkewSpec extends SparkTestBase {

  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan
      .collectFirst { case a: AdaptiveSparkPlanExec => a }
      .map(_.executedPlan)
      .getOrElse(df.queryExecution.executedPlan)

  test("AQE splits the skewed join partition at runtime (skew=true, " +
      "reader fan-out) — no manual salting in the query") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        (256 * 1024).toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        (64 * 1024).toString,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0 carries 50k incompressible-padded rows (~3.5 MB in
      // one shuffle partition — far past threshold and 2× median);
      // keys 1..7 carry ~1.4k each
      def fact = spark.range(60000).selectExpr(
        "CASE WHEN id < 50000 THEN CAST(0 AS BIGINT) ELSE id % 8 END AS k",
        "concat(md5(cast(id AS string)), md5(cast(id + 7 AS string))) " +
          "AS pad")
      def dim = spark.range(8).selectExpr("id AS k",
        "md5(cast(id AS string)) AS dpad")
      def query = fact.join(dim, "k")
        .agg(sum(length(col("pad"))).as("pb"),
          sum(length(col("dpad"))).as("db"))

      val on = query
      val onRow = on.collect().head
      val onPlan = finalPlan(on)
      assert(onPlan.toString.contains("skew=true"),
        s"expected a skew-split SMJ:\n$onPlan")
      // AQE wraps materialized stages in QueryStageExec nodes that
      // TreeNode.collect does not descend into — walk them explicitly.
      // A PartialReducerPartitionSpec is the split itself: one reducer
      // partition read in byte-sliced pieces by parallel tasks.
      def splitReads(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[Int] = p.collect {
        case r: AQEShuffleReadExec => Seq(r.partitionSpecs.count(
          _.isInstanceOf[org.apache.spark.sql.execution
            .PartialReducerPartitionSpec]))
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          splitReads(s.plan)
      }.flatten
      val onSplits = splitReads(onPlan)
      // the hot partition really read as multiple partial slices
      assert(onSplits.nonEmpty && onSplits.max >= 2,
        s"expected the skewed partition split into >= 2 partial " +
          s"reads, got $onSplits\n$onPlan")

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val off = query
      val offRow = off.collect().head
      val offPlan = finalPlan(off)
      assert(!offPlan.toString.contains("skew=true"))
      assert(splitReads(offPlan).forall(_ == 0),
        s"no partial reads expected with skewJoin off:\n$offPlan")
      // the re-plan is a pure physical transform: identical answer
      assert(onRow.getLong(0) == offRow.getLong(0) &&
        onRow.getLong(1) == offRow.getLong(1))
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
