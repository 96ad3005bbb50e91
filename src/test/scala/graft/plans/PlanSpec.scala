package graft.plans

import graft.SparkTestBase
import graft.operators.{Dedup, Relational, Similarity}

/** Physical-plan assertions — the 100 TB design gates: predicate pushdown
  * and column pruning reach the parquet scan, top-k compiles to
  * TakeOrderedAndProject (per-partition heaps, no global sort), and the
  * zero-shuffle operators really have no Exchange. */
class PlanSpec extends SparkTestBase {

  // formatted mode: full (untruncated) PushedFilters / ReadSchema
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("filter_range: predicate + column pruning reach the scan") {
    val p = plan(Relational.filterRange(spark, sf0001))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
    // projection pruned to the 4 referenced columns
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_extendedprice"), "scan reads unneeded column")
  }

  test("topk_orders: global top-k is TakeOrderedAndProject, not full sort") {
    val p = plan(Relational.topKOrders(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("knn_l2: broadcast query vector + TakeOrderedAndProject, no shuffle join") {
    val p = plan(Similarity.knnL2(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("Broadcast"), p)
  }

  test("ann_ivf: zero Exchange — assignment is a pure per-row expression") {
    val p = plan(Similarity.annIvf(spark, sf0001))
    assert(!p.contains("Exchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1_agg: two-phase aggregation (map-side partial before shuffle)") {
    val p = plan(Relational.q1Agg(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("mql filter compiles to pushdown-bearing scan predicates") {
    // the translated MQL predicate is a real Column tree (not a UDF):
    // the events scan must carry a data filter, and no UDF node appears
    val p = plan(Relational.mqlEventsRange(spark, sf0001))
    assert(!p.toLowerCase.contains("batchevalpython"), p)
    assert(!p.contains("UDF"), p)
  }

  test("dedup LSH pairs shuffle on the band-bucket key, never all-pairs") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e f g"), (2L, "a b c d e f h"))
      .toDF("id", "text")
    val p = plan(Dedup.minhashPairs(corpus))
    // candidate generation must be an equi-join (hash/sort-merge on the
    // band hash), NOT a nested-loop cross product
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
