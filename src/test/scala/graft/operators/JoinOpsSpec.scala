package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics + plan-shape checks for the join extensions (kNN similarity
  * join, as-of join) added on top of the reference surface. */
class JoinOpsSpec extends SparkTestBase {

  test("asof_join matches the correlated-subquery definition at sf0.001") {
    // independent Spark formulation of "most recent order at or before
    // the event": inner join + filter + argmax by (date, orderkey)
    val ev = Relational.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
    val expected = ev.join(ord,
        ev("user_id") === ord("o_custkey") &&
          ord("o_orderdate") <= ev("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey")))
        .getField("o_orderkey").as("last_orderkey"))
    val got = Relational.asofJoin(spark, sf0001)
      .select("event_id", "last_orderkey")
    assert(got.count() ===
      Relational.events(spark, sf0001).count())
    val diff = got.join(expected, Seq("event_id"))
      .filter(got("last_orderkey") <=> expected("last_orderkey") === false)
    assert(diff.count() === 0, diff.collect().take(5).mkString(";"))
  }

  test("asof_join: events before any order get a NULL orderkey") {
    val minOrder = spark.read.parquet(s"$sf0001/orders.parquet")
      .agg(min("o_orderdate").as("m"))
    val earlyNulls = Relational.asofJoin(spark, sf0001)
      .join(Relational.events(spark, sf0001).select("event_id", "ts"),
        Seq("event_id"))
      .crossJoin(minOrder)
      .filter(col("ts") < col("m"))
    assert(earlyNulls.filter(col("last_orderkey").isNotNull).count() === 0)
  }

  test("knn_join: WindowGroupLimit prunes to k per partition before the shuffle") {
    val p = Similarity.knnJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("knn_join: every query id gets exactly k ranked rows") {
    val got = Similarity.knnJoin(spark, sf0001)
    val perQ = got.groupBy("qid").agg(count(lit(1)).as("n"),
      max("rank").as("maxr"), min("rank").as("minr"))
    val bad = perQ.filter(col("n") =!= 3 || col("maxr") =!= 3 ||
      col("minr") =!= 1)
    assert(bad.count() === 0, bad.collect().mkString(";"))
  }
}
