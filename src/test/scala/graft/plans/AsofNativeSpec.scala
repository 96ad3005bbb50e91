package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics + plan-shape checks for the native as-of join operator
  * (custom LogicalPlan → Strategy → BinaryExecNode). */
class AsofNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)]): Seq[(Long, Long, Option[Long])] = {
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("k", "t", "v")
    NativeAsof.asofJoin(l, r, "k", "t", "k", "t", "v")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(3)) None else Some(row.getLong(3))))
      .sortBy(_._1).toSeq
  }

  test("backward as-of: latest right at-or-before, ties match, no " +
      "earlier right -> null, keys never bleed") {
    val got = run(
      left = Seq(
        (1L, 10L, 100L), // before any right row for key 10 -> null
        (2L, 10L, 200L), // exactly at right t=200 -> ties match, v=20
        (3L, 10L, 250L), // between 200 and 300 -> still v=20
        (4L, 10L, 301L), // after 300 -> v=30
        (5L, 20L, 500L), // key 20 has no right rows -> null (and must
                         //  NOT inherit key 10's state)
        (6L, 30L, 99L)), // key 30: right exists only at t=100 -> null
      right = Seq(
        (10L, 200L, 20L), (10L, 300L, 30L), (30L, 100L, 77L)))
    assert(got == Seq(
      (1L, 10L, None), (2L, 10L, Some(20L)), (3L, 10L, Some(20L)),
      (4L, 10L, Some(30L)), (5L, 20L, None), (6L, 30L, None)),
      got.mkString(","))
  }

  test("native exec result is row-identical to the union+window " +
      "formulation on a shared random-ish fixture") {
    val left = (1L to 200L).map(i =>
      (i, i % 7, (i * 37) % 1000))
    val right = (1L to 50L).map(i =>
      (i % 7, (i * 53) % 1000, i))
    val l = left.toDF("id", "k", "t")
    val r0 = right.toDF("k", "t", "v")
    // like the gate's order dedup: one right row per (k, t)
    val r = r0.groupBy("k", "t").agg(max("v").as("v"))
    val native = NativeAsof.asofJoin(l, r, "k", "t", "k", "t", "v")
      .select("id", "v").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .sortBy(_._1).toSeq
    // union + running last(ignoreNulls) — the engine's DataFrame twin
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(col("t").asc, col("side").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val uw = l.select(col("id"), col("k"), col("t"),
        lit(null).cast("long").as("rv"), lit(0).as("side"))
      .unionByName(r.select(lit(null).cast("long").as("id"), col("k"),
        col("t"), col("v").as("rv"), lit(1).as("side")))
      .withColumn("m", last(col("rv"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select("id", "m").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .sortBy(_._1).toSeq
    assert(native == uw)
  }

  test("property: native exec == union+window over seeded random " +
      "fixtures — skewed keys, duplicate times, null right values") {
    val rng = new scala.util.Random(20260814L)
    for (round <- 1 to 5) {
      val nKeys = 1 + rng.nextInt(6)
      val left = (1L to 300L).map { i =>
        (i, rng.nextInt(nKeys).toLong, rng.nextInt(40).toLong)
      } // duplicate times per key are common at 40 slots
      val right = (1L to 80L).map { i =>
        (rng.nextInt(nKeys + 2).toLong, // some keys have no left rows
          rng.nextInt(40).toLong,
          if (rng.nextInt(5) == 0) None else Some(i)) // ~20% null values
      }
      val l = left.toDF("id", "k", "t")
      val r0 = right.toDF("k", "t", "v")
      // one right row per (k, t): keep max v (nulls lose to values —
      // both formulations see the SAME deduped frame, so any keep rule
      // works as long as it's applied before both)
      val r = r0.groupBy("k", "t").agg(max("v").as("v"))
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(x => (x.getLong(0),
          if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .sortBy(_._1).toSeq
      val native = canon(NativeAsof
        .asofJoin(l, r, "k", "t", "k", "t", "v").select("id", "v"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
        .orderBy(col("t").asc, col("side").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      // the window twin must carry NULL matched values DISTINCT from
      // "no match": tag matched rows and carry (tag, value) together
      val uw = canon(l.select(col("id"), col("k"), col("t"),
          lit(null).cast("long").as("rv"), lit(0).as("side"))
        .unionByName(r.select(lit(null).cast("long").as("id"), col("k"),
          col("t"), col("v").as("rv"), lit(1).as("side")))
        // the carried payload must be a NULL STRUCT on left rows so
        // ignoreNulls skips them while a matched-but-null value (a
        // non-null struct with a null field) still counts as a match
        .withColumn("mm", when(col("side") === 1, struct(col("rv")))
          .otherwise(lit(null)))
        .withColumn("m", last(col("mm"), ignoreNulls = true).over(w))
        .filter(col("side") === 0)
        .select(col("id"), col("m.rv").as("v")))
      assert(native == uw, s"round $round: ${
        native.zip(uw).filter(p => p._1 != p._2).take(5)}")
    }
  }

  test("plan shape: AsofJoinExec with one hash exchange + sort per " +
      "side, no window, no other join node") {
    val l = (1L to 100L).map(i => (i, i % 5, i * 3)).toDF("id", "k", "t")
    val r = (1L to 20L).map(i => (i % 5, i * 11, i)).toDF("k", "t", "v")
    val df = NativeAsof.asofJoin(l, r, "k", "t", "k", "t", "v")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("AsofJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      p)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 2, s"want 2 exchanges, got $exchanges\n$p")
    assert(p.contains("hashpartitioning(k#"), p)
  }
}
