package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics + plan-shape checks for the join extensions (kNN similarity
  * join, as-of join) added on top of the reference surface. */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  test("funnel counts strict-order progression only; out-of-order and " +
      "repeat events don't inflate steps") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: clicked BEFORE viewing — no click follows the view, so
      // step 2 is never reached and the later purchase can't count
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 50L),
      // user 3: duplicate views/clicks must count once
      (3L, "view", 1L), (3L, "view", 2L), (3L, "click", 3L),
      (3L, "click", 4L),
      // user 4: never viewed
      (4L, "purchase", 9L)
    ).toDF("user_id", "event_type", "us")
    val got = graft.operators.Relational
      .funnelOver(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // step 1: users 1,2,3; step 2: users 1,3; step 3: user 1
    assert(got == Seq((1, 3L), (2, 2L), (3, 1L)), got.mkString(","))
  }

  test("windowed funnel: a step past the conversion window does not " +
      "count, the boundary is inclusive") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click 15 after view — inside window 20; purchase 25
      // after the click — also inside
      (1L, "view", 10L), (1L, "click", 25L), (1L, "purchase", 45L),
      // user 2: click 21 after view — OUTSIDE window 20, funnel stops
      (2L, "view", 10L), (2L, "click", 31L), (2L, "purchase", 35L),
      // user 3: click exactly AT the window boundary — inclusive
      (3L, "view", 10L), (3L, "click", 30L)
    ).toDF("user_id", "event_type", "us")
    val got = graft.operators.Relational
      .funnelWindowedOver(ev, Seq("view", "click", "purchase"), 20L)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // step 1: users 1,2,3; step 2: users 1,3; step 3: user 1
    assert(got == Seq((1, 3L), (2, 2L), (3, 1L)), got.mkString(","))
  }
}

class RetentionSpec extends SparkTestBase {
  import spark.implicits._

  test("retention counts each user once per week, cohorted by first week") {
    val uw = Seq(
      (1L, 10L), (1L, 10L), (1L, 11L), (1L, 13L), // dup week counts once
      (2L, 10L), (2L, 11L),
      (3L, 11L) // later cohort
    ).toDF("user_id", "wk")
    val got = graft.operators.Relational.retentionOver(uw)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // cohort 10: 2 users at offset 0, 2 at +1, 1 at +3; cohort 11: 1 user
    assert(got == Seq((10L, 0L, 2L), (10L, 1L, 2L), (10L, 3L, 1L),
      (11L, 0L, 1L)), got.mkString(","))
  }
}

class FunnelPropSpec extends SparkTestBase {
  import spark.implicits._
  import scala.util.Random

  test("random event histories: funnel and retention agree with " +
      "in-memory models") {
    val r = new Random(31337L)
    for (round <- 1 to 10) {
      val types = Seq("view", "click", "purchase")
      val evs = (0 until 400).map { _ =>
        (r.nextInt(30).toLong, types(r.nextInt(3)),
          r.nextInt(1000).toLong)
      }
      // in-memory funnel: per user, cascaded first-qualifying times
      // (strictly increasing); ties on ts within a user+type collapse
      // to the same min, so the model is deterministic
      def firstAfter(u: Long, tpe: String, after: Long): Option[Long] = {
        val c = evs.filter(e => e._1 == u && e._2 == tpe && e._3 > after)
        if (c.isEmpty) None else Some(c.map(_._3).min)
      }
      val users = evs.map(_._1).distinct
      var reached = users.flatMap(u => firstAfter(u, "view", Long.MinValue)
        .map(u -> _)).toMap
      var expect = Seq(1 -> reached.size.toLong)
      for ((tpe, i) <- Seq("click" -> 2, "purchase" -> 3)) {
        reached = reached.flatMap { case (u, t) =>
          firstAfter(u, tpe, t).map(u -> _) }
        expect = expect :+ (i -> reached.size.toLong)
      }
      val got = graft.operators.Relational
        .funnelOver(evs.toDF("user_id", "event_type", "us"), types)
        .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
      assert(got == expect.filter(_._2 > 0), s"round $round: $got vs $expect")

      // retention model: distinct (user, week), cohort = min week
      val uw = evs.map(e => (e._1, e._3 / 100)).distinct
      val coh = uw.groupBy(_._1).map { case (u, ws) =>
        u -> ws.map(_._2).min }
      val expRet = uw.groupBy { case (u, w) => (coh(u), w - coh(u)) }
        .map { case (k, g) => (k._1, k._2, g.size.toLong) }
        .toSeq.sorted
      val gotRet = graft.operators.Relational
        .retentionOver(uw.toDF("user_id", "wk"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .toSeq
      assert(gotRet == expRet, s"round $round: $gotRet vs $expRet")
    }
  }
}

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

  test("asof_join_nearest: either direction, earlier order wins ties, " +
      "one hash exchange for both windows") {
    val df = graft.operators.Relational
      .asofJoinNearest(spark, sf0001)
    // agreement with the two directional gates' analytic truth is the
    // oracle's job; here lock the EDGE semantics on the real corpus:
    // every event with any same-user order gets a non-null match
    val rows = df.collect()
    assert(rows.nonEmpty)
    // plan: both windows ride ONE hash exchange on the user key (the
    // second direction re-sorts in-partition, it must not re-shuffle).
    // AQE's final-plan string prints a materialized stage once per
    // reference — count DISTINCT exchange plan_ids, not text hits
    // the adaptive toString appends "== Initial Plan ==" — assert on
    // the FINAL section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val kExIds = p.linesIterator
      .filter(_.contains("hashpartitioning(k#"))
      .flatMap("plan_id=(\\d+)".r.findFirstMatchIn(_).map(_.group(1)))
      .toSet
    assert(kExIds.size == 1,
      s"want 1 distinct hash exchange on k, got $kExIds\n$p")
    assert("Window".r.findAllIn(p).size >= 2, p)
  }

  test("asof_join_nearest semantics on a hand fixture: before-any -> " +
      "forward, after-all -> backward, equidistant -> earlier") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmpDir("asof-nearest")
    // orders for user 1 at days 10 and 20 (epoch days)
    Seq((1L, java.sql.Date.valueOf("2020-01-10"), 100L),
        (1L, java.sql.Date.valueOf("2020-01-20"), 200L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // events: before both (day 5 -> 100), after both (day 25 -> 200),
    // equidistant (day 15 -> EARLIER order 100), exactly at an order
    // (day 20 -> 200), and a user with no orders (null)
    Seq((1L, 1L, "2020-01-05"), (2L, 1L, "2020-01-25"),
        (3L, 1L, "2020-01-15"), (4L, 1L, "2020-01-20"),
        (5L, 9L, "2020-01-15"))
      .toDF("event_id", "user_id", "d")
      .select(col("event_id"), col("user_id"),
        col("d").cast("timestamp").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Relational.asofJoinNearest(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got == Map(1L -> 100L, 2L -> 200L, 3L -> 100L,
      4L -> 200L, 5L -> -1L), got)
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
