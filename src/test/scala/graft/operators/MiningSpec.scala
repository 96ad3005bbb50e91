package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-fixture semantics checks for the mining family: skyline
  * dominance edges, LPA mode/tie-break rounds, exact EWMA weights. */
class MiningSpec extends SparkTestBase {
  import spark.implicits._

  test("skyline: dominated points drop, ties on both dims all survive, " +
      "strict-on-one-dim dominance applies") {
    // points (spend, n): (10,1) dominated by (10,2); (10,2) and a
    // duplicate (10,2) both survive (neither strictly beats the other);
    // (5,5) survives (best n); (9,4) dominated by (10,4)? -> (10,4)
    // not present; (9,4) vs (5,5): neither dominates; vs (10,2): 10>9
    // but 2<4 -> no. So skyline = {(10,2)x2, (9,4), (5,5)}.
    val per = Seq(
      (1L, 10L, 1L), (2L, 10L, 2L), (3L, 10L, 2L),
      (4L, 9L, 4L), (5L, 5L, 5L)
    ).toDF("o_custkey", "spend_c", "n_orders")
    // exercise BOTH phases through the private pass via a tiny bucket
    // count: phase equivalence (skyline of local skylines == skyline)
    val local = per.withColumn("b", pmod(col("o_custkey"), lit(2L)))
    val ph1 = Mining.skylinePass(local, Seq("b")).drop("b")
    val sky = Mining.skylinePass(ph1, Nil)
      .select("o_custkey").as[Long].collect().toSet
    assert(sky == Set(2L, 3L, 4L, 5L), sky)
  }

  test("LPA: one round adopts the neighbor mode with min-label " +
      "tie-break; a triangle converges to its min id") {
    // triangle 1-2-3 plus pendant 4 attached to 3
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("u", "v")
    val out = Mining.lpaOver(und, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // round 1: 1<-min(2,3 mode tie)=2? neighbors of 1 = {2,3}, counts
    // 1 each -> tie -> lbl 2; node 2 <- {1,3} -> 1; node 3 <- {1,2,4}
    // -> 1; node 4 <- {3} -> 3. round 2: 1 <- {lbl(2)=1, lbl(3)=1} ->
    // 1; 2 <- {2,1} tie -> 1; 3 <- {2,1,3} tie -> 1; 4 <- {1}. round 3
    // keeps everyone at 1 except none. All four nodes -> community 1.
    assert(out == Seq((1L, 4L)), out.mkString(","))
  }

  test("EWMA weights are the exact scaled geometric series and the " +
      "statistic matches a hand computation") {
    assert(Mining.EwmaWeights == Seq(10000000L, 8000000L, 6400000L,
      5120000L, 4096000L, 3276800L, 2621440L, 2097152L))
    // two events for one user: newest vq=300, older vq=100.
    // num = 300*1e7 + 100*8e6 = 3.8e9; den = 1.8e7; ewma = 211 (trunc)
    assert((300L * 10000000L + 100L * 8000000L) /
      (10000000L + 8000000L) == 211L)
  }

  test("assoc rules: confidence is directional, lift symmetric, " +
      "support floor filters") {
    // baskets: {1,2} x3, {1,3} x1 -> pair (1,2) c=3 passes floor 3;
    // (1,3) c=1 drops. c_1=4, c_2=3, N=4.
    // conf(1->2) = 3/4 = 750000 ppm; conf(2->1) = 3/3 = 1000000 ppm;
    // lift = 3*4/(4*3) = 1 -> 1000000 ppm both directions.
    val li = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (13L, 1L), (13L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("mining").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Mining.assocRules(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got.toSet == Set(
      (1L, 2L, 3L, 750000L, 1000000L),
      (2L, 1L, 3L, 1000000L, 1000000L)), got.mkString(","))
  }
}
