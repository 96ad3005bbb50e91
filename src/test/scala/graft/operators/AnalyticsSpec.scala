package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-fixture specs for the event-analytics operators: multi-touch
  * attribution credit math and the exact z² anomaly test. */
class AnalyticsSpec extends SparkTestBase {

  test("attributionCredit: first/last/linear credits on a hand fixture") {
    import spark.implicits._
    // user 1: view(t1) click(t2) view(t3) purchase(t4) click(t5)
    //   → touches = view, click, view (k=3); first=view, last=view
    //   → linear: floor(1000/3)=333 each; remainder 1 → first touch
    //     (view); view gets 2·333 + 1 = 667, click gets 333
    // user 2: click(t1) purchase(t2) → k=1; click gets everything
    // user 3: view only, no purchase → contributes nothing
    val e = Seq(
      (1L, 10L, 100L, "view"), (1L, 20L, 101L, "click"),
      (1L, 30L, 102L, "view"), (1L, 40L, 103L, "purchase"),
      (1L, 50L, 104L, "click"),
      (2L, 10L, 200L, "click"), (2L, 20L, 201L, "purchase"),
      (3L, 10L, 300L, "view")
    ).toDF("user_id", "us", "event_id", "event_type")
    val out = Analytics.attributionCreditDF(e).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("view") == ((1L, 1L, 667L)), s"view: ${out("view")}")
    assert(out("click") == ((1L, 1L, 1333L)), s"click: ${out("click")}")
    assert(out.size == 2)
    // per-user credits always sum to exactly 1000
    assert(out.values.map(_._3).sum == 2000L)
  }

  test("attributionCredit: only touches BEFORE the first purchase count") {
    import spark.implicits._
    // purchase is the user's first event → no touches at all
    val e = Seq(
      (1L, 10L, 1L, "purchase"), (1L, 20L, 2L, "view"),
      (1L, 30L, 3L, "purchase")
    ).toDF("user_id", "us", "event_id", "event_type")
    assert(Analytics.attributionCreditDF(e).count() == 0)
  }

  test("attributionCredit: same-us tie broken by event_id") {
    import spark.implicits._
    // at us=10 the view (id 1) precedes the purchase (id 2): one touch
    val e = Seq(
      (1L, 10L, 1L, "view"), (1L, 10L, 2L, "purchase"),
      (1L, 10L, 3L, "click")
    ).toDF("user_id", "us", "event_id", "event_type")
    val out = Analytics.attributionCreditDF(e).collect()
    assert(out.length == 1 && out(0).getString(0) == "view")
    assert(out(0).getLong(3) == 1000L)
  }

  test("anomalyEvents: plants one 3-sigma outlier, flags exactly it") {
    import spark.implicits._
    // 20 values of 100 plus one of 10000: mean≈571, the outlier's z²
    // far exceeds 9; none of the 100s can exceed 3σ
    val vals = Seq.fill(20)(100L) :+ 10000L
    val e = vals.map(("a", _)).toDF("event_type", "vq")
    val out = Analytics.anomalyEventsDF(e).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 21L)           // n
    assert(r.getLong(2) == 1L, s"anomalies: $r") // n_anomalies
    assert(r.getLong(3) == 10000L)        // max_anom_vq
    assert(r.getLong(4) == 10000L)        // sum_anom_vq
  }

  test("anomalyMad: lower medians exact, the MAD flag catches the " +
      "planted outlier the dragged-mean z-test context motivates") {
    import spark.implicits._
    // values 1..9 (med = 5, devs 0,1,1,2,2,3,3,4,4 → MAD lower med = 2)
    // plus one wild outlier 1000: med of 10 values = lower median = 5
    // (5th smallest), devs now include 995; MAD stays 2 (lower med of
    // 0,1,1,2,2,3,3,4,4,995 → 5th smallest = 2)
    // flag: dev·10000 > 2·44478 = 88956 → dev > 8.9 → only the 995
    val e = ((1L to 9L).map(v => ("a", v, v)) :+ (("a", 10L, 1000L)))
      .toDF("event_type", "event_id", "vq")
    val r = Analytics.anomalyMadDF(e).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 10L)  // n
    assert(row.getLong(2) == 5L)   // med
    assert(row.getLong(3) == 2L)   // mad
    assert(row.getLong(4) == 1L)   // exactly the planted outlier
    // degenerate MAD = 0: >=half identical — everything off the median
    // flags (the standard MAD caveat, deterministically)
    val z = Seq(("b", 1L, 7L), ("b", 2L, 7L), ("b", 3L, 7L),
      ("b", 4L, 9L)).toDF("event_type", "event_id", "vq")
    val rz = Analytics.anomalyMadDF(z).collect().head
    assert(rz.getLong(3) == 0L && rz.getLong(4) == 1L)
  }

  test("anomalyEvents: uniform distribution has zero anomalies") {
    import spark.implicits._
    val e = (1L to 100L).map(i => ("b", (i % 10) * 100))
      .toDF("event_type", "vq")
    val out = Analytics.anomalyEventsDF(e).collect()
    assert(out.length == 1 && out(0).getLong(2) == 0L)
    assert(out(0).isNullAt(3) && out(0).isNullAt(4))
  }

  test("quantizeBinary gate: hamming to self-similar vectors ranks " +
      "sign-aligned neighbors first and is within [0, 64]") {
    val out = Quantize.quantizeBinary(spark, sf0001).collect()
    assert(out.length == 10)
    val hs = out.map(_.getLong(1))
    assert(hs.forall(h => h >= 0 && h <= 64))
    // top-10 is sorted by (hamming, vec_id)
    assert(hs.sameElements(hs.sorted))
    assert(!out.map(_.getLong(0)).contains(3L))
  }
}
