package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-model checks for the round-8 corpus/warehouse additions: SCD2
  * interval stitching, C4-style segment removal, integer PageRank,
  * classifier scoring, and centroid-distance outliers — each on a tiny
  * planted fixture with an independently computed expected answer. */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- SCD Type 2 -------------------------------------------------------

  private lazy val history = Seq(
    // key 1: a -> a (re-stated, no new version) -> b -> a
    (1L, "a", 10L, 100L), (1L, "a", 20L, 101L),
    (1L, "b", 30L, 102L), (1L, "a", 40L, 103L),
    // key 2: single event
    (2L, "x", 10L, 104L)
  ).toDF("k", "st", "ts", "tb")

  test("scd2 collapses re-stated values and stitches intervals") {
    val out = Upsert.scd2(history, "k", "st", "ts", "tb")
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4), r.getLong(5)))
      .toSeq
    assert(out == Seq(
      (1L, "a", 10L, Some(30L), false, 1L),
      (1L, "b", 30L, Some(40L), false, 2L),
      (1L, "a", 40L, None, true, 3L),
      (2L, "x", 10L, None, true, 1L)))
  }

  test("scd2 tiebreak makes same-timestamp versions deterministic") {
    val tied = Seq((1L, "a", 10L, 2L), (1L, "b", 10L, 1L)).toDF(
      "k", "st", "ts", "tb")
    val out = Upsert.scd2(tied, "k", "st", "ts", "tb")
      .orderBy("version").select("st", "is_current").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    // tb orders b before a: b is version 1 (closed), a current
    assert(out == Seq(("b", false), ("a", true)))
  }

  // ---- C4-style segment removal ----------------------------------------

  test("dedupLines keeps the first occurrence of a repeated segment") {
    val seg = (1 to 10).map(i => s"tok$i").mkString(" ") // one full segment
    val d = Seq(
      (0L, s"$seg unique tail words here"),
      (1L, seg),                 // exact repeat of doc 0's first segment
      (2L, "completely different words only once told"),
      (3L, "")                   // empty doc
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesOver(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(out == Seq(
      (0L, 2L, 0L, s"$seg unique tail words here"),
      (1L, 1L, 1L, ""),          // its only segment was doc 0's
      (2L, 1L, 0L, "completely different words only once told"),
      (3L, 0L, 0L, "")))
  }

  // ---- integer PageRank -------------------------------------------------

  test("pagerankOver matches the hand-computed two-node chain") {
    val nodes = Seq("A", "B").toDF("node")
    val edges = Seq(("A", "B", 1L)).toDF("from_type", "to_type", "n")
    val out = Relational.pagerankOver(nodes, edges, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // it1: rA=150000 (no in-edges), rB=150000+85%*1000000=1000000
    // it2+: rB=150000+85%*150000=277500, rA stays 150000
    assert(out == Map("A" -> 150000L, "B" -> 277500L))
  }

  test("pagerank splits rank proportionally to edge weight") {
    val nodes = Seq("A", "B", "C").toDF("node")
    val edges = Seq(("A", "B", 3L), ("A", "C", 1L))
      .toDF("from_type", "to_type", "n")
    val out = Relational.pagerankOver(nodes, edges, 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // contrib B = 1000000*3 DIV 4 = 750000; C = 250000
    assert(out == Map("A" -> 150000L,
      "B" -> (150000L + 85L * 750000L / 100L),
      "C" -> (150000L + 85L * 250000L / 100L)))
  }

  // ---- classifier scoring ----------------------------------------------

  test("classifierScore is the exact mean bucket weight in milli-units") {
    val d = Seq((0L, "alpha beta alpha"), (1L, "")).toDF("doc_id", "text")
    val out = Pipeline.classifierScoreOver(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    // recompute the expected score with the same published formula
    def bucket(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"qc:$t".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1024L
    }
    def w(t: String): Long = bucket(t) * 2654435761L % 1999L
    val sum = w("alpha") + w("beta") + w("alpha")
    val score = 1000L * sum / 3L
    assert(out == Seq(
      (0L, 3L, score, score >= 999000L),
      (1L, 0L, 0L, false)))
  }

  test("classifierCalibration: 10 equal-width margin bins, counts " +
      "conserve, observed good-rate rises with the bin index") {
    val bins = Pipeline
      .classifierCalibration(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.nonEmpty && bins.forall(b => b._1 >= 0 && b._1 <= 9))
    // counts conserve against the scored corpus
    val total = Pipeline
      .classifierScoreTrained(spark, "/root/testdata/sf0.001").count()
    assert(bins.map(_._2).sum == total)
    // good_ppm is exactly n_good*1e6 DIV n per bin, and the diagram is
    // MONOTONE nondecreasing (the planted margin is a real signal)
    bins.foreach { case (_, n, ng, ppm) =>
      assert(ppm == ng * 1000000L / n) }
    val rates = bins.sortBy(_._1).map(_._4)
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b },
      rates.mkString(","))
    assert(rates.head == 0L && rates.last == 1000000L)
  }

  test("classifierScoreTrained recovers the planted quality split") {
    val out = Pipeline
      .classifierScoreTrained(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    // both classes present and the trained model separates them: the
    // measured accuracy at sf0.001 is 1.000 (BASELINE.md) — assert a
    // slack bound so a testdata refresh doesn't flap the suite
    val acc = out.count(r => r.getString(1) == r.getString(2)).toDouble /
      out.length
    assert(acc >= 0.95, s"planted-split accuracy $acc")
    assert(out.map(_.getString(1)).toSet == Set("good", "bad"))
    // margins carry sign: good predictions strictly positive, bad
    // predictions <= 0 (the tie falls to 'bad', the lex-smallest label)
    assert(out.forall(r =>
      if (r.getString(2) == "good") r.getLong(3) > 0
      else r.getLong(3) <= 0))
  }

  // ---- embedding outliers ----------------------------------------------

  test("embedOutliers ranks the far vector first with exact distances") {
    val e = Seq(
      (0L, 1, Array(0f, 0f)), (1L, 1, Array(0f, 0f)),
      (2L, 1, Array(1f, 1f))
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.embedOutliersOver(e, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // q = 1e7 or 1.1e7; centroid = 31e6 DIV 3 = 10333333 per dim
    val near = 2L * 333333L * 333333L
    val far = 2L * 666667L * 666667L
    assert(out == Seq((2L, far), (0L, near), (1L, near)))
  }
}
