package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._

/** Behavior specs for the scoring/selection operators: the bigram-LM
  * perplexity proxy, DSIR importance sampling, and the KMV distinct
  * sketch. */
class ScoringOpsSpec extends SparkTestBase {

  test("lmScore: a repetitive doc scores a higher mean bigram " +
      "probability than a same-length all-unique doc; empty doc is 0/0") {
    import spark.implicits._
    val corpus = Seq(
      (1L, ("the cat sat " * 10).trim),          // one bigram pattern, high P
      (2L, (1 to 30).map(i => s"tok$i").mkString(" ")), // every bigram unique
      (3L, "")                                   // no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(
        corpus.select(col("doc_id"), tokens(col("text")).as("ts")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n1, s1) = out(1L)
    val (n2, s2) = out(2L)
    assert(out(3L) == ((0L, 0L)))
    assert(n1 == 29 && n2 == 29, s"bigram counts: $n1 / $n2")
    // mean ppm: the repeated "the cat / cat sat / sat the" bigrams are
    // near-certain given their head; the unique doc's are all 1-count
    // against the same smoothing denominator
    assert(s1 > s2 * 3, s"repetitive $s1 should dwarf unique $s2")
  }

  test("sketchDistinct: exact below k, within KMV error bounds above") {
    // sf0.001 has 15 distinct users per event type (< k=64): the sketch
    // must return the EXACT count
    val small = Relational.sketchDistinct(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, d) =>
      if (d < 64) assert(small(t) == d, s"$t: ${small(t)} != exact $d")
      // k=64 KMV stderr ≈ 1/sqrt(62) ≈ 12.7%; 25% ≈ 2σ on fixed data
      else assert(math.abs(small(t) - d) <= d / 4,
        s"$t: est ${small(t)} vs exact $d")
    }
  }

  test("dsirSample: the target-language docs dominate the top slice") {
    val sel = Pipeline.dsirSample(spark, sf0001)
    val langs = sel.join(
        spark.read.parquet(s"$sf0001/documents.parquet"), Seq("doc_id"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val en = langs.getOrElse("en", 0L)
    assert(en * 2 > langs.values.sum,
      s"importance scoring should favor the en target: $langs")
  }

  test("sampleWeighted: inclusion tracks weight (priority sampling), " +
      "deterministic across reruns, zero-weight rows excluded") {
    import spark.implicits._
    // 100 light docs (w=3) vs 100 heavy (w=3000): bottom-25 by
    // hash DIV w must be dominated by the heavy class
    val d = (0L until 200L).map(i =>
        (i, "en", if (i < 100) 3L else 3000L))
      .toDF("doc_id", "lang", "n_chars")
    val got = Pipeline.sampleWeightedOver(d).collect()
    assert(got.length == 25)
    val heavy = got.count(_.getLong(0) >= 100)
    assert(heavy >= 20, s"only $heavy/25 heavy picks")
    // deterministic: same frame, same sample
    val again = Pipeline.sampleWeightedOver(d).collect()
    assert(got.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // zero/negative weights never participate
    val z = Pipeline.sampleWeightedOver(
      (0L until 5L).map(i => (i, "en", 0L)).toDF("doc_id", "lang",
        "n_chars")).collect()
    assert(z.isEmpty)
  }

  test("sampleWeighted plans as TakeOrderedAndProject — per-partition " +
      "k-heap, no global sort") {
    import spark.implicits._
    val d = (0L until 50L).map(i => (i, "en", i + 1)).toDF(
      "doc_id", "lang", "n_chars")
    val plan = Pipeline.sampleWeightedOver(d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("textLmScore gate output covers every doc, keyed and ordered") {
    val out = TextAnalysis.textLmScore(spark, sf0001)
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.count() == n)
    val ids = out.select("doc_id").collect().map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
  }

  test("textMojibake: artifact classes repair to their true " +
      "characters, detector counts both plants, no artifact survives") {
    val out = TextAnalysis.textMojibake(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    out.foreach { case (id, (n, fixed)) =>
      val expected = if (id % 5 == 0) 2L else 1L
      assert(n == expected, s"doc $id: detector saw $n, want $expected")
      // no artifact sequence survives the repair chain
      assert(!fixed.contains("â€") &&
        !fixed.contains("Ã©") &&
        !fixed.contains("Ã¼") && !fixed.contains("Â "),
        s"doc $id still mojibake: ${fixed.takeRight(30)}")
      if (id % 4 == 0) assert(fixed.contains(" don't stop"), fixed)
      else if (id % 4 == 1)
        assert(fixed.contains(" café culture"), fixed)
      else if (id % 4 == 2) assert(fixed.contains(" über fast"), fixed)
      else assert(fixed.contains(" rows–cols"), fixed)
      if (id % 5 == 0) assert(fixed.endsWith(" end mark"), fixed)
    }
    assert(out.nonEmpty)
  }

  test("textC4Lines: lorem-ipsum docs drop whole; surviving docs keep " +
      "exactly the two clean planted lines, boilerplate gone") {
    val out = TextAnalysis.textC4Lines(spark, sf0001).collect()
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.nonEmpty && out.length < n) // every 3rd doc dropped
    out.foreach { r =>
      val (id, nl, nk, cleaned) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(id % 3 != 0, s"doc $id carries lorem ipsum, must drop")
      assert(nl == 5 && nk == 2, s"doc $id: $nl lines / $nk kept")
      val lines = cleaned.split("\n")
      assert(lines.length == 2)
      lines.foreach { l =>
        assert(".!?".contains(l.last), s"unterminated kept line: $l")
        assert(l.split(" ").length >= 5, s"short kept line: $l")
        assert(!l.contains("javascript") && !l.contains("cookie") &&
          !l.contains("{"), s"boilerplate survived: $l")
      }
    }
  }
}
