package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The baked English analyzer: canonical inflection pairs, the
  * stop-word contract, and agreement between the three renderers of
  * the ONE rule table (Catalyst chain vs driver-side stemmer — the
  * DuckDB renderer is locked by the mql_text_stemmed oracle gate). */
class StemmerSpec extends SparkTestBase {
  import spark.implicits._

  test("canonical inflection pairs stem together") {
    val pairs = Seq(
      "running" -> "run", "runs" -> "run", "run" -> "run",
      "hashes" -> "hash", "hashing" -> "hash", "hash" -> "hash",
      "tables" -> "table", "table" -> "table",
      "caresses" -> "caress", "caress" -> "caress",
      "abilities" -> "ability", "ability" -> "ability",
      "boxes" -> "box", "box" -> "box",
      "agreed" -> "agree", "operating" -> "operate",
      "troubled" -> "trouble", "sized" -> "size",
      "hoping" -> "hope", "hoped" -> "hope",
      "plastered" -> "plaster",
      "normalization" -> "normalize", "normalize" -> "normalize",
      "kindness" -> "kind", "government" -> "govern",
      "quickly" -> "quick", "famously" -> "famous",
      // words the stripper must NOT touch
      "sing" -> "sing", "string" -> "string", "feed" -> "feed",
      "class" -> "class", "use" -> "use")
    pairs.foreach { case (w, want) =>
      assert(Stemmer.stemLocal(w) == want, s"stemLocal($w)")
    }
  }

  test("staged plan is exactly the flat sequential chain") {
    // the guard argument made in the source, pinned empirically: the
    // letter-guarded staged form must equal applying every rule of the
    // table in order, over the real fixture vocabulary + canon words
    def flat(w: String): String =
      Stemmer.Rules.foldLeft(w) { case (s, (p, r)) =>
        s.replaceFirst(p, r.replace("{1}", "$1"))
      }
    val vocab = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .distinct().as[String].collect().toSeq ++
      Seq("running", "hashes", "abilities", "buildings", "kindnesses",
        "normalizations", "operations", "feed", "sing")
    vocab.foreach { w =>
      assert(Stemmer.stemLocal(w) == flat(w), s"staged vs flat on '$w'")
    }
  }

  test("Catalyst chain agrees with the driver-side stemmer") {
    // the documents fixture's real vocabulary + the canonical pairs:
    // every token must stem identically through both renderers
    val vocab = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
      .distinct().as[String].collect().toSeq ++
      Seq("running", "hashes", "abilities", "normalization", "hoping")
    val df = vocab.toDF("t").select(col("t"),
      Stemmer.stemCol(col("t")).as("s"))
    val got = df.as[(String, String)].collect().toMap
    vocab.foreach { w =>
      assert(got(w) == Stemmer.stemLocal(w),
        s"column vs local diverge on '$w'")
    }
  }

  test("analyzer drops stop words on both sides") {
    assert(Stemmer.analyzeTerms(Seq("the", "running", "of")) == Seq("run"))
    val toks = spark.range(1)
      .select(Stemmer.analyzeCol(lit("The running of the tables"))
        .as("a")).as[Seq[String]].head()
    assert(toks == Seq("run", "table"))
  }

  test("non-English analyzers stay loud, stop-only search is loud") {
    val e = intercept[IllegalArgumentException] {
      graft.filter.MqlFilter.toColumn(
        """{"$text": {"$search": "lauf", "$language": "german"}}""",
        graft.filter.MqlFilter.JsonResolver(lit("{}")))
    }
    assert(e.getMessage.contains("analyzer"))
    val e2 = intercept[IllegalArgumentException] {
      graft.filter.MqlFilter.toColumn(
        """{"$text": {"$search": "the of", "$language": "english"}}""",
        graft.filter.MqlFilter.JsonResolver(lit("{}")))
    }
    assert(e2.getMessage.contains("stop word"))
    // sensitivity flags: explicit false accepted, true loud, unknown
    // options loud — never a silent fallback to default matching
    graft.filter.MqlFilter.toColumn(
      """{"$text": {"$search": "run", "$caseSensitive": false,
        |  "$diacriticSensitive": false}}""".stripMargin,
      graft.filter.MqlFilter.JsonResolver(lit("{}")))
    for (bad <- Seq(
        """{"$text": {"$search": "run", "$caseSensitive": true}}""",
        """{"$text": {"$search": "run", "$diacriticSensitive": true}}""",
        """{"$text": {"$search": "run", "$banana": 1}}""")) {
      val e3 = intercept[IllegalArgumentException] {
        graft.filter.MqlFilter.toColumn(bad,
          graft.filter.MqlFilter.JsonResolver(lit("{}")))
      }
      assert(e3.getMessage.contains("unsupported"), e3.getMessage)
    }
  }
}
