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

  test("es/fr/de inflection pairs stem together; diacritics fold; " +
      "stop words drop (r18)") {
    // each pair must CO-STEM (query term ↔ document token), the
    // self-consistency contract — not full Snowball output
    val es = Seq(
      ("libros", "libro"), ("rápidamente", "rapido"),
      ("hablando", "hablar"), ("habla", "hablar"),
      ("veces", "vez"), ("pensamientos", "pensar"))
    es.foreach { case (a, b) =>
      assert(Stemmer.Spanish.stemLocal(Stemmer.Spanish.foldLocal(a)) ==
        Stemmer.Spanish.stemLocal(Stemmer.Spanish.foldLocal(b)),
        s"es: $a vs $b")
    }
    val fr = Seq(
      ("maisons", "maison"), ("chevaux", "cheval"),
      ("parlant", "parler"), ("formation", "former"),
      ("heureux", "heureuse"), ("rapidement", "rapide"))
    fr.foreach { case (a, b) =>
      assert(Stemmer.French.stemLocal(Stemmer.French.foldLocal(a)) ==
        Stemmer.French.stemLocal(Stemmer.French.foldLocal(b)),
        s"fr: $a vs $b")
    }
    val de = Seq(
      ("zeitungen", "zeitung"), ("häuser", "haus"),
      ("freundlich", "freunde"), ("möglichkeiten", "möglichkeit"))
    de.foreach { case (a, b) =>
      assert(Stemmer.German.stemLocal(Stemmer.German.foldLocal(a)) ==
        Stemmer.German.stemLocal(Stemmer.German.foldLocal(b)),
        s"de: $a vs $b")
    }
    val it = Seq(
      ("libri", "libro"), ("rapidamente", "rapido"),
      ("parlando", "parlare"), ("creazioni", "creare"),
      ("creazione", "creare"))
    it.foreach { case (a, b) =>
      assert(Stemmer.Italian.stemLocal(Stemmer.Italian.foldLocal(a)) ==
        Stemmer.Italian.stemLocal(Stemmer.Italian.foldLocal(b)),
        s"it: $a vs $b")
    }
    val pt = Seq(
      ("livros", "livro"), ("falando", "falar"),
      ("rapidamente", "rápido"), ("corações", "coração"),
      ("pensamentos", "pensar"))
    pt.foreach { case (a, b) =>
      assert(Stemmer.Portuguese.stemLocal(
        Stemmer.Portuguese.foldLocal(a)) ==
        Stemmer.Portuguese.stemLocal(Stemmer.Portuguese.foldLocal(b)),
        s"pt: $a vs $b")
    }
    val nl = Seq(
      ("boeken", "boek"), ("boekje", "boek"),
      ("vriendelijk", "vrienden"), ("mogelijkheden", "mogelijk"),
      ("grote", "groten"))
    nl.foreach { case (a, b) =>
      assert(Stemmer.Dutch.stemLocal(Stemmer.Dutch.foldLocal(a)) ==
        Stemmer.Dutch.stemLocal(Stemmer.Dutch.foldLocal(b)),
        s"nl: $a vs $b")
    }
    // stop sets apply in FOLDED space ("été" → ete, "für" → fur)
    assert(Stemmer.French.searchTerms("été maisons") ==
      Seq(Stemmer.French.stemLocal("maison")))
    // Catalyst docTokens agrees with the driver chain per language
    for ((a, text, want) <- Seq(
        // "rápidamente" cascades mente→rapida→(ida)→rap, the same
        // chain "rapido"/(ido) lands on — co-stemming, not Snowball
        (Stemmer.Spanish, "los LIBROS rápidamente", Seq("libr", "rap")),
        (Stemmer.French, "les chevaux étaient rapides",
          Seq("cheval", "etai", "rapid")),
        (Stemmer.German, "die Zeitungen über Häuser",
          Seq("zeit", "hau")))) {
      val got = spark.range(1)
        .select(a.docTokens(lit(text)).as("a"))
        .as[Seq[String]].head()
      assert(got == want, s"${a.names.head}: $got vs $want")
    }
  }

  test("unbaked analyzers stay loud, stop-only search is loud") {
    val e = intercept[IllegalArgumentException] {
      graft.filter.MqlFilter.toColumn(
        """{"$text": {"$search": "kniga", "$language": "russian"}}""",
        graft.filter.MqlFilter.JsonResolver(lit("{}")))
    }
    assert(e.getMessage.contains("analyzer"))
    // the r17 refusal bracket NARROWED: es/fr/de/it/pt/nl now bake
    for (l <- Seq("german", "spanish", "french", "italian",
        "portuguese", "dutch", "es", "fr", "de", "it", "pt", "nl"))
      graft.filter.MqlFilter.toColumn(
        s"""{"$$text": {"$$search": "lauf", "$$language": "$l"}}""",
        graft.filter.MqlFilter.JsonResolver(lit("{}")))
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
