package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Baked English text analyzer for `$text {"$language": "english"}` —
  * stop-word removal + a table-driven Porter-style suffix stripper.
  *
  * The collation/ZoneRules discipline applied to stemming: ONE ordered
  * rule table ([[Rules]]) generates all three evaluation surfaces — the
  * Catalyst column chain ([[stemCol]]), the DuckDB oracle SQL
  * ([[stemSql]]), and the driver-side query-term stemmer
  * ([[stemLocal]]) — so the engines cannot apply different rules. Each
  * rule is one anchored regexp_replace; an anchored `^...$` pattern
  * matches at most once, so replace-all and replace-first agree, and
  * the patterns are RE2-SAFE (no lookaround, no pattern backreferences
  * — consonant undoubling is spelled as one rule per letter) so
  * DuckDB's RE2 and the JVM's java.util.regex produce identical
  * matches. Replacement templates write group refs as `{1}`, rendered
  * `$1` for the JVM engines and `\1` for DuckDB.
  *
  * The rule set is the widely-published Porter step-1 family (plurals,
  * ed/ing with the at/bl/iz repairs, consonant undoubling, CVC
  * e-restoration) plus a small step-2/3 selection of common
  * derivational suffixes — all guarded by the classic
  * "stem contains a vowel" / "stem contains VC" measures approximated
  * as character classes (y counts as a vowel). It is deliberately NOT
  * the full Snowball automaton: every surface applies THIS table, the
  * match contract is self-consistency between query terms and document
  * tokens, and the unit spec pins the canonical inflection pairs
  * (running→run, hashes→hash, abilities→ability, ...). Analyzers for
  * other languages stay a loud refusal at the `$text` translation
  * site. */
object Stemmer {

  /** Lucene's classic English stop set (StopAnalyzer.ENGLISH_STOP_WORDS
    * — public knowledge), applied BEFORE stemming on both the document
    * tokens and the query terms. */
  val StopWords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with")

  /** The ordered suffix rules: (RE2-safe anchored pattern, replacement
    * template with `{n}` group refs). Applied SEQUENTIALLY — each rule
    * sees the previous rule's output — with specific rules (sibilant
    * plurals, ed/ing repairs) deliberately ordered before the general
    * strippers they refine. */
  val Rules: Seq[(String, String)] = {
    val undouble = // Porter 1b: double consonant → single after ed/ing
      // removal, except l/s/z (falling→fall stays via the general ing
      // rule). One rule per letter: RE2 has no pattern backreferences.
      "bdfgmnprt".map(c =>
        (s"^(.*[aeiouy][a-z]*$c)$c(ed|ing)$$", "{1}"))
    Seq(
      // --- plurals (Porter 1a) ---
      ("^(.*)sses$", "{1}ss"),                 // caresses → caress
      ("^(.*[a-z])ies$", "{1}y"),              // abilities → ability
      ("^(.*(x|ch|sh|ss|z))es$", "{1}"),       // hashes → hash, boxes → box
      ("^(.*[aeiouy][a-z]*[^s])s$", "{1}"),    // tables → table; ss kept
      // --- ed/ing (Porter 1b) ---
      ("^(.*[aeiouy][^aeiouy][a-z]*)eed$", "{1}ee"), // agreed → agree
      ("^(.*[aeiouy][a-z]*at)(ed|ing)$", "{1}e"),    // operating → operate
      ("^(.*[aeiouy][a-z]*bl)(ed|ing)$", "{1}e"),    // troubled → trouble
      ("^(.*[aeiouy][a-z]*iz)(ed|ing)$", "{1}e")     // sized → size
    ) ++ undouble ++ Seq(
      ("^([^aeiouy]+[aeiouy][^aeiouywx])(ed|ing)$", "{1}e"), // hoping → hope
      // [^e] bars 'eed' endings here — in Porter the longer 'eed'
      // pattern owns them (feed/freed keep their suffix when the eed
      // rule's VC guard fails; a plain ed rule would strip to 'fe')
      ("^(.*[aeiouy][a-z]*[^e])ed$", "{1}"),   // plastered → plaster
      ("^(.*[aeiouy][a-z]*)ing$", "{1}"),      // hashing → hash
      // --- common derivational suffixes (Porter 2/3 selection, VC
      // guard: the stem keeps a vowel-consonant pair) ---
      ("^(.*[aeiouy][^aeiouy][a-z]*)ization$", "{1}ize"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)ational$", "{1}ate"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)tional$", "{1}tion"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)ation$", "{1}ate"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)izer$", "{1}ize"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)fulness$", "{1}ful"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)ousness$", "{1}ous"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)iveness$", "{1}ive"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)ness$", "{1}"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)ment$", "{1}"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)ously$", "{1}ous"),
      ("^(.*[aeiouy][^aeiouy][a-z]*)ly$", "{1}"))
  }

  // ---- staged execution plan of the ONE table (r17 perf form) ------
  // A rule can only match a token that CURRENTLY ends with its
  // suffix's last letter, so grouping the sequential chain into
  // letter-guarded stages — plurals (…s), the ed/ing family (…d/…g),
  // then derivational suffixes sub-branched by final letter — never
  // suppresses a match: the staged form IS the sequential chain,
  // attempting ≤4 regexes per token instead of 30 (sf10 gate measured
  // 22.1 s flat-chain; the guards are cheap endswith checks). The
  // stage boundaries are exactly where the flat order allows cascades
  // (plural→ed/ing on "buildings", plural→derivational on
  // "kindnesses"), so re-dispatch between stages preserves them.
  // StemmerSpec locks staged ≡ flat over the fixture vocabulary.

  /** Guard letter(s) of a rule: the last literal letter(s) its suffix
    * can end with (a trailing `(ed|ing)` group contributes both). */
  private def guardChars(pattern: String): Set[Char] = {
    val body = pattern.stripSuffix("$")
    if (body.endsWith(")")) {
      val i = body.lastIndexOf("(")
      body.substring(i + 1, body.length - 1).split('|').map(_.last).toSet
    } else Set(body.last)
  }

  private val (pluralRules, edIngRules, derivStage) = {
    val (pl, rest) = Rules.splitAt(4)
    val (ed, deriv) = rest.splitAt(16)
    // init-time pins: the grouping is DERIVED from the table — a table
    // edit that breaks a stage's guard contract fails here, loudly
    require(pl.forall(r => guardChars(r._1) == Set('s')),
      "plural stage rules must all guard on 's'")
    require(ed.forall(r => guardChars(r._1).subsetOf(Set('d', 'g'))),
      "ed/ing stage rules must guard on 'd'/'g'")
    val letters = deriv.map(r => guardChars(r._1))
    require(letters.forall(_.size == 1),
      "derivational rules must have single-letter guards")
    val byChar = letters.map(_.head).distinct.map(c =>
      c -> deriv.filter(r => guardChars(r._1).head == c))
    (pl, ed, byChar)
  }

  // ---- the three renderers of the ONE table ------------------------

  private def chainCol(rules: Seq[(String, String)], x: Column): Column =
    rules.foldLeft(x) { case (c, (p, r)) =>
      regexp_replace(c, lit(p), lit(r.replace("{1}", "$1")))
    }

  // stage lambdas: `x` must be a CHEAP reference (a lambda variable) —
  // the no-match arms and guards repeat it
  private def stageP(x: Column): Column =
    when(x.endsWith("s"), chainCol(pluralRules, x)).otherwise(x)
  private def stageE(x: Column): Column =
    when(x.endsWith("d") || x.endsWith("g"), chainCol(edIngRules, x))
      .otherwise(x)
  private def stageD(x: Column): Column =
    derivStage.foldRight(x) { case ((c, rules), els) =>
      when(x.endsWith(c.toString), chainCol(rules, x)).otherwise(els)
    }

  /** Catalyst: one (lowercase a-z0-9) token through the staged plan.
    * Routed through per-stage array transforms so each stage's input
    * is a lambda VARIABLE — inlining the stages into one expression
    * would duplicate the earlier stages' subtrees across every guard
    * and no-match arm. */
  def stemCol(token: Column): Column =
    element_at(stemTokens(array(token)), 1)

  /** The staged plan over a token ARRAY (the analyzer's hot path). */
  private def stemTokens(tokens: Column): Column =
    transform(transform(transform(tokens, stageP _), stageE _),
      stageD _)

  /** DuckDB SQL: the staged plan over a token expression. `tokenExpr`
    * must be cheap (a column or lambda variable) — it repeats in the
    * guards and no-match arms exactly like the Catalyst twin. */
  def stemSql(tokenExpr: String): String = {
    def chainSql(rules: Seq[(String, String)], e: String): String =
      rules.foldLeft(e) { case (acc, (p, r)) =>
        s"regexp_replace($acc, '$p', '${r.replace("{1}", "\\1")}')"
      }
    val t = tokenExpr
    val p = s"CASE WHEN ends_with($t, 's') " +
      s"THEN ${chainSql(pluralRules, t)} ELSE $t END"
    val e = s"CASE WHEN ends_with(__p, 'd') OR ends_with(__p, 'g') " +
      s"THEN ${chainSql(edIngRules, "__p")} ELSE __p END"
    val d = derivStage.map { case (c, rules) =>
      s"WHEN ends_with(__e, '$c') THEN ${chainSql(rules, "__e")}"
    }.mkString("CASE ", " ", " ELSE __e END")
    // bind each stage's output to a lambda variable (list_transform
    // over a 1-element list) for the same no-duplication reason
    s"list_transform(list_transform([$p], __p -> $e), __e -> $d)[1]"
  }

  private def chainLocal(rules: Seq[(String, String)],
      w: String): String =
    rules.foldLeft(w) { case (s, (p, r)) =>
      s.replaceFirst(p, r.replace("{1}", "$1"))
    }

  /** Driver side: stem one query term through the staged plan
    * (replaceFirst ≡ replace-all for anchored patterns). */
  def stemLocal(term: String): String = {
    if (term.isEmpty) return term
    val p = if (term.endsWith("s")) chainLocal(pluralRules, term)
      else term
    val e = if (p.nonEmpty && (p.last == 'd' || p.last == 'g'))
      chainLocal(edIngRules, p) else p
    derivStage.find { case (c, _) => e.nonEmpty && e.last == c } match {
      case Some((_, rules)) => chainLocal(rules, e)
      case None => e
    }
  }

  // ---- analyzer = tokenize → stop-filter → stem ---------------------

  /** Document side, Catalyst: analyzed token array of a text column. */
  def analyzeCol(text: Column): Column =
    stemTokens(
      filter(TextFunctions.tokens(text),
        t => array_position(typedLit(StopWords), t) === 0))

  /** Query side, driver: analyzed distinct terms (already tokenized by
    * the ONE `$text` tokenizer). */
  def analyzeTerms(terms: Seq[String]): Seq[String] =
    terms.filterNot(StopWords.contains).map(stemLocal).distinct

  /** Document side, DuckDB: the analyzed token LIST of a text column
    * expression — the oracle twin of [[analyzeCol]], same staged
    * per-stage lambda structure. */
  def analyzeSqlTokens(textExpr: String): String = {
    def chainSql(rules: Seq[(String, String)], e: String): String =
      rules.foldLeft(e) { case (acc, (p, r)) =>
        s"regexp_replace($acc, '$p', '${r.replace("{1}", "\\1")}')"
      }
    val stops = StopWords.map(w => s"'$w'").mkString(", ")
    val p = s"CASE WHEN ends_with(t, 's') " +
      s"THEN ${chainSql(pluralRules, "t")} ELSE t END"
    val e = s"CASE WHEN ends_with(t, 'd') OR ends_with(t, 'g') " +
      s"THEN ${chainSql(edIngRules, "t")} ELSE t END"
    val d = derivStage.map { case (c, rules) =>
      s"WHEN ends_with(t, '$c') THEN ${chainSql(rules, "t")}"
    }.mkString("CASE ", " ", " ELSE t END")
    s"list_transform(list_transform(list_transform(list_filter(" +
      s"regexp_extract_all(lower($textExpr), '[a-z0-9]+'), " +
      s"t -> t NOT IN ($stops)), t -> $p), t -> $e), t -> $d)"
  }

  // ---- baked non-English analyzers (r18) ----------------------------
  // The r17 one-table device generalized: each language is ONE
  // (diacritic-fold table, stop set, ordered RE2-safe rule table)
  // triple rendering all three surfaces — Catalyst document tokens,
  // driver-side query terms, DuckDB oracle SQL. Tokenization folds
  // diacritics FIRST (Mongo's $text is diacritic-insensitive by
  // default — "rápidamente" and "rapidamente" must co-match), then
  // extracts [a-z0-9]+ runs; stop words are stored in FOLDED form.
  // The rule sets are compact light-stemmer selections in the spirit
  // of the published Snowball/light stemmers (suffix stripping with
  // minimum-stem guards), deliberately NOT the full automata: the
  // match contract is SELF-CONSISTENCY — query terms and document
  // tokens stem through the identical chain on every engine — and
  // the unit spec pins each language's canonical inflection pairs.
  // Flat sequential chains (8-10 anchored rules/language) — small
  // enough to skip the English table's letter-guard staging.

  /** One baked `$text` analyzer surface. */
  sealed trait TextAnalyzer {
    /** Mongo `$language` names served by this analyzer. */
    def names: Seq[String]
    /** Catalyst: analyzed token array of a document text column. */
    def docTokens(text: Column): Column
    /** Driver: validated `$search` string → analyzed distinct terms
      * (loud when every term is a stop word). */
    def searchTerms(search: String): Seq[String]
    /** DuckDB: the analyzed token LIST of a text column expression —
      * the oracle twin of [[docTokens]]. */
    def sqlTokens(textExpr: String): String
  }

  /** The staged English analyzer under the common surface. */
  object EnglishAnalyzer extends TextAnalyzer {
    val names = Seq("english", "en")
    def docTokens(text: Column): Column = analyzeCol(text)
    def searchTerms(search: String): Seq[String] = {
      val t = analyzeTerms(
        graft.filter.MqlFilter.textSearchTerms(search))
      require(t.nonEmpty,
        "$text: every search term is an english stop word")
      t
    }
    def sqlTokens(textExpr: String): String = analyzeSqlTokens(textExpr)
  }

  /** A folded-alphabet light-stemmer analyzer (es/fr/de). */
  final class LangAnalyzer(val names: Seq[String], foldFrom: String,
      foldTo: String, val stops: Seq[String],
      val rules: Seq[(String, String)]) extends TextAnalyzer {
    require(foldFrom.length == foldTo.length, names.head)

    private[graft] def foldLocal(s: String): String = s.map { ch =>
      val i = foldFrom.indexOf(ch)
      if (i >= 0) foldTo(i) else ch
    }

    /** Driver-side stem of one folded lowercase token (replaceFirst ≡
      * replace-all for anchored patterns, the English contract). */
    private[graft] def stemLocal(w: String): String =
      rules.foldLeft(w) { case (s, (p, r)) =>
        s.replaceFirst(p, r.replace("{1}", "$1"))
      }

    def docTokens(text: Column): Column =
      transform(
        filter(
          regexp_extract_all(
            org.apache.spark.sql.functions.translate(
              lower(text), foldFrom, foldTo),
            lit("[a-z0-9]+"), lit(0)),
          t => array_position(typedLit(stops), t) === 0),
        t => rules.foldLeft(t) { case (c, (p, r)) =>
          regexp_replace(c, lit(p), lit(r.replace("{1}", "$1")))
        })

    def searchTerms(search: String): Seq[String] = {
      val t = graft.filter.MqlFilter
        .textSearchTerms(foldLocal(
          search.toLowerCase(java.util.Locale.ROOT)))
        .filterNot(stops.contains).map(stemLocal).distinct
      require(t.nonEmpty,
        s"$$text: every search term is a ${names.head} stop word")
      t
    }

    def sqlTokens(textExpr: String): String = {
      val stopsSql = stops.map(w => s"'$w'").mkString(", ")
      val chain = rules.foldLeft("t") { case (acc, (p, r)) =>
        s"regexp_replace($acc, '$p', '${r.replace("{1}", "\\1")}')"
      }
      s"list_transform(list_filter(regexp_extract_all(" +
        s"translate(lower($textExpr), '$foldFrom', '$foldTo'), " +
        s"'[a-z0-9]+'), t -> t NOT IN ($stopsSql)), t -> $chain)"
    }
  }

  /** Spanish: ces→z + plural strip, -mente adverbs, -miento nouns,
    * participles/gerunds, infinitives, final-vowel strip (the classic
    * light-stemmer cascade: libros/libro→libr, rápidamente/rapido→
    * rapid, hablando/hablar/habla→habl, veces/vez→vez). */
  val Spanish: LangAnalyzer = new LangAnalyzer(
    Seq("spanish", "es"),
    "áéíóúüñ", "aeiouun",
    Seq("de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
      "las", "por", "un", "para", "con", "no", "una", "su", "al",
      "lo", "como", "mas", "pero", "sus", "le", "ya", "o", "este",
      "si", "porque", "esta", "entre", "cuando", "muy", "sin",
      "sobre", "tambien", "me", "hasta", "hay", "donde", "quien",
      "desde", "todo", "nos", "ni", "eso", "nada", "es", "son",
      "fue", "ser", "estar"),
    Seq(
      ("^(.*)ces$", "{1}z"),                       // veces → vez
      ("^(.*[drlnj])es$", "{1}"),                  // papeles → papel
      ("^(.*[aeiou])s$", "{1}"),                   // libros → libro
      ("^(.*[a-z]{2})mente$", "{1}"),              // rapidamente → rapida
      ("^(.*[a-z]{2})(amiento|imiento)$", "{1}"),  // pensamiento → pens
      ("^(.*[a-z]{2})(ando|iendo)$", "{1}"),       // hablando → habl
      ("^(.*[a-z]{2})(ado|ido|ada|ida)$", "{1}"),  // hablado → habl
      ("^(.*[a-z]{2})(ar|er|ir)$", "{1}"),         // hablar → habl
      ("^(.*[a-z]{2})[aoe]$", "{1}")))             // libro → libr

  /** French: -eaux/-aux plurals, -euse/-eux, plural s, -ement
    * adverbs, -ation family, common verb endings, final-e strip
    * (maisons/maison→maison, chevaux/cheval→cheval, parlant/parler/
    * parle→parl, formation/former→form, heureux/heureuse→heur). */
  val French: LangAnalyzer = new LangAnalyzer(
    Seq("french", "fr"),
    "àâäéèêëîïôöùûüç", "aaaeeeeiioouuuc",
    Seq("le", "la", "les", "de", "des", "du", "un", "une", "et",
      "ou", "mais", "donc", "car", "que", "qui", "quoi", "dont",
      "a", "au", "aux", "ce", "ces", "cette", "dans", "en", "par",
      "pour", "sur", "avec", "sans", "sous", "il", "elle", "ils",
      "elles", "je", "tu", "nous", "vous", "son", "sa", "ses",
      "leur", "leurs", "ne", "pas", "plus", "se", "est", "sont",
      "ete", "etre", "y", "si", "tout", "tous", "toute", "comme",
      "meme", "aussi", "tres"),
    Seq(
      ("^(.*eau)x$", "{1}"),                        // reseaux → reseau
      ("^(.*a)ux$", "{1}l"),                        // chevaux → cheval
      ("^(.*[a-z]{2})(euse|eux)$", "{1}"),          // heureux → heur
      ("^(.*[a-z]{2})s$", "{1}"),                   // maisons → maison
      ("^(.*[a-z]{2})ement$", "{1}"),               // rapidement → rapid
      ("^(.*[a-z]{2})(ation|ateur|atrice)$", "{1}"), // formation → form
      ("^(.*[a-z]{2})(er|ez|ent|ant|ait|ais)$", "{1}"), // parler → parl
      ("^(.*[a-z]{2})e$", "{1}")))                  // rapide → rapid

  /** German: -heit/-keit nouns, -ung(en) nouns, -lich/-isch
    * adjectives, declension endings en/er/es/em/e then n/s — applied
    * in sequence, so the chain over-strips consistently on both the
    * query and document sides (zeitungen/zeitung→zeit, laufen→lauf,
    * häuser/haus→hau, freundlich/freunde→freund). ß folds to a
    * single 's' (translate is 1:1 on every engine) — self-consistent
    * across all three surfaces, documented divergence from the
    * linguistic ss expansion. */
  val German: LangAnalyzer = new LangAnalyzer(
    Seq("german", "de"),
    "äöüß", "aous",
    Seq("der", "die", "das", "den", "dem", "des", "ein", "eine",
      "einen", "einem", "eines", "einer", "und", "oder", "aber",
      "nicht", "mit", "von", "zu", "im", "in", "am", "an", "auf",
      "fur", "ist", "sind", "war", "waren", "wird", "werden", "als",
      "auch", "aus", "bei", "durch", "nach", "uber", "um", "unter",
      "vor", "wie", "was", "wer", "wenn", "dann", "doch", "noch",
      "nur", "schon", "sehr", "so", "zum", "zur", "man", "kann",
      "hat", "haben", "sie", "er", "es", "ich", "wir", "ihr",
      "sein", "dieser", "diese", "dieses"),
    Seq(
      ("^(.*[a-z]{3})(heiten|keiten)$", "{1}"),  // moglichkeiten → moglich
      ("^(.*[a-z]{3})(heit|keit)$", "{1}"),      // moglichkeit → moglich
      ("^(.*[a-z]{3})ung(en)?$", "{1}"),         // zeitungen → zeit
      ("^(.*[a-z]{3})(lich|isch)$", "{1}"),      // freundlich → freund
      ("^(.*[a-z]{3})(en|er|es|em|e)$", "{1}"),  // laufen → lauf
      ("^(.*[a-z]{3})(n|s)$", "{1}")))           // haus → hau

  /** Italian: plural/gender vowel endings, -mente adverbs, -zione
    * nouns, verb endings (libri/libro→libr, rapidamente/rapido→rapid,
    * parlando/parlare/parla→parl, creazione/creare→cre). */
  val Italian: LangAnalyzer = new LangAnalyzer(
    Seq("italian", "it"),
    "àèéìíîòóùú", "aeeiiioouu",
    Seq("di", "a", "da", "in", "con", "su", "per", "tra", "fra",
      "il", "lo", "la", "i", "gli", "le", "un", "uno", "una",
      "e", "o", "ma", "se", "che", "chi", "cui", "non", "piu",
      "del", "della", "dello", "dei", "delle", "degli", "nel",
      "nella", "al", "alla", "allo", "ai", "alle", "sono", "era",
      "essere", "questo", "questa", "questi", "queste", "quello",
      "quella", "come", "anche", "molto", "tutto", "tutti", "ci",
      "si", "lui", "lei", "loro", "io", "tu", "noi", "voi"),
    Seq(
      ("^(.*[a-z]{2})mente$", "{1}"),               // rapidamente → rapida
      ("^(.*[a-z]{2})zioni$", "{1}zione"),          // creazioni → creazione
      ("^(.*[a-z]{2})zione$", "{1}"),               // creazione → crea
      ("^(.*[a-z]{2})(ando|endo)$", "{1}"),         // parlando → parl
      ("^(.*[a-z]{2})(ato|ata|ati|ate|uto|uti|ito|iti)$", "{1}"),
      // final vowel BEFORE the infinitive rule: -are/-ere/-ire lose
      // their 'e' in the vowel strip and the (ar|er|ir) residue is
      // stripped after, so "creare"→crear→cre lands exactly where the
      // -zione cascade's "crea"→cre does (a trailing (are|...) rule
      // would double-strip: creare→cre→cr, diverging from creazioni)
      ("^(.*[a-z]{2})[aeio]$", "{1}"),              // libri/libro → libr
      ("^(.*[a-z]{2})(ar|er|ir)$", "{1}")))         // crear → cre

  /** Portuguese: plural (ções→ção handled pre-fold as coes/cao),
    * -mente adverbs, -mento nouns, participles/gerunds, infinitives,
    * final-vowel strip (livros/livro→livr, falando/falar/fala→fal,
    * rapidamente/rapido→rapid). The nasal plural ções folds to coes —
    * its singular ção folds to cao, so a dedicated oes→ao rule keeps
    * the pair co-stemming in FOLDED space. */
  val Portuguese: LangAnalyzer = new LangAnalyzer(
    Seq("portuguese", "pt"),
    "áàâãéêíóôõúüç", "aaaaeeiooouuc",
    Seq("de", "a", "o", "que", "e", "do", "da", "em", "um", "para",
      "com", "nao", "uma", "os", "no", "se", "na", "por", "mais",
      "as", "dos", "como", "mas", "ao", "ele", "das", "seu", "sua",
      "ou", "quando", "muito", "nos", "ja", "eu", "tambem", "so",
      "pelo", "pela", "ate", "isso", "ela", "entre", "depois",
      "sem", "mesmo", "aos", "seus", "quem", "nas", "me", "esse",
      "eles", "voce", "essa", "num", "nem", "suas", "meu", "minha",
      "numa", "pelos", "elas", "qual", "lhe", "deles", "essas",
      "esses", "pelas", "este", "dele", "ser", "esta", "estar"),
    Seq(
      ("^(.*[a-z]{2})oes$", "{1}ao"),               // coracoes → coracao
      ("^(.*[drlnz])es$", "{1}"),                   // flores → flor
      ("^(.*[aeiou])s$", "{1}"),                    // livros → livro
      ("^(.*[a-z]{2})mente$", "{1}"),               // rapidamente → rapida
      ("^(.*[a-z]{2})(amento|imento)$", "{1}"),     // pensamento → pens
      ("^(.*[a-z]{2})(ando|endo|indo)$", "{1}"),    // falando → fal
      ("^(.*[a-z]{2})(ado|ido|ada|ida)$", "{1}"),   // falado → fal
      ("^(.*[a-z]{2})(ar|er|ir)$", "{1}"),          // falar → fal
      ("^(.*[a-z]{2})[aoe]$", "{1}")))              // livro → livr

  /** Dutch: diminutive -je(s), plural -en/-s, -heid nouns, -lijk/
    * -isch adjectives, declension -e (huizen/huis→hui via the
    * consistent over-strip, lopen→lop, mogelijkheden/mogelijk→
    * mogelijk, boekje/boek→boek). */
  val Dutch: LangAnalyzer = new LangAnalyzer(
    Seq("dutch", "nl"),
    "áàäéèëíìïóòöúùü", "aaaeeeiiiooouuu",
    Seq("de", "het", "een", "en", "van", "in", "op", "aan", "met",
      "voor", "er", "maar", "om", "dan", "zou", "of", "wat", "mijn",
      "men", "dit", "zo", "door", "over", "ze", "zich", "bij",
      "ook", "tot", "je", "mij", "uit", "der", "daar", "haar",
      "naar", "heb", "hoe", "heeft", "hebben", "deze", "u", "want",
      "nog", "zal", "me", "zij", "nu", "ge", "geen", "omdat",
      "iets", "worden", "toch", "al", "waren", "veel", "meer",
      "doen", "toen", "moet", "ben", "zonder", "kan", "hun", "dus",
      "alles", "onder", "ja", "eens", "hier", "wie", "werd",
      "altijd", "doch", "wordt", "wezen", "kunnen", "ons", "zelf",
      "tegen", "na", "reeds", "wil", "kon", "niets", "uw", "iemand",
      "geweest", "andere", "niet", "hij", "is", "was", "dat", "die"),
    Seq(
      ("^(.*[a-z]{2})(heden|heid)$", "{1}"),        // mogelijkheden → mogelijk
      ("^(.*[a-z]{2})(tje|tjes|je|jes)$", "{1}"),   // boekje → boek
      ("^(.*[a-z]{3})en$", "{1}"),                  // lopen → lop
      ("^(.*[a-z]{3})s$", "{1}"),                   // boeks → boek
      ("^(.*[a-z]{2})(lijk|isch)$", "{1}"),         // vriendelijk → vriend
      ("^(.*[a-z]{3})e$", "{1}")))                  // grote → grot

  private val Baked: Seq[TextAnalyzer] =
    Seq(EnglishAnalyzer, Spanish, French, German, Italian,
      Portuguese, Dutch)

  /** `$language` dispatch for every `$text` surface: None = "none"
    * (exact tokens), Some = a baked analyzer; anything else is a loud
    * refusal naming the baked set. */
  def analyzerFor(lang: String): Option[TextAnalyzer] =
    if (lang == "none") None
    else Baked.find(_.names.contains(lang)).map(Some(_)).getOrElse(
      throw new IllegalArgumentException(
        s"$$text analyzer '$lang' unsupported: baked analyzers are " +
          Baked.map(_.names.mkString("/")).mkString(", ") +
          " (one rule table each rendering Catalyst + driver + oracle " +
          "SQL) and 'none' (exact tokens) — other Snowball languages " +
          "need their own baked rule tables"))
}
