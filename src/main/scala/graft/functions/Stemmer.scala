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
}
