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

  // ---- the three renderers of the ONE table ------------------------

  /** Catalyst: the rule chain over one (lowercase a-z0-9) token. */
  def stemCol(token: Column): Column =
    Rules.foldLeft(token) { case (c, (p, r)) =>
      regexp_replace(c, lit(p), lit(r.replace("{1}", "$1")))
    }

  /** DuckDB SQL: the same chain as nested regexp_replace over a token
    * expression (DuckDB replacement backrefs are `\1`; plain single-
    * quoted strings do not process backslash escapes, so the literal
    * reaches RE2 intact). */
  def stemSql(tokenExpr: String): String =
    Rules.foldLeft(tokenExpr) { case (e, (p, r)) =>
      s"regexp_replace($e, '$p', '${r.replace("{1}", "\\1")}')"
    }

  /** Driver side: stem one query term (replaceFirst ≡ replace-all for
    * anchored patterns). */
  def stemLocal(term: String): String =
    Rules.foldLeft(term) { case (w, (p, r)) =>
      w.replaceFirst(p, r.replace("{1}", "$1"))
    }

  // ---- analyzer = tokenize → stop-filter → stem ---------------------

  /** Document side, Catalyst: analyzed token array of a text column. */
  def analyzeCol(text: Column): Column =
    transform(
      filter(TextFunctions.tokens(text),
        t => array_position(typedLit(StopWords), t) === 0),
      stemCol(_))

  /** Query side, driver: analyzed distinct terms (already tokenized by
    * the ONE `$text` tokenizer). */
  def analyzeTerms(terms: Seq[String]): Seq[String] =
    terms.filterNot(StopWords.contains).map(stemLocal).distinct

  /** Document side, DuckDB: the analyzed token LIST of a text column
    * expression — the oracle twin of [[analyzeCol]]. */
  def analyzeSqlTokens(textExpr: String): String = {
    val stops = StopWords.map(w => s"'$w'").mkString(", ")
    s"list_transform(list_filter(" +
      s"regexp_extract_all(lower($textExpr), '[a-z0-9]+'), " +
      s"t -> t NOT IN ($stops)), t -> ${stemSql("t")})"
  }
}
