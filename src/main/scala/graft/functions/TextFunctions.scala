package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the dedup / text-analysis operator family.
  *
  * Everything here is built from codegen'd built-ins and is *cross-engine
  * deterministic*: hashes derive from md5 hex (identical in any engine),
  * integer arithmetic only, no RNG, no JVM hashCode. That lets the DuckDB
  * oracle replicate each operator exactly (SURVEY.md §5.3).
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens. regexp_extract_all (not split) so
    * empty-string edge cases can't diverge between engines. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** 60-bit non-negative hash of a string: first 15 hex chars of md5.
    * Stable across JVMs/engines (unlike murmur/hashCode); fits a LONG. */
  def md5Hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Seeded variant — the "k independent hash functions" of MinHash. */
  def md5Hash60(s: Column, seed: Int): Column =
    md5Hash60(concat(lit(s"$seed:"), s))

  /** Character n-grams (shingles) of fixed n; empty array when the text is
    * shorter than n. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array())

  /** Word n-grams over a token array, space-joined. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array())

  /** One MinHash value: lexicographic min of seeded md5 hex over shingles.
    * (min over hex strings == min over the underlying 128-bit ints). */
  def minhashHex(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$seed:"), s))))

  /** MinHash signature of length k (array of hex strings). */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(i => minhashHex(shingles, i)): _*)

  /** 60-bit SimHash over a token array. Bit j of the result is set iff the
    * majority of token hashes have bit j set (ties → 0, deterministic). */
  def simhash60(toks: Column): Column = {
    val hashes = transform(array_distinct(toks), t => md5Hash60(t))
    // Unrolled Scala-level bit loop: each shift amount is a literal Int, so
    // the whole expression constant-folds into 60 codegen'd aggregates —
    // no Column-typed shift (shiftright needs an Int) and no lambda nesting.
    (0 until 60).map { j =>
      val bitSum = aggregate(hashes, lit(0L),
        (a, h) => a + (shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash LONGs. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Document fingerprint: min 60-bit rolling k-gram hash (simplified
    * winnowing — the global minimum is every winnowing window's candidate). */
  def fingerprint(text: Column, k: Int = 8): Column = {
    val grams = charNgrams(lower(text), k)
    when(size(grams) > 0, array_min(transform(grams, g => md5Hash60(g))))
      .otherwise(md5Hash60(lower(text)))
  }

  /** Language marker stopwords (tiny, deterministic n-gram-free heuristic).
    * Per-language hit count = |tokens ∩ markers|. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "en", "que", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "zh" -> Seq("de0", "shi4", "zai4", "le0", "he2", "you3", "wo3")
  )

  /** Marker-hit count for one language: number of DISTINCT markers present
    * in the token array (count over the marker list, not the tokens, so
    * set-vs-bag ambiguity can't diverge between engines). */
  def langScore(toks: Column, lang: String): Column =
    size(filter(array(langMarkers(lang).map(lit): _*),
      m => array_contains(toks, m)))

  /** Predicted language = argmax marker-hit count, ties broken by language
    * code order, "und" when no marker hits at all. */
  def langId(toks: Column): Column = {
    val scores = langMarkers.keys.toSeq.sorted
      .map(lang => (lang, langScore(toks, lang)))
    val best = scores.foldLeft((lit("und"), lit(0))) {
      case ((bl, bc), (lang, cnt)) =>
        (when(cnt > bc, lit(lang)).otherwise(bl),
          when(cnt > bc, cnt).otherwise(bc))
    }
    best._1
  }
}
