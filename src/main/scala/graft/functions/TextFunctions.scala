package graft.functions

import graft.expr.{FingerprintHash, LangIdHash, MinHashShingleSig, MinHashSig, SimHash60, SimHashBands, WordNgramsExpr}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
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

  /** Word n-grams over a token array, space-joined. Native expression
    * ([[graft.expr.WordNgramsExpr]]); bit-equal to the composed
    * `transform(sequence(1, size-n+1), i => concat_ws(" ", slice(toks, i,
    * n)))` form, which evaluates interpreted per element. */
  def wordNgrams(toks: Column, n: Int): Column =
    toCol(WordNgramsExpr(toExpr(toks), n))

  /** Trained-language-ID trigram buckets (r15): hash60("lid:"+w) mod
    * buckets per 3-codepoint window — bit-equal to the composed
    * `transform(charNgrams(t,3), pmod(md5Hash60(concat('lid:', g)),
    * buckets))`, one codegen'd loop instead of an interpreted
    * per-trigram lambda. */
  def lidGrams(text: Column, buckets: Int): Column =
    toCol(graft.expr.LidGramsExpr(toExpr(text), buckets))

  /** Trained-language-ID scoring (r15): per-row linear-ppm sums over
    * the bucket-major flat LUT, argmax with first-max (lex-smallest)
    * tie-break, empty grams → 'und'. */
  def lidArgmax(fs: Column, flat: Array[Long],
      langs: Array[String]): Column =
    toCol(graft.expr.LidArgmaxExpr(toExpr(fs), flat,
      langs.map(org.apache.spark.unsafe.types.UTF8String.fromString)))

  /** One MinHash value: lexicographic min of seeded md5 hex over shingles.
    * (min over hex strings == min over the underlying 128-bit ints). The
    * composed-builtin spec of what [[minhashSignature]] computes natively. */
  def minhashHex(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$seed:"), s))))

  /** MinHash signature of length k (array of md5 hex strings) — native
    * one-pass Catalyst expression ([[graft.expr.MinHashSig]]); bit-equal
    * to `array((0 until k).map(minhashHex(shingles, _)))` at ~30× less
    * cost (no per-element lambda interpretation, one digest instance). */
  def minhashSignature(shingles: Column, k: Int): Column =
    toCol(MinHashSig(toExpr(shingles), k))

  /** Fused shingle+MinHash: token array → struct(sig: array<string>,
    * sh: array<long>) where `sig` is the k-element MinHash signature over
    * distinct word n-gram shingles and `sh` is the 60-bit hash of each
    * distinct shingle (set arithmetic on longs downstream instead of
    * shingle strings). One codegen'd pass
    * ([[graft.expr.MinHashShingleSig]]); bit-equal to
    * `minhashSignature(array_distinct(wordNgrams(toks, n)), k)` plus
    * per-shingle [[md5Hash60]]. */
  def minhashShingles(toks: Column, n: Int, k: Int): Column =
    toCol(MinHashShingleSig(toExpr(toks), n, k))

  /** 60-bit SimHash over a token array. Bit j of the result is set iff the
    * majority of DISTINCT-token hashes have bit j set (ties → 0). Native
    * expression — the composed form needed 60 interpreted aggregates. */
  def simhash60(toks: Column): Column = toCol(SimHash60(toExpr(toks)))

  /** Fused simhash signature + band values (struct(sig, bands)) — one
    * md5 pass where sig-then-band-in-Column-space evaluates the
    * signature once per consuming projection. */
  def simhashBands(toks: Column, bandBits: Int, nBands: Int): Column =
    toCol(SimHashBands(toExpr(toks), bandBits, nBands))

  /** Hamming distance between two simhash LONGs. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Document fingerprint: min 60-bit rolling k-gram hash (simplified
    * winnowing — the global minimum is every winnowing window's
    * candidate); whole-text hash for texts shorter than k. Native
    * expression ([[graft.expr.FingerprintHash]]). */
  def fingerprint(text: Column, k: Int = 8): Column =
    toCol(FingerprintHash(toExpr(text), k))

  /** Language marker stopwords (tiny, deterministic n-gram-free
    * heuristic); canonical definition in [[graft.expr.TextHash]]. */
  val langMarkers: Map[String, Seq[String]] = graft.expr.TextHash.langMarkers

  /** Marker-hit count for one language: number of DISTINCT markers present
    * in the token array (count over the marker list, not the tokens, so
    * set-vs-bag ambiguity can't diverge between engines). */
  def langScore(toks: Column, lang: String): Column =
    size(filter(array(langMarkers(lang).map(lit): _*),
      m => array_contains(toks, m)))

  /** Predicted language = argmax marker-hit count, ties broken by language
    * code order, "und" when no marker hits at all. Native expression. */
  def langId(toks: Column): Column = toCol(LangIdHash(toExpr(toks)))
}
