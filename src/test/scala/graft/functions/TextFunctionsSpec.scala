package graft.functions

import graft.SparkTestBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lower}

/** Text primitives vs plain-Scala reference implementations — the same
  * determinism contract the DuckDB oracles rely on. */
class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def eval1[T](text: String, c: Column => Column): T =
    Seq(text).toDF("t").select(c(col("t"))).head().getAs[T](0)

  // collections come back as mutable ArraySeq — normalize to List
  private def evalSeq(text: String, c: Column => Column): List[String] =
    Seq(text).toDF("t").select(c(col("t"))).head()
      .getSeq[String](0).toList

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def refHash60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(15), 16)

  test("lidGrams fused pass == composed charNgrams+md5 form; lidArgmax " +
      "== composed aggregate/zip_with over the same flat LUT (r15)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .limit(80).select(col("doc_id"),
        lower(substring(col("text"), 1, 120)).as("t"))
    val b = 64
    val composedG = transform(charNgrams(col("t"), 3), g =>
      pmod(md5Hash60(concat(lit("lid:"), g)), lit(b)).cast("int"))
    val both = docs.select(col("doc_id"),
      lidGrams(col("t"), b).as("fused"), composedG.as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    // short/empty inputs: under-3-char text → empty array both ways
    val short = Seq("ab", "", "xyz").toDF("t")
      .select(lidGrams(col("t"), b).as("f"))
      .collect().map(_.getSeq[Int](0).toList)
    assert(short(0) == Nil && short(1) == Nil && short(2).length == 1)
    // argmax: same flat LUT through the composed form
    val langs = Array("de", "en", "fr")
    val nL = langs.length
    val rnd = new scala.util.Random(7)
    val flat = Array.fill(b * nL)(rnd.nextInt(2000000).toLong)
    val composedA = when(size(col("fs")) === 0, lit("und"))
      .otherwise(aggregate(col("fs"),
        array(langs.map(_ => lit(0L)).toIndexedSeq: _*),
        (acc, f) => zip_with(acc,
          slice(lit(flat), f * lit(nL) + lit(1), lit(nL)),
          (a, w) => a + w),
        acc => element_at(lit(langs),
          array_position(acc, array_max(acc)).cast("int"))))
    val scored = docs.select(lidGrams(col("t"), b).as("fs"))
      .union(Seq("x").toDF("t").select(lidGrams(col("t"), b).as("fs")))
      .select(col("fs"), lidArgmax(col("fs"), flat, langs).as("fused"),
        composedA.as("composed"))
    assert(scored.filter(col("fused") =!= col("composed")).count() == 0)
    assert(scored.filter(size(col("fs")) === 0)
      .select(col("fused")).head().getString(0) == "und")
  }

  test("minhashShingles fused pass == composed built-in form on real docs") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .limit(50).select(col("doc_id"), col("text"))
    val fused = docs.select(col("doc_id"),
        minhashShingles(tokens(col("text")), 3, 12).as("ss"))
      .select(col("doc_id"), col("ss.sig").as("sig"), col("ss.sh").as("sh"))
    // fully composed built-in form (NOT the native WordNgramsExpr) so
    // the fused expression is checked against an independent code path
    val t3 = tokens(col("text"))
    val composedSh = array_distinct(when(size(t3) >= 3,
      transform(sequence(lit(1), size(t3) - 2),
        i => concat_ws(" ", slice(t3, i, lit(3))))).otherwise(array()))
    val composed = docs.select(col("doc_id"),
      minhashSignature(composedSh, 12).as("sig"),
      transform(composedSh, s => md5Hash60(s)).as("sh"))
    val joined = fused.as("f").join(composed.as("c"), "doc_id")
    val bad = joined.filter(col("f.sig") =!= col("c.sig") ||
      col("f.sh") =!= col("c.sh"))
    assert(bad.count() == 0, bad.collect().take(2).mkString(";"))
  }

  test("minhashShingles: fewer tokens than n gives empty sh, null sig") {
    val r = Seq("one two").toDF("t")
      .select(minhashShingles(tokens(col("t")), 3, 4).as("ss"))
      .select(col("ss.sig"), col("ss.sh")).head()
    assert(r.getSeq[String](0) == Seq(null, null, null, null))
    assert(r.getSeq[Long](1).isEmpty)
  }

  test("tokens: lowercased alnum runs") {
    assert(evalSeq("Hello, World-42 X!", tokens)
      == Seq("hello", "world", "42", "x"))
    assert(evalSeq("...", tokens) == Seq.empty)
  }

  test("md5Hash60 equals the scala reference (first 15 md5 hex chars)") {
    for (s <- Seq("a", "hello", "", "Zürich"))
      assert(eval1[Long](s, md5Hash60(_)) == refHash60(s), s)
  }

  test("charNgrams: count and short-text edge") {
    assert(evalSeq("abcd", charNgrams(_, 2))
      == Seq("ab", "bc", "cd"))
    assert(evalSeq("ab", charNgrams(_, 3)) == Seq.empty)
  }

  test("wordNgrams over tokens") {
    assert(evalSeq("a b c d", t => wordNgrams(tokens(t), 3))
      == Seq("a b c", "b c d"))
    assert(evalSeq("a b", t => wordNgrams(tokens(t), 3))
      == Seq.empty)
  }

  test("minhash signature: length k, deterministic, order-insensitive") {
    def sig(t: String) = evalSeq(t,
      c => minhashSignature(charNgrams(lower(c), 3), 12))
    assert(sig("abcdef").length == 12)
    assert(sig("abcdef") == sig("abcdef"))
    // same shingle SET (reversed text shares no 3-grams; use permuted docs)
    assert(sig("xy abcdef") != sig("abcdef"))
  }

  test("simhash60: deterministic, 60-bit, sensitive to token change") {
    def sh(t: String) = eval1[Long](t, c => simhash60(tokens(c)))
    val a = sh("the quick brown fox jumps over the lazy dog")
    assert(a == sh("the quick brown fox jumps over the lazy dog"))
    assert(a >= 0 && a < (1L << 60))
    assert(a != sh("completely different words entirely"))
  }

  test("simhashBands: fused sig+bands == simhash60 + shiftright banding") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "completely different words entirely", "a b c", "")
    for (t <- texts) {
      val row = Seq(t).toDF("t")
        .select(simhashBands(tokens(col("t")), 15, 4).as("sb"),
          simhash60(tokens(col("t"))).as("sim"))
        .select(col("sb.sig"), col("sb.bands"), col("sim"))
        .head()
      val sig = row.getLong(0)
      val bands = row.getSeq[Long](1)
      assert(sig == row.getLong(2)) // fused sig == standalone sig
      assert(bands.length == 4)
      for (b <- 0 until 4)
        assert(bands(b) == ((sig >>> (b * 15)) & 0x7fffL))
    }
  }

  test("hamming distance") {
    val d = Seq((3L, 1L)).toDF("a", "b")
      .select(hamming(col("a"), col("b"))).head().getLong(0)
    assert(d == 1L)
  }

  test("fingerprint: min 8-gram hash; short text falls back to whole-text") {
    // short branch == md5Hash60(lower(text))
    assert(eval1[Long]("AbC", fingerprint(_)) == refHash60("abc"))
    // long branch == scala-side min over all 8-grams
    val text = "the quick brown fox"
    val grams = text.toLowerCase.sliding(8).toSeq
    assert(eval1[Long](text, fingerprint(_)) == grams.map(refHash60).min)
  }

  test("langId picks the marker-dominant language, und when none") {
    def lid(t: String) = eval1[String](t, c => langId(tokens(c)))
    assert(lid("the cat and the dog of the house is in a tree") == "en")
    assert(lid("le chat et la vache de la ferme un une les") == "fr")
    assert(lid("zzz qqq www") == "und")
  }
}
