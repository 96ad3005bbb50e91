package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE training + apply and WordPiece greedy semantics, locked by
  * hand-computed fixtures (both gate families also carry full DuckDB
  * oracles since r10 — these fixtures pin the algorithms
  * independently of the corpus). */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def dict(rows: (Seq[String], Long)*) =
    rows.toSeq.toDF("syms", "freq")

  test("merge sequence matches the hand computation, with lex tiebreak") {
    // words: "ab" ×3 → [a,b,</w>], "abc" ×1 → [a,b,c,</w>]
    val words = dict(
      (Seq("a", "b", "</w>"), 3L),
      (Seq("a", "b", "c", "</w>"), 1L))
    val merges = Bpe.trainOn(words, 10)
    // iter1: (a,b)=4 wins; iter2: (ab,</w>)=3; iter3: tie at weight 1
    // between (ab,c) and (c,</w>) — lex on left symbol picks (ab,c);
    // iter4: (abc,</w>)=1; iter5: no pairs remain → early stop.
    assert(merges == Seq(
      (1L, "a", "b", "ab", 4L),
      (2L, "ab", "</w>", "ab</w>", 3L),
      (3L, "ab", "c", "abc", 1L),
      (4L, "abc", "</w>", "abc</w>", 1L)))
  }

  test("mergeFold is greedy left-to-right, non-overlapping") {
    val df = Seq(Seq("a", "a", "a", "a", "a")).toDF("syms")
      .select(Bpe.mergeFold(col("syms"), "a", "a").as("m"))
    // aaaaa + (a,a) → [aa, aa, a]: occurrences never overlap
    assert(df.head.getSeq[String](0) == Seq("aa", "aa", "a"))
    val df2 = Seq(Seq("a", "b", "a", "b")).toDF("syms")
      .select(Bpe.mergeFold(col("syms"), "a", "b").as("m"))
    assert(df2.head.getSeq[String](0) == Seq("ab", "ab"))
    // merged token doesn't cascade within the same round
    val df3 = Seq(Seq("a", "b", "b")).toDF("syms")
      .select(Bpe.mergeFold(col("syms"), "a", "b").as("m"))
    assert(df3.head.getSeq[String](0) == Seq("ab", "b"))
  }

  test("wordpiece: greedy longest-match-first with hand vocab — whole " +
      "word beats prefix, prefix beats chars, suffix continuations") {
    val chars = ('a' to 'z').map(_.toString)
    val startV = chars ++ Seq("play", "pl")
    val contV = chars ++ Seq("ing", "ay")
    val words = Seq(("play", 5L), ("playing", 3L), ("play1", 1L),
      ("pling", 2L), ("zz", 1L)).toDF("w", "n")
    val got = Bpe.wordpieceOver(words, startV, contV)
      .orderBy("w")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      ("play", 1L, "play"),             // whole-word piece wins
      ("play1", 2L, "play ##1"),        // then the char continuation
      ("playing", 2L, "play ##ing"),    // longest continuation wins
      ("pling", 2L, "pl ##ing"),        // prefix piece, then suffix
      ("zz", 2L, "z ##z")))             // chars guarantee progress
  }

  test("wordpiece: a word the rounds cannot consume fails loudly") {
    val chars = ('a' to 'z').map(_.toString)
    // 11+ chars cannot finish in 1 start + 9 continuation single-char
    // rounds — must raise, never silently truncate
    val words = Seq(("abcdefghijkl", 1L)).toDF("w", "n")
    val e = intercept[Exception] {
      Bpe.wordpieceOver(words, chars, chars).collect()
    }
    assert(e.getMessage.contains("wordpiece: word not consumed"),
      e.getMessage)
  }

  test("viterbi DP beats greedy where longest-match over-segments, " +
      "matches it on chars-only, and errors loudly past the bound") {
    val chars = ('a' to 'z').map(_.toString)
    // vocab: chars + "ab" + "cde" — greedy on "abcde" takes "ab" then
    // "cde" (2); on "abc" greedy takes "ab"+"c" (2) which IS optimal;
    // the interesting case: vocab chars + "abc" + "ab" + "cd" on
    // "abcd": greedy longest-first takes "abc"+"d" (2), DP also 2;
    // make greedy lose: vocab chars + "ab" + "bcd" on "abcd" — greedy
    // takes "ab" then c,d (3); DP takes "a" + "bcd" (2).
    val vocab = chars ++ Seq("ab", "bcd")
    val words = Seq(("abcd", 5L), ("zz", 1L)).toDF("w", "n")
    val got = Bpe.viterbiOver(words, vocab)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(("abcd", 5L, 2L), ("zz", 1L, 2L)), got.mkString(","))
    // loud bound: a 13-char word must raise
    val e = intercept[Exception] {
      Bpe.viterbiOver(Seq(("abcdefghijklm", 1L)).toDF("w", "n"), chars)
        .collect()
    }
    assert(e.getMessage.contains("viterbi: word longer"), e.getMessage)
  }

  test("gates run end-to-end on sf0.001 and the encode conserves words") {
    val train = Bpe.bpeTrain(spark, sf0001).collect()
    assert(train.length == Bpe.Merges)
    // weights are non-increasing in rank (a merge can only remove mass
    // from the pair distribution it was picked from)
    val ws = train.map(_.getLong(4)).toSeq
    assert(ws == ws.sorted.reverse)
    val enc = Bpe.bpeEncode(spark, sf0001)
    val row = enc.filter(col("doc_id") === 0).head
    assert(row.getLong(1) > 0 && row.getLong(2) > 0)
    // piece count is bounded by char count + one marker per word
    assert(enc.count() > 0)
  }
}
