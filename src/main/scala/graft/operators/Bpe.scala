package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and ENCODING, Spark-first.
  *
  * BPE training (the Sennrich et al. 2016 formulation) iteratively
  * merges the most frequent adjacent symbol pair. The key scale insight
  * is that training runs on the WORD-FREQUENCY DICTIONARY, not the
  * corpus: one corpus-scale groupBy builds `(word, freq)` (at 100 TB
  * that's the only full-data pass — the dict is bounded by distinct
  * words, millions of rows, not trillions of tokens), and every merge
  * iteration is then one pair-count aggregation over the dict (map-side
  * partial sums, one k-sized `limit(1).collect()` to pick the winner —
  * the same bounded-driver-fixture pattern as the IVF centroid reads).
  * The merge APPLY is a per-row left fold (non-overlapping, leftmost
  * first — the BPE contract), a codegen'd higher-order function with no
  * shuffle; `localCheckpoint` truncates the growing lineage each round
  * so iteration N doesn't replay rounds 1..N-1.
  *
  * Words carry the `</w>` end-of-word marker as their final symbol, so
  * word-final merges stay distinct from word-internal ones (the
  * standard formulation).
  *
  * Not SQL-expressible (iterative argmax-dependent rewrites), so these
  * gates are rows-only under the driver; the merge sequence itself is
  * locked by a hand-computed fixture in BpeSpec.
  */
object Bpe {

  /** Number of merge rounds the registered gates run. */
  val Merges = 10

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** word → its initial symbol sequence: characters + `</w>`. */
  private def charSyms(word: Column): Column =
    concat(
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
      array(lit("</w>")))

  /** Adjacent pairs of a symbol sequence, as (a, b) structs. */
  private def pairsOf(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (x, y) => struct(x.as("a"), y.as("b")))

  /** Greedy left-to-right NON-OVERLAPPING merge of pair (a, b) into one
    * symbol — the BPE apply step, as a pure fold: append each symbol,
    * except when the running sequence ends in `a` and the symbol is `b`,
    * in which case replace that tail with the merged token. */
  private[graft] def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      slice(syms, 1, 0), // empty array<string>, typed from the input
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** One merge pick + apply over the dict; returns the merge row
    * `(a, b, weight)` or None when no pair remains. */
  private def step(words: DataFrame): (Option[(String, String, Long)], DataFrame) = {
    val top = words
      .select(explode(pairsOf(col("syms"))).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("w"))
      .orderBy(col("w").desc, col("a").asc, col("b").asc)
      .limit(1).collect()
    if (top.isEmpty) (None, words)
    else {
      val (a, b, w) = (top(0).getString(0), top(0).getString(1),
        top(0).getLong(2))
      val next = words
        .withColumn("syms", mergeFold(col("syms"), a, b))
        .localCheckpoint()
      (Some((a, b, w)), next)
    }
  }

  /** Train up to `maxMerges` rounds over a `(syms, freq)` dict; the
    * learned table is `(rank, left, right, merged, weight)` in merge
    * order. Stops early when no adjacent pair remains. */
  private[graft] def trainOn(words0: DataFrame, maxMerges: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var words = words0.localCheckpoint()
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1L
    var continue = true
    while (continue && rank <= maxMerges) {
      val (pick, next) = step(words)
      pick match {
        case Some((a, b, w)) =>
          out += ((rank, a, b, a + b, w)); words = next; rank += 1
        case None => continue = false
      }
    }
    out.result()
  }

  /** Corpus word dict → [[Merges]] learned merges. */
  def trainMerges(s: SparkSession, dir: String): Seq[(Long, String, String, String, Long)] =
    trainOn(
      docs(s, dir)
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .select(charSyms(col("word")).as("syms"), col("freq")),
      Merges)

  /** Gate: the learned merge table itself. */
  def bpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainMerges(s, dir)
      .toDF("rank", "left", "right", "merged", "weight")
      .orderBy("rank")
  }

  /** Gate: encode every document with the merges learned from the SAME
    * corpus. The folds run over the DISTINCT-WORD dict only (the same
    * dict-bounded insight as training — a word's segmentation doesn't
    * depend on which document it's in), and the token stream picks up
    * its piece counts through a broadcast join: at 100 TB the corpus
    * pays one tokenize + one broadcast lookup, never a per-token fold. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val merges = trainMerges(s, dir)
    val toks = docs(s, dir)
      .select(col("doc_id"),
        explode(tokens(col("text"))).as("word"))
    val dict = toks.select("word").distinct()
      .select(col("word"), charSyms(col("word")).as("syms"))
    val encoded = merges.foldLeft(dict) { case (df, (_, a, b, _, _)) =>
      df.withColumn("syms", mergeFold(col("syms"), a, b))
    }.select(col("word"), size(col("syms")).cast("long").as("n_pieces"))
    toks.join(broadcast(encoded), Seq("word"))
      .groupBy("doc_id")
      .agg(sum(col("n_pieces")).as("n_pieces"),
        count(lit(1)).as("n_words"))
      .orderBy("doc_id")
  }

  // Iterative argmax-dependent rewrites — not SQL-expressible; the
  // driver records the rows-only check and BpeSpec locks the semantics.
  val oracle: Map[String, String] = Map.empty

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_train" -> (bpeTrain _),
    "bpe_encode" -> (bpeEncode _)
  )
}
