package graft.operators

import graft.SparkTestBase

/** Dedup pipeline semantics on a controlled corpus: LSH banding finds the
  * planted near-duplicate pair, rejects unrelated docs, and the exact
  * operator distinguishes byte-identical from merely-similar. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("minhashPairs finds a planted near-dup, not unrelated docs") {
    val corpus = Seq(
      (1L, base),
      (2L, base + " phi chi"), // near-dup: shares almost all 3-grams
      (3L, "the rain in spain stays mainly in the plain every day again"),
      (4L, "completely unrelated words about query engines and columnar io")
    ).toDF("id", "text")
    val pairs = Dedup.minhashPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)), pairs.mkString(","))
  }

  test("identical docs are always found (LSH recall = 1 at jaccard 1)") {
    val corpus = Seq((10L, base), (20L, base)).toDF("id", "text")
    val pairs = Dedup.minhashPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((10L, 20L)))
  }

  test("hyperplane matrix is deterministic and ±1-valued") {
    val h = Dedup.hyperplanes
    assert(h.length == 16 && h.forall(_.length == 64))
    assert(h.flatten.forall(v => v == 1.0 || v == -1.0))
    // spot-stability: regenerating gives the same values (lazy val, but
    // the generator itself is md5-pure — same seed strings, same signs)
    assert(h(0).take(8).sameElements(Dedup.hyperplanes(0).take(8)))
  }
}
