package graft.operators

import graft.SparkTestBase

/** MMR diversified-retrieval semantics — the rag_diverse gate is
  * rows-only under the driver (iterative argmax has no SQL twin), so
  * this fixture carries the correctness burden. */
class MmrSpec extends SparkTestBase {

  private val e1 = Array(1.0, 0.0, 0.0, 0.0)
  private val e1b = Array(0.999, 0.01, 0.0, 0.0) // near-duplicate of e1
  private val e2 = Array(0.0, 1.0, 0.0, 0.0)     // orthogonal

  test("diversification demotes the near-duplicate of the first pick") {
    // relevance alone would rank (a, a2, b); MMR picks a, then penalizes
    // a2 (cos≈1 to a): score(a2) = 7*980000 - 3*999936 < score(b) =
    // 7*900000 - 0 ⇒ b comes second
    val cands = Seq(
      (1L, 0, 1000000L, e1),
      (2L, 0, 980000L, e1b),
      (3L, 1, 900000L, e2))
    val picked = Similarity.mmrPick(cands, 3)
    assert(picked.map(_._1) == Seq(1L, 3L, 2L))
  }

  test("pure-relevance order survives when candidates are orthogonal") {
    val cands = Seq(
      (1L, 0, 900000L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, 0, 800000L, Array(0.0, 1.0, 0.0, 0.0)),
      (3L, 1, 700000L, Array(0.0, 0.0, 1.0, 0.0)))
    assert(Similarity.mmrPick(cands, 3).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("ties break to the lowest id and k bounds the output") {
    val cands = Seq(
      (9L, 0, 500000L, Array(1.0, 0.0, 0.0, 0.0)),
      (4L, 0, 500000L, Array(0.0, 1.0, 0.0, 0.0)),
      (7L, 0, 500000L, Array(0.0, 0.0, 1.0, 0.0)))
    val picked = Similarity.mmrPick(cands, 2)
    assert(picked.length == 2 && picked.head._1 == 4L)
  }

  test("gate runs end-to-end, deterministic across invocations") {
    val a = Similarity.ragDiverse(spark, sf0001).collect().toSeq
    val b = Similarity.ragDiverse(spark, sf0001).collect().toSeq
    assert(a == b && a.length == 10)
  }
}
