package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-k as a typed `Aggregator` (the UDAF surface):
  * each partition reduces into a BOUNDED k-element buffer, buffers merge
  * associatively, and only k rows per group per partition ever reach the
  * shuffle — the same map-side-combine economics as WindowGroupLimit,
  * expressed as a reusable aggregate instead of a window rewrite.
  *
  * Input: (score, id). Output: ids ordered by (score DESC, id ASC) —
  * ties fully deterministic.
  */
final class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def insert(b: Seq[(Double, Long)],
      e: (Double, Long)): Seq[(Double, Long)] = {
    // O(1) fast path: a full buffer is kept sorted, so a row that does
    // not beat the current worst never pays the re-sort (the common case
    // once the buffer warms up — reduce is per input row)
    if (b.length >= k) {
      val (ws, wid) = b.last
      if (e._1 < ws || (e._1 == ws && e._2 > wid)) return b
    }
    ((e +: b).sortBy { case (s, id) => (-s, id) }).take(k)
  }

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(b: Seq[(Double, Long)],
      a: (Double, Long)): Seq[(Double, Long)] = insert(b, a)
  override def merge(x: Seq[(Double, Long)],
      y: Seq[(Double, Long)]): Seq[(Double, Long)] = y.foldLeft(x)(insert)
  override def finish(b: Seq[(Double, Long)]): Seq[Long] = b.map(_._2)
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
