package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate
  .TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a NATIVE Catalyst
  * aggregate — the `TypedImperativeAggregate` leg of the extension
  * architecture (the API production sketch libraries ride): a bounded
  * mutable buffer per group, partial-aggregated map-side, MERGED across
  * partitions, serialized between stages.
  *
  * Input is an already-hashed LONG column (compose with `graft_hash60`
  * — hashing stays a codegen'd scalar expression; the aggregate only
  * maintains the k smallest DISTINCT values, O(k) state per group).
  * Estimate: exact size below k; else `round((k−1)·2^60 / kth)` — the
  * SAME estimator as the window-rank formulation (sketch_distinct), so
  * both share one oracle: aggregate-expression form and DataFrame form
  * provably agree.
  */
case class KmvDistinctAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "graft_kmv: k must be >= 2")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(b: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      b.add(v.asInstanceOf[Long])
      if (b.size > k) b.pollLast()
    }
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
      o: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    b.addAll(o)
    while (b.size > k) b.pollLast()
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any =
    if (b.size < k) b.size.toLong
    else {
      // invariant: k >= 2 DISTINCT non-negative hashes ⇒ the largest
      // retained value is > 0 (only one value can be zero) — guard the
      // division anyway so a contract break fails loudly, not as
      // round(Infinity)
      require(b.last() > 0L,
        s"graft_kmv: non-positive kth value ${b.last()} with k=$k")
      math.round((k - 1).toDouble * (1L << 60).toDouble /
        b.last().doubleValue())
    }

  override def serialize(b: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.forEach(v => out.writeLong(v))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { b.add(in.readLong()); i += 1 }
    b
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression)
      : KmvDistinctAgg = copy(child = c)
}
