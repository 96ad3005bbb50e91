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
/** Shared KMV buffer mechanics (k smallest distinct longs in a
  * TreeSet, map-side partials, truncating merge, length-prefixed
  * serialization) — [[KmvDistinctAgg]] evals the ESTIMATE,
  * [[KmvSketchAgg]] evals the retained SET (for downstream sketch
  * algebra: union/intersection estimation without re-scanning). */
abstract class KmvAggBase
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  def k: Int

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

  override def nullable: Boolean = false
}

case class KmvDistinctAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  require(k >= 2, "graft_kmv: k must be >= 2")

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

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression)
      : KmvDistinctAgg = copy(child = c)
}

/** The sketch-valued sibling: evals the retained k-min set as a sorted
  * LONG array, enabling DOWNSTREAM set algebra (theta-sketch style
  * union/intersection estimates as plain array expressions over two
  * k-sized rows) — the corpus is scanned once per side, everything
  * after is O(k). */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  require(k >= 2, "graft_kmv_sketch: k must be >= 2")

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](b.size)
    var i = 0
    val it = b.iterator() // TreeSet: ascending
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_sketch"

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression)
      : KmvSketchAgg = copy(child = c)
}
