package graft.embed

import graft.core.Schema
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** One remote embed request — the pluggable seam where a real deployment
  * puts its HTTP client. The reference's equivalent is the Cohere client
  * (/root/reference/db/cohere.go:20-33): POST a batch of texts, get one
  * vector per text back, in order. Implementations must be deterministic
  * per input for the stored-vs-query bit-equality contract to hold, and
  * must be Serializable (they run inside executor tasks).
  */
trait EmbedTransport extends Serializable {
  /** Model name, part of the persisted embedder id (the reference pins
    * "embed-multilingual-v2.0", cohere.go:27). */
  def model: String
  def dim: Int
  /** Embed one batch. Callers guarantee `texts` is non-empty, contains no
    * nulls, every text is pre-truncated, and `texts.size` ≤ the
    * embedder's batch cap. Returns exactly one dim-length vector per
    * input, in input order. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Remote-style embedder honoring the reference's batching contract: at
  * most [[Schema.EmbedMaxBatch]] (96) texts per transport request
  * (/root/reference/db/cohere.go:10, `CohereMaxTexts`) and truncation to
  * [[Schema.EmbedTextMaxLen]] (512) code points — the cap the reference
  * declares but forgets to enforce (cohere.go:11; SURVEY.md §5.4).
  *
  * The batch win lives in [[embedDF]]: a mapPartitions pass that groups
  * each partition's rows into ≤`maxTexts` chunks and issues ONE transport
  * call per chunk — request count scales with ⌈rows/96⌉ per partition,
  * never with rows, and partitions batch independently in parallel
  * (exactly how a 1000-executor ingest would drive a hosted API, with
  * Spark's task parallelism as the client-side concurrency knob). Null
  * documents never reach the transport and embed to null.
  *
  * `embedOne` (query side) and the batched path share [[truncate]] and
  * the transport, so stored and query vectors are bit-equal by
  * construction.
  */
final case class BatchedEmbedder(
    transport: EmbedTransport,
    maxTexts: Int = Schema.EmbedMaxBatch,
    maxLen: Int = Schema.EmbedTextMaxLen) extends Embedder {
  require(maxTexts > 0, "maxTexts must be positive")

  def dim: Int = transport.dim
  val id = s"batched-${transport.model}-d${transport.dim}"

  /** Code-point truncation (not UTF-16 units) — same semantics as
    * HashingEmbedder's, so caps compose identically across embedders. */
  private def truncate(t: String): String = {
    val cpEnd =
      if (t.codePointCount(0, t.length) <= maxLen) t.length
      else t.offsetByCodePoints(0, maxLen)
    t.substring(0, cpEnd)
  }

  def embedOne(text: String): Array[Float] = {
    val out = transport.embedBatch(Seq(truncate(text)))
    require(out.length == 1 && out.head.length == dim,
      s"transport returned ${out.length} vectors for 1 text")
    out.head
  }

  /** Per-row column path — exists for trait completeness (one text per
    * request). Ingest goes through [[embedDF]]; query-side embedding is
    * driver-side [[embedOne]]. */
  def embed(text: Column): Column = {
    val self = this
    val f = udf((s: String) => if (s == null) null else self.embedOne(s))
    f(text)
  }

  override def embedDF(df: DataFrame, textCol: String, outCol: String)
      : DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false),
        nullable = true))
    val ti = df.schema.fieldIndex(textCol)
    val self = this
    val t = transport
    val d = dim
    val rdd = df.rdd.mapPartitions { it =>
      // grouped() materializes one ≤maxTexts chunk at a time — memory is
      // O(batch), never O(partition)
      it.grouped(self.maxTexts).flatMap { chunk =>
        val present = chunk.zipWithIndex
          .filter { case (r, _) => !r.isNullAt(ti) }
        val vecs =
          if (present.isEmpty) Seq.empty[Array[Float]]
          else t.embedBatch(present.map { case (r, _) =>
            self.truncate(r.getString(ti))
          })
        require(vecs.length == present.length &&
            vecs.forall(_.length == d),
          s"transport returned ${vecs.length} vectors for " +
            s"${present.length} texts")
        val byIdx = present.map(_._2).zip(vecs).toMap
        chunk.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ byIdx.get(i).map(_.toSeq).orNull)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
