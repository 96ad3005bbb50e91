package graft.embed

import graft.core.Schema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text → vector embedding backend.
  *
  * The reference delegates this to the hosted Cohere `/embed` API with
  * batches of ≤96 texts (/root/reference/db/cohere.go:10,20-33) and a
  * declared-but-unenforced 512-char cap (db/cohere.go:11). This trait keeps
  * that contract pluggable; the default implementation is fully offline and
  * deterministic so tests and oracles are reproducible (SURVEY.md §7.2-3).
  *
  * `embed` is a Column→Column transform running on executors — the moral
  * equivalent of the reference's batched external UDF, minus the network.
  * `embedOne` is the driver-side single-string path used for query
  * embedding (db/db.go:131-134) and MUST be bit-equal to `embed` on the
  * same input.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Stable identifier persisted in the collection meta sidecar. */
  def id: String
  def embed(text: Column): Column
  def embedOne(text: String): Array[Float]

  /** Whole-DataFrame embedding — the INSERT-path entry point. The default
    * is the per-row column transform; embedders that talk to a remote
    * service override this with a mapPartitions batcher
    * ([[BatchedEmbedder]]) so request count scales with batches, not
    * rows. Must append `outCol` (ARRAY<FLOAT> dim) leaving all other
    * columns and row order untouched. */
  def embedDF(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, embed(col(textCol)))
}

/** Feature-hashing embedder ("hashing trick"): lowercase alnum tokens →
  * md5-derived bucket + sign → signed counts → L2-normalize → float32.
  *
  * md5 (not murmur/hashCode) so the embedding is reproducible in ANY
  * engine, including the DuckDB oracle. Enforces the 512-char truncation
  * the reference declares but forgets (db/cohere.go:11) — an intentional,
  * documented divergence (SURVEY.md §5.4).
  *
  * `embed` wraps [[embedOne]] as a Scala UDF: ONE code path guarantees
  * the column↔driver bit-equality contract, and the per-token MessageDigest
  * loop is ~100× cheaper than the equivalent dim-wide Catalyst expression
  * tree (which blows past codegen limits and falls back to interpretation).
  * A UDF is the right tool here: embedding is an ingestion-side transform
  * (the reference's is an external HTTP call, db/cohere.go:20-33), never a
  * pushdown-bearing predicate.
  */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {
  require(dim > 0)
  val id = s"hashing-md5-v1-d$dim"

  def embed(text: Column): Column = {
    val f = udf((t: String) => if (t == null) null else embedOne(t))
    f(text)
  }

  def embedOne(text: String): Array[Float] = {
    // Mirror Spark's substring/lower EXACTLY: code-point truncation (not
    // UTF-16 units) and locale-independent lowercasing — otherwise stored
    // vs query embeddings diverge on non-ASCII input and break the
    // MUST-be-bit-equal contract above.
    val cpEnd =
      if (text.codePointCount(0, text.length) <= Schema.EmbedTextMaxLen)
        text.length
      else text.offsetByCodePoints(0, Schema.EmbedTextMaxLen)
    val truncated = text.substring(0, cpEnd)
    val toks = HashingEmbedder.TokenRe
      .findAllIn(truncated.toLowerCase(java.util.Locale.ROOT)).toSeq
    val raw = new Array[Long](dim)
    toks.foreach { t =>
      val i = java.lang.Math.floorMod(md5Hash60(s"idx:$t"), dim.toLong).toInt
      val s = if ((md5Hash60(s"sgn:$t") & 1L) == 1L) 1L else -1L
      raw(i) += s
    }
    // identical reduction order to the column version: index order
    var sq = 0.0
    raw.foreach(v => sq += v.toDouble * v.toDouble)
    val nrm = math.sqrt(sq)
    if (nrm > 0) raw.map(v => (v.toDouble / nrm).toFloat)
    else new Array[Float](dim)
  }

  /** First 15 hex chars of md5 as a non-negative long — the same value
    * as [[TextFunctions.md5Hash60]], via the shared native routine
    * (thread-local digest, no hex-string round trip). */
  private def md5Hash60(s: String): Long =
    graft.expr.TextHash.hash60(s.getBytes("UTF-8"))
}

object HashingEmbedder {
  /** Compiled once — embedOne runs per row on the ingest path. */
  private[embed] val TokenRe = "[a-z0-9]+".r
}
