package graft.core

import org.apache.spark.sql.types._

/** Canonical collection schema for the kaer-parity engine.
  *
  * Mirrors the reference's reserved document fields
  * (/root/reference/db/db.go:17-21): every inserted document is the user's
  * metadata plus three internal fields. We fix the internal fields as typed
  * columns and keep the schemaless user metadata as a JSON string column
  * (SURVEY.md §1.2).
  */
object Schema {
  /** Reference `InternalDocName` (db/db.go:18). */
  val DocCol = "_m_doc"
  /** Reference `InternalIdName` (db/db.go:19); uint32 there, LONG here
    * (the reference itself reads it back as int64, db/db.go:126). */
  val IdCol = "_m_id"
  /** Reference `InternalEmbeddingName` (db/db.go:20). */
  val EmbeddingCol = "_m_embedding"
  /** Schemaless user metadata (bson.M in the reference) as JSON text. */
  val MetaCol = "_m_meta"
  /** Distance column emitted by Query — a strict superset of the reference,
    * which drops distances on output (db/db.go:139-142). */
  val DistanceCol = "_distance"

  def collectionSchema(dim: Int): StructType = StructType(Seq(
    StructField(IdCol, LongType, nullable = false),
    StructField(DocCol, StringType, nullable = true),
    StructField(EmbeddingCol, ArrayType(FloatType, containsNull = false),
      nullable = true),
    StructField(MetaCol, StringType, nullable = true)
  ))

  /** Reference checkpoint cadence `MetaPersistBatch` (db/db.go:21). */
  val MetaPersistBatch = 1000
  /** Reference embed batch ceiling `CohereMaxTexts` (db/cohere.go:10). */
  val EmbedMaxBatch = 96
  /** Reference declared-but-unenforced text cap (db/cohere.go:11). We
    * enforce it deliberately at the embedder (SURVEY.md §5 item 4). */
  val EmbedTextMaxLen = 512
}
