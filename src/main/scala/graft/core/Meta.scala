package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets

/** Per-collection checkpoint/catalog record.
  *
  * Replaces the reference's meta collection {collection, hnswFile, hnswId,
  * hnswSize} (/root/reference/db/meta.go:11-16) — whose bson tags are
  * malformed and fields unexported, so it silently persists empty documents
  * (SURVEY.md §5.4). This sidecar round-trips by construction and is the
  * id-watermark source for recovery (intent of db/db.go:209-226, fixing the
  * min-vs-max bug at db/db.go:145-174).
  */
final case class CollectionMeta(
    name: String,
    lastId: Long,
    dim: Int,
    embedderId: String,
    rows: Long)

/** Index-coverage sidecar for a persisted IVF index: the id watermark and
  * row count the index covers, plus its nlist. The incremental-maintenance
  * analogue of the reference's hnswId/hnswSize bookkeeping
  * (/root/reference/db/meta.go:11-16, db/db.go:191-207): on reopen-or-
  * insert the engine appends only ids past `indexedLastId` instead of
  * rebuilding — the reference replays the tail into its HNSW the same way.
  */
/** Persisted-index coverage sidecar. `indexedRows` counts rows IN THE
  * LISTS (including tombstoned ones — the storage trust check compares
  * against physical list rows); live coverage is
  * `indexedRows - tombstones`. `tombstones` (r13) counts deleted ids
  * recorded in the index's tombstone sidecar table — delete-heavy
  * maintenance stays O(delta) instead of forcing a rebuild. */
/** Index-coverage sidecar. `stale` is the in-place-rewrite poison pill
  * (r15): replaceOne swaps document text + embedding UNDER an unchanged
  * id/watermark/rowcount, so every arithmetic coverage check still
  * passes while the postings/list entries describe the OLD content —
  * the ensure ladders must treat a stale sidecar as "rebuild required"
  * no matter what the counters say. Absent in pre-r15 sidecars ⇒ false
  * (those stores had no in-place rewrite yet). */
final case class IndexMeta(indexedLastId: Long, indexedRows: Long,
    nlist: Int, tombstones: Long = 0L, stale: Boolean = false)

object Meta {
  private val mapper = new ObjectMapper()
  val FileName = "_meta.json"
  val IndexFileName = "_index_meta.json"

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def write(spark: SparkSession, dir: String, m: CollectionMeta): Unit = {
    val node = mapper.createObjectNode()
    node.put("name", m.name)
    node.put("lastId", m.lastId)
    node.put("dim", m.dim)
    node.put("embedderId", m.embedderId)
    node.put("rows", m.rows)
    writeAtomic(spark, dir, FileName, mapper.writeValueAsBytes(node))
  }

  /** write-temp + rename, NOT truncate-in-place: a crash between
    * create() and close() would leave an empty/partial sidecar, and the
    * sidecar is the recovery anchor this module exists to protect. */
  private def writeAtomic(spark: SparkSession, dir: String, name: String,
      bytes: Array[Byte]): Unit = {
    val p = new Path(dir, name)
    val tmp = new Path(dir, name + ".tmp")
    val f = fs(spark, p)
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"meta rename failed: $tmp -> $p")
  }

  def writeIndex(spark: SparkSession, indexDir: String, m: IndexMeta): Unit = {
    val node = mapper.createObjectNode()
    node.put("indexedLastId", m.indexedLastId)
    node.put("indexedRows", m.indexedRows)
    node.put("nlist", m.nlist)
    node.put("tombstones", m.tombstones)
    node.put("stale", m.stale)
    writeAtomic(spark, indexDir, IndexFileName, mapper.writeValueAsBytes(node))
  }

  /** Same corrupt-reads-as-absent contract as [[read]]: an unreadable
    * index sidecar means "coverage unknown" and the caller falls back to
    * the trust-check-then-rebuild path — never throws. */
  def readIndex(spark: SparkSession, indexDir: String): Option[IndexMeta] = {
    val p = new Path(indexDir, IndexFileName)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else try {
      val in = f.open(p)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          var n = in.read(tmp)
          while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          buf.toByteArray
        } finally in.close()
      val node = mapper.readTree(new String(bytes, StandardCharsets.UTF_8))
      if (node == null || !node.isObject || node.get("indexedLastId") == null)
        None
      else Some(IndexMeta(
        node.get("indexedLastId").asLong(),
        node.get("indexedRows").asLong(),
        node.get("nlist").asInt(),
        Option(node.get("tombstones")).map(_.asLong()).getOrElse(0L),
        Option(node.get("stale")).exists(_.asBoolean())))
    } catch {
      case _: org.apache.hadoop.fs.ChecksumException |
          _: java.io.EOFException => None
      case _: com.fasterxml.jackson.core.JacksonException => None
    }
  }

  def read(spark: SparkSession, dir: String): Option[CollectionMeta] = {
    val p = new Path(dir, FileName)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val bytes =
        try {
          val in = f.open(p)
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](4096)
            var n = in.read(tmp)
            while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
            buf.toByteArray
          } finally in.close()
        } catch {
          // bytes-level corruption (torn write): checksum mismatch or
          // truncation — same treatment as unparseable JSON below
          case _: org.apache.hadoop.fs.ChecksumException |
              _: java.io.EOFException => return None
        }
      // a corrupt/truncated sidecar must read as ABSENT, not throw:
      // the data directory is intact and the open-time recovery path
      // (max(_m_id) fallback) re-derives the watermark — throwing here
      // would brick the collection the recovery exists to heal
      try {
        val node = mapper.readTree(new String(bytes, StandardCharsets.UTF_8))
        if (node == null || !node.isObject || node.get("name") == null) None
        else Some(CollectionMeta(
          node.get("name").asText(),
          node.get("lastId").asLong(),
          node.get("dim").asInt(),
          node.get("embedderId").asText(),
          node.get("rows").asLong()))
      } catch {
        case _: com.fasterxml.jackson.core.JacksonException => None
      }
    }
  }

  def drop(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir, FileName)
    val f = fs(spark, p)
    if (f.exists(p)) f.delete(p, false)
  }
}
