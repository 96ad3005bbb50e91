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

object Meta {
  private val mapper = new ObjectMapper()
  val FileName = "_meta.json"

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def write(spark: SparkSession, dir: String, m: CollectionMeta): Unit = {
    val node = mapper.createObjectNode()
    node.put("name", m.name)
    node.put("lastId", m.lastId)
    node.put("dim", m.dim)
    node.put("embedderId", m.embedderId)
    node.put("rows", m.rows)
    val p = new Path(dir, FileName)
    val out = fs(spark, p).create(p, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
  }

  def read(spark: SparkSession, dir: String): Option[CollectionMeta] = {
    val p = new Path(dir, FileName)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
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
      Some(CollectionMeta(
        node.get("name").asText(),
        node.get("lastId").asLong(),
        node.get("dim").asInt(),
        node.get("embedderId").asText(),
        node.get("rows").asLong()))
    }
  }

  def drop(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir, FileName)
    val f = fs(spark, p)
    if (f.exists(p)) f.delete(p, false)
  }
}
