package graft.filter

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Document-rewrite helpers for the MQL surface — the read-path twin of
  * the write-path `$unset` machinery in `Collection.updateDoc`
  * (graft/api/Kaer.scala): parse the JSON metadata document, drop the
  * named fields (dotted paths descend into sub-documents), re-serialize.
  *
  * A UDF, deliberately: Spark has no native json_remove, and from_json
  * needs a static schema the pipeline doesn't have. This runs once per
  * surviving document in a $project — off the scan/filter hot path,
  * same per-executor static-mapper pattern as updateDoc (no per-row
  * ObjectMapper). */
object JsonRewrite {

  /** Per-executor static mapper (an object field is resolved per-JVM at
    * module load, never serialized with the closure). */
  private val mapper = new ObjectMapper()

  /** `doc` minus `fields` (dotted paths remove inside sub-documents;
    * missing fields / non-object parents are no-ops — Mongo's lenient
    * $unset shape). Nulls and non-object documents pass through. */
  def removeFields(doc: Column, fields: Seq[String]): Column = {
    val paths = fields.map(_.split("\\.").toSeq)
    val f = udf { s: String =>
      if (s == null) null
      else mapper.readTree(s) match {
        case o: ObjectNode =>
          paths.foreach { segs =>
            var cur: ObjectNode = o
            var ok = true
            for (seg <- segs.dropRight(1) if ok) cur.get(seg) match {
              case child: ObjectNode => cur = child
              case _ => ok = false
            }
            if (ok) cur.remove(segs.last)
          }
          mapper.writeValueAsString(o)
        case _ => s
      }
    }
    f(doc)
  }
}
