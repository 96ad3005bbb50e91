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

  /** The row-level rewrite `doc minus paths` (dotted paths remove inside
    * sub-documents; missing fields / non-object parents are no-ops —
    * Mongo's lenient $unset shape). Nulls / non-object docs pass through. */
  private def rewrite(paths: Seq[Seq[String]]): String => String = { s =>
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

  private def paths(fields: Seq[String]): Seq[Seq[String]] =
    fields.map(_.split("\\.").toSeq)

  /** `doc` minus `fields`, as an ordinary (deterministic) expression —
    * fine when the result is consumed once. */
  def removeFields(doc: Column, fields: Seq[String]): Column = {
    val f = udf(rewrite(paths(fields)))
    f(doc)
  }

  /** [[removeFields]] pinned to ONE evaluation per row: the rewrite is
    * pure, but Catalyst's CollapseProject / PushDownPredicates inline a
    * deterministic alias into every consumer — re-running the JSON
    * parse+rewrite once per consuming leaf. The non-deterministic marker
    * is an optimizer fence for the materialized-root column
    * (MqlPipeline's $project exclusion), not a semantic claim. */
  def removeFieldsOnce(doc: Column, fields: Seq[String]): Column = {
    val f = udf(rewrite(paths(fields))).asNondeterministic()
    f(doc)
  }
}
