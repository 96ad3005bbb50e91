package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance/similarity functions built from codegen'd higher-order
  * functions (no UDF serialization, stays inside WholeStageCodegen).
  *
  * All arithmetic is double-precision with a fixed left-to-right fold order
  * so results are bit-stable across engines: the per-element ops are exact
  * IEEE-754 and `aggregate` folds in array order.
  *
  * The reference's distance metric is L2/Euclidean — go-hnsw is an L2-space
  * index (/root/reference/db/hnsw.go:4, go.mod:11). Cosine/dot are
  * extensions for the similarity-search operators.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Squared L2 distance; fold order = array order. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) distance — the reference's metric. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Dot product; fold order = array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => d(x) * d(x)), lit(0.0),
      (acc, v) => acc + v))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors via nullif. */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDist(a: Column, b: Column): Column = lit(1.0) - cosineSim(a, b)
}
