package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the standard 4×
  * storage/bandwidth reduction for vector corpora at 100 TB scale:
  * store `(scale, int8[dim])` per vector, dequantize on read, search on
  * the reconstruction. Recall loss at 64-dim/int8 is negligible for
  * near-neighbor work; the exact float column stays the ground truth.
  *
  * Determinism contract (oracle-replicable): symmetric per-vector
  * scaling by max|v|, quantized value = floor(v·127/scale + 0.5) —
  * explicit floor-plus-half, NOT engine-dependent rounding; all math in
  * IEEE doubles; zero vectors quantize to all-zero with scale 0.
  *
  * The registered query is a full round trip: quantize → write parquet
  * (tinyint lists) → read back → dequantize → cosine top-k — so the
  * compressed sink AND source sit under the oracle gate, which
  * recomputes the identical quantize/dequantize pipeline in SQL.
  */
object Quantize {

  /** Per-vector scale: max absolute component (double). */
  def scaleOf(emb: Column): Column =
    array_max(transform(emb, v => abs(v.cast("double"))))

  /** int8 quantization: floor(v*127/scale + 0.5), clamped to [-127,127];
    * all-zero when scale is 0. */
  def quantizeI8(emb: Column, scale: Column): Column =
    when(scale > 0,
      transform(emb, v =>
        greatest(lit(-127L), least(lit(127L),
          floor(v.cast("double") * 127.0 / scale + 0.5)))
          .cast("byte")))
      .otherwise(transform(emb, _ => lit(0).cast("byte")))

  /** Reconstruction: q*scale/127 as double. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale / 127.0)

  private def scratch(dir: String): String =
    graft.core.Scratch.dir("quant", dir)

  /** Round trip + search: top-10 by cosine on the DEQUANTIZED vectors
    * against query vector 5 (itself excluded). */
  def quantizeTopk(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val out = scratch(dir)
    // two-step projection so the interpreted HOF scale pass (abs
    // transform + array_max over the 64-wide array) runs ONCE per row,
    // not once for the scale column and again inside quantizeI8
    e.select(col("vec_id"), col("label"), col("embedding"),
        scaleOf(col("embedding")).as("scale"))
      .select(col("vec_id"), col("label"), col("scale"),
        quantizeI8(col("embedding"), col("scale")).as("q"))
      .write.mode("overwrite").parquet(out)
    val stored = s.read.parquet(out)
      .withColumn("deq", dequantize(col("q"), col("scale")))
    val qv = stored.filter(col("vec_id") === 5)
      .select(col("deq").as("qv"))
    stored.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= 5)
      .withColumn("sim", cosineSim(col("deq"), col("qv")))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
      .select("vec_id", "label")
  }

  private val Dim = 64

  val oracle: Map[String, String] = Map(
    "quantize_topk" -> {
      def deq(e: String): String =
        s"""[CASE WHEN sc_$e > 0 THEN
           |  greatest(-127, least(127,
           |    floor($e[i]::DOUBLE * 127.0 / sc_$e + 0.5)))
           |    * sc_$e / 127.0
           | ELSE 0.0 END for i in generate_series(1, $Dim)]""".stripMargin
      def dot(a: String, b: String): String =
        s"list_sum([$a[i] * $b[i] for i in generate_series(1, $Dim)])"
      s"""WITH sc AS (
         |  SELECT vec_id, label, embedding,
         |    list_max([abs(embedding[i]::DOUBLE)
         |      for i in generate_series(1, $Dim)]) AS sc_embedding
         |  FROM embeddings),
         |d AS (
         |  SELECT vec_id, label, ${deq("embedding")} AS deq FROM sc),
         |q AS (SELECT deq AS qv FROM d WHERE vec_id = 5)
         |SELECT vec_id, label FROM d, q WHERE vec_id <> 5
         |ORDER BY ${dot("deq", "qv")} /
         |  nullif(sqrt(${dot("deq", "deq")}) * sqrt(${dot("qv", "qv")}), 0)
         |  DESC,
         |  vec_id ASC
         |LIMIT 10""".stripMargin
    }
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quantize_topk" -> (quantizeTopk _)
  )
}
