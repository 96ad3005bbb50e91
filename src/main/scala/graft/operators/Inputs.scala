package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input re-splitting for compute-heavy map operators.
  *
  * A parquet file is splittable only at row-group boundaries; a
  * single-row-group file (or a gzip json dump — the same problem arrives
  * constantly in real ingest) scans as ONE task no matter how many cores
  * the cluster has. When the downstream per-row work is hashing or
  * embedding (µs/row), the right call is to pay one narrow shuffle of the
  * raw rows to unlock full parallelism: shuffle cost is bytes-bounded and
  * tiny next to the map work it distributes. Operators whose downstream
  * work is a cheap predicate or projection should NOT use this — for them
  * the shuffle is pure overhead and scan parallelism is already adequate
  * on well-formed storage.
  */
object Inputs {
  def resplit(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)
}
