package graft.core

import org.apache.spark.sql.SparkSession

/** The ONE reuse trust contract for persisted derived state (IVF index
  * lists/centroids, Z-ordered copies, collection indexes, bucketed
  * tables): a leftover parquet directory is trusted only when the
  * committer's _SUCCESS marker is present AND its row count equals the
  * expected count. Centralized so the contract cannot silently diverge
  * between reuse sites (it was copy-pasted in three before this). */
object Trust {

  /** `dir` has a _SUCCESS marker and exactly `expected` rows. The count
    * is metadata-only on parquet (row-group footers, no data pages). */
  def parquetDir(s: SparkSession, dir: String, expected: => Long): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.exists(p) && s.read.parquet(dir).count() == expected
  }
}
