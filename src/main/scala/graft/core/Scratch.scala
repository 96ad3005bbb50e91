package graft.core

/** Scratch-location keying for operators that persist derived state
  * (collections, indexes, format round trips, bucketed tables).
  *
  * Keys are the 60-bit md5-derived [[graft.expr.TextHash.hash60]] of the
  * FULL input string — not `String.hashCode`, whose 32 bits make silent
  * collisions (two sf dirs sharing one scratch dir, or one bucketed
  * table serving two scale factors) merely unlikely instead of
  * impossible-in-practice. */
object Scratch {

  /** Stable hex key for `input` (15 hex chars). */
  def key(input: String): String =
    java.lang.Long.toHexString(
      graft.expr.TextHash.hash60(input.getBytes("UTF-8")))

  /** Stable per-input scratch directory under java.io.tmpdir. */
  def dir(prefix: String, input: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-$prefix-${key(input)}"

  /** Fingerprint of a data path's file listing — every file's (path,
    * length, mtime) hashed to one key — for scratch state derived FROM
    * that data: keying on the fingerprint (not just the path string)
    * means a regenerated corpus can never serve stale derived state,
    * even within one long-lived application. One driver-side
    * listStatus; no data pages read. */
  def fingerprint(s: org.apache.spark.sql.SparkSession,
      path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    key(fs.listStatus(p).sortBy(_.getPath.toString)
      .map(st => s"${st.getPath}:${st.getLen}:${st.getModificationTime}")
      .mkString("|"))
  }
}
