package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-dimension
  * file skipping.
  *
  * A table range-sorted on one key prunes files only for predicates on
  * that key; a box query on a second dimension reads every file. Writing
  * files in Z-order of (a, b) bounds BOTH dimensions' min/max span per
  * file, so parquet footer stats prune files (and row groups) for
  * predicates on either dimension — the standard lakehouse layout cure
  * (Delta/Iceberg OPTIMIZE ZORDER). At 100 TB this is the difference
  * between a box query scanning ~everything and scanning the few files
  * whose Z-range intersects the box.
  *
  * The interleave is a pure Column expression (32 constant-folded
  * shift/mask terms — whole-stage codegen, no UDF), so the sort key
  * computation runs at scan speed and any engine can replicate it.
  */
object Layout {

  /** Morton interleave of the low 16 bits of two non-negative columns:
    * bit j of `a` lands at position 2j, bit j of `b` at 2j+1. Inputs are
    * clamped to [0, 2^16) — callers bucket/normalize dimensions first. */
  def zorder16(a: Column, b: Column): Column = {
    val mask = lit((1L << 16) - 1)
    val aa = a.cast("long").bitwiseAND(mask)
    val bb = b.cast("long").bitwiseAND(mask)
    (0 until 16).flatMap { j =>
      Seq(
        shiftleft(shiftright(aa, j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(bb, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ + _)
  }

  /** Rewrite `df` into `files` parquet files clustered by the Z-value of
    * (a, b): range-partition on Z (equal-size files via range exchange),
    * sort within each partition, drop the helper column before the
    * write. Content is unchanged — only file boundaries move. */
  def zorderWrite(df: DataFrame, out: String, a: Column, b: Column,
      files: Int): Unit =
    df.withColumn("_z", zorder16(a, b))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(out)

  // ---- registered gate query -----------------------------------------

  private def scratchFor(dir: String): String =
    graft.core.Scratch.dir("zorder", dir)

  /** The events projection that gets Z-ordered: (event_id, user_id, ts)
    * plus the hour index used as the second Z dimension. The absolute
    * epoch-hour is masked to 16 bits inside zorder16 — the 30-day event
    * window spans ~720 consecutive hours, far from a 2^16 wrap. */
  private def eventsProj(s: SparkSession, dir: String): DataFrame =
    Relational.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        expr(s"unix_micros(ts) DIV ${3600L * 1000000L}").as("h"))

  /** Build the Z-ordered copy unless a trusted one exists (same contract
    * as the other persisted-layout reuses: _SUCCESS + row count). */
  private def ensureZordered(s: SparkSession, dir: String): String = {
    val out = scratchFor(dir)
    val e = eventsProj(s, dir)
    if (!graft.core.Trust.parquetDir(s, out, e.count()))
      zorderWrite(e, out, col("user_id"), col("h"), 16)
    out
  }

  /** Two-dimension box query over the Z-ordered copy. The answer must
    * equal the same box on the raw table — layout moves bytes, not rows
    * (that is the oracle check); LayoutSpec asserts the actual
    * file-skipping property (bounded per-file min/max span on BOTH
    * dimensions, which parquet footer pruning exploits). */
  def zorderScan(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureZordered(s, dir))
      .filter(col("user_id").between(40, 80) &&
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-13 00:00:00").cast("timestamp"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        min("event_id").as("first_id"), max("event_id").as("last_id"))
      .orderBy("user_id")

  /** Hive-style partitioned layout — the OTHER file-skipping mechanism
    * (zorder prunes by footer stats; partitionBy prunes by DIRECTORY):
    * documents written `partitionBy(lang)`, so a predicate on lang
    * never opens — never even LISTS — the other partitions' files.
    * At 100 TB partition columns are the first-order layout decision
    * (date/source/lang), with stats-based skipping layered inside each
    * partition. LayoutSpec asserts the plan carries the predicate as
    * PartitionFilters (pruned before the scan), not a data filter. */
  private def ensurePartitioned(s: SparkSession, dir: String): String = {
    val out = graft.core.Scratch.dir("partlang", dir)
    val d = s.read.parquet(s"$dir/documents.parquet")
    if (!graft.core.Trust.parquetDir(s, out, d.count()))
      d.write.mode("overwrite").partitionBy("lang").parquet(out)
    out
  }

  /** Per-(lang, source) census over two of the five lang partitions.
    * The answer must equal the same rollup on the raw table — layout
    * moves bytes, not rows. */
  def partitionedScan(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensurePartitioned(s, dir))
      .filter(col("lang").isin("en", "fr"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy("lang", "source")

  /** Dynamic partition pruning — the RUNTIME half of the layout story:
    * the fact side is partitioned by lang, but the predicate lives on a
    * DIMENSION attribute (`tier = 'keep'`), so static pruning can't
    * fire; Catalyst plants a `dynamicpruningexpression` on the fact
    * scan's PartitionFilters and prunes directories with the dim's
    * runtime row set (the broadcast reused as the pruning subquery).
    * At 100 TB with date/lang-partitioned facts this is THE mechanism
    * that keeps star-schema joins from scanning every partition —
    * PlanSpec locks the dynamicpruning marker on the scan. */
  def dppJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val part = s.read.parquet(ensurePartitioned(s, dir))
    // a REAL dim table (file-based): DPP's selective-predicate heuristic
    // needs a Filter over a scan — a literal LocalRelation folds the
    // filter away and no pruning subquery is planted
    // the scratch key includes the fixture CONTENT: if the lang/tier
    // mapping ever changes, the path changes with it — a stale 5-row
    // dir with the old mapping can't be silently reused
    val dimRows = Seq(("en", "keep"), ("fr", "keep"), ("de", "drop"),
      ("es", "drop"), ("zh", "drop"))
    val dimPath = graft.core.Scratch.dir("langdim",
      s"$dir#${dimRows.map { case (l, t) => s"$l=$t" }.mkString(",")}")
    if (!graft.core.Trust.parquetDir(s, dimPath, 5L))
      dimRows.toDF("lang", "tier")
        .repartition(1).write.mode("overwrite").parquet(dimPath)
    val dim = s.read.parquet(dimPath)
    part.join(dim.filter(col("tier") === "keep"), Seq("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), max(col("n_chars")).as("max_chars"))
      .orderBy("lang")
  }

  /** Dynamic partition OVERWRITE — the backfill primitive: rewriting
    * one partition's data must replace ONLY the partitions present in
    * the incoming batch (static overwrite mode would truncate the whole
    * table — the classic lakehouse footgun). The gate seeds the full
    * lang-partitioned table, then overwrites just the `en` batch with
    * revised rows; the readback proves `en` changed and every other
    * partition survived — which IS the oracle's arithmetic. Rebuilt
    * from scratch each run (the seed write is part of the op under
    * test); conf is restored afterwards. */
  def insertOverwrite(s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.dir("dynover", dir)
    // start from an EMPTY table: the seed write below also runs under
    // dynamic overwrite, which only replaces partitions present in the
    // seed batch — a stale partition from a prior run whose lang no
    // longer exists in the current testdata vintage would otherwise
    // survive both writes and diverge from the oracle
    locally {
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "dynamic")
    try {
      d.write.mode("overwrite").partitionBy("lang").parquet(out)
      d.filter(col("lang") === "en")
        .withColumn("n_chars", col("n_chars") + lit(1000L))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
    } finally {
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
    s.read.parquet(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy("lang")
  }

  /** Small-file COMPACTION as a generic table-maintenance op (the
    * kaer collection compactor's standalone form): a 64-file seed
    * write (the drip-ingest reality a streaming sink leaves behind) is
    * rewritten to 4 id-ranged files via repartitionByRange + a rename
    * swap; the gate reports files before/after and proves the rows
    * survived bit-for-bit through the corpus-level census. File counts
    * are deterministic BY CONSTRUCTION (explicit repartition numbers),
    * so even they sit under the oracle. At 100 TB compaction is the
    * difference between a scan scheduling millions of 1 MB tasks and
    * thousands of 1 GB ones. */
  def compactionReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = graft.core.Scratch.dir("compact-v1", dir)
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def dataFiles(p: String): Long =
      fs.listStatus(new Path(p)).count(f =>
        f.getPath.getName.endsWith(".parquet"))
    val src = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    // seed: the fragmented table (64 shards), rebuilt fresh per run
    val seedDir = s"$root/seed"
    src.repartition(64).write.mode("overwrite").parquet(seedDir)
    val before = dataFiles(seedDir)
    // compact: read the FRAGMENTED table, range-sort on the id so the
    // output files are id-ranged (footer-prunable), swap via rename
    val tmp = s"$root/compact.tmp"
    val fin = s"$root/compact"
    s.read.parquet(seedDir)
      .repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(fin), true)
    require(fs.rename(new Path(tmp), new Path(fin)),
      s"compaction swap failed for $fin")
    val after = dataFiles(fin)
    s.read.parquet(fin)
      .agg(count(lit(1)).as("rows"),
        sum(col("n_chars")).as("chars_sum"))
      .select(lit(before).as("files_before"),
        lit(after).as("files_after"), col("rows"), col("chars_sum"))
  }

  val oracle: Map[String, String] = Map(
    "compaction_report" ->
      """SELECT CAST(64 AS BIGINT) AS files_before,
        |  CAST(4 AS BIGINT) AS files_after,
        |  count(*) AS rows, CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM documents""".stripMargin,
    "insert_overwrite" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(CASE WHEN lang = 'en' THEN n_chars + 1000
        |           ELSE n_chars END) AS BIGINT) AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dpp_join" ->
      """SELECT lang, count(*) AS n,
        |  max(n_chars) AS max_chars
        |FROM documents WHERE lang IN ('en', 'fr')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "partitioned_scan" ->
      """SELECT lang, source, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang IN ('en', 'fr')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "zorder_scan" ->
      """SELECT user_id, count(*) AS n,
        |  min(event_id) AS first_id, max(event_id) AS last_id
        |FROM events
        |WHERE user_id BETWEEN 40 AND 80
        |  AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_scan" -> (zorderScan _),
    "partitioned_scan" -> (partitionedScan _),
    "dpp_join" -> (dppJoin _),
    "insert_overwrite" -> (insertOverwrite _),
    "compaction_report" -> (compactionReport _)
  )
}
