package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned reads over the keyed parquet store — the
  * time-travel primitive (the lakehouse table-format idea in its
  * minimal, dependency-free form): every write materializes an
  * IMMUTABLE version directory `v=<n>` under the table root plus a
  * manifest naming the latest version, and a reader addresses either
  * "as of version n" or "latest". Old versions stay readable — the
  * reproducibility device a training pipeline needs ("which corpus
  * snapshot did this run train on?").
  *
  * Scale: a snapshot read is a plain parquet scan of ONE version dir —
  * no log replay, no merge-on-read; the upsert that produces version
  * n+1 is [[Upsert.upsert]]'s one full-outer shuffle join. The manifest
  * is a tiny JSON written tmp+rename (the Meta.Write atomicity device),
  * so a crashed writer can never publish a half-written version.
  */
object Snapshots {

  private def fs(s: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String) =
    new org.apache.hadoop.fs.Path(root, "_manifest.json")

  /** Write `df` as immutable version `v`; publish it in the manifest
    * (tmp+rename — readers see the old manifest or the new, never a
    * torn one). */
  def writeSnapshot(df: DataFrame, root: String, v: Int): Unit = {
    val s = df.sparkSession
    df.write.mode("overwrite").parquet(s"$root/v=$v")
    val f = fs(s, root)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_manifest.tmp.$v")
    val o = f.create(tmp, true)
    o.write(s"""{"latest": $v}""".getBytes("UTF-8")); o.close()
    f.delete(manifestPath(root), false)
    require(f.rename(tmp, manifestPath(root)),
      s"snapshot manifest publish failed for $root v$v")
  }

  /** Read version `v`, or the manifest's latest when None. */
  def readSnapshot(s: SparkSession, root: String,
      v: Option[Int] = None): DataFrame = {
    val ver = v.getOrElse {
      val f = fs(s, root)
      val in = f.open(manifestPath(root))
      val txt = scala.io.Source.fromInputStream(in).mkString
      in.close()
      "\"latest\":\\s*(\\d+)".r.findFirstMatchIn(txt)
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalStateException(
          s"corrupt snapshot manifest under $root: $txt"))
    }
    s.read.parquet(s"$root/v=$ver")
  }

  /** Time travel under the gate: version 1 is the base slice, version
    * 2 the keyed upsert of a change batch on top of it (built by
    * READING v1 back — the store is its own source of truth). The gate
    * reads v1 AS OF and v2 via the manifest's latest pointer and emits
    * both censuses; the oracle recomputes each version's content
    * independently, so a time-travel read leaking rows across versions
    * hash-mismatches immediately. */
  def timeTravel(s: SparkSession, dir: String): DataFrame = {
    val root = graft.core.Scratch.dir("snap", dir)
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val base = docs.filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    writeSnapshot(base, root, 1)
    val delta = docs
      .filter(col("doc_id") >= 200 && col("doc_id") < 400)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") + 1000).as("n_chars"))
    val v2 = Upsert.upsert(readSnapshot(s, root, Some(1)), delta,
      Seq("doc_id"), whenMatched = "replace", whenNotMatched = "insert")
    writeSnapshot(v2, root, 2)
    def census(df: DataFrame, v: Int): DataFrame =
      df.groupBy("lang").agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("total_chars"))
        .withColumn("version", lit(v.toLong))
    census(readSnapshot(s, root, Some(1)), 1)
      .unionByName(census(readSnapshot(s, root), 2)) // latest == v2
      .select("version", "lang", "n", "total_chars")
      .orderBy("version", "lang")
  }

  /** Snapshot DIFF — the reconciliation read on top of time travel:
    * what changed between two versions, as one FULL-OUTER join on the
    * key (packed-struct compare for "changed"), censused per lang. The
    * operational question every pipeline re-run raises ("what did this
    * rebuild actually touch?") answered from the immutable version
    * dirs alone. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    timeTravel(s, dir).count() // materialize v1/v2 (idempotent)
    val root = graft.core.Scratch.dir("snap", dir)
    val v1 = readSnapshot(s, root, Some(1))
    val v2 = readSnapshot(s, root, Some(2))
    val a = v1.select(col("doc_id"), col("lang").as("lang_a"),
      col("n_chars").as("nc_a"))
    val b = v2.select(col("doc_id"), col("lang").as("lang_b"),
      col("n_chars").as("nc_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("lang_a").isNull, lit("added"))
          .when(col("lang_b").isNull, lit("removed"))
          .when(col("nc_a") =!= col("nc_b") ||
            col("lang_a") =!= col("lang_b"), lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("lang", coalesce(col("lang_b"), col("lang_a")))
      .groupBy("lang", "status").agg(count(lit(1)).as("n"))
      .orderBy("lang", "status")
  }

  val oracle: Map[String, String] = Map(
    "snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id < 300),
        |delta AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars
        |  FROM documents WHERE doc_id >= 200 AND doc_id < 400),
        |v2 AS (SELECT doc_id, lang, n_chars FROM delta
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars FROM v1
        |  WHERE doc_id NOT IN (SELECT doc_id FROM delta)),
        |d AS (SELECT COALESCE(v2.lang, v1.lang) AS lang,
        |    CASE WHEN v1.doc_id IS NULL THEN 'added'
        |         WHEN v2.doc_id IS NULL THEN 'removed'
        |         WHEN v1.n_chars <> v2.n_chars
        |           OR v1.lang <> v2.lang THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        |SELECT lang, status, count(*) AS n FROM d
        |GROUP BY 1, 2 ORDER BY lang, status""".stripMargin,
    "time_travel" ->
      """WITH v1 AS (SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id < 300),
        |delta AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars
        |  FROM documents WHERE doc_id >= 200 AND doc_id < 400),
        |v2 AS (SELECT doc_id, lang, n_chars FROM delta
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars FROM v1
        |  WHERE doc_id NOT IN (SELECT doc_id FROM delta)),
        |c1 AS (SELECT CAST(1 AS BIGINT) AS version, lang,
        |    count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM v1 GROUP BY 2),
        |c2 AS (SELECT CAST(2 AS BIGINT) AS version, lang,
        |    count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM v2 GROUP BY 2)
        |SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |ORDER BY version, lang""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "time_travel" -> (timeTravel _),
    "snapshot_diff" -> (snapshotDiff _)
  )
}
