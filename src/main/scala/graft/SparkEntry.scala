package graft

import graft.operators.{Relational, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers BOTH a `queries` entry (the Spark
  * plan) and an `oracleSql` entry (the DuckDB twin) — the driver's
  * correctness gate compares the two per round.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is the reference's composite Query operator (metadata pre-filter
    * ∧ top-k nearest neighbors, /root/reference/db/db.go:111-143) run
    * end-to-end through the collection API. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.KaerQuery.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++
      Similarity.queries ++
      TextAnalysis.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Multimodal.queries ++
      graft.operators.KaerQuery.queries ++
      graft.operators.Pipeline.queries ++
      graft.operators.Sessions.queries ++
      graft.operators.IvfIndex.queries ++
      graft.sources.Formats.queries ++
      graft.operators.Skew.queries ++
      graft.operators.Quantize.queries ++
      graft.operators.Upsert.queries ++
      graft.operators.Bucketing.queries ++
      graft.operators.Layout.queries ++
      graft.operators.Geo.queries ++
      graft.operators.Cluster.queries ++
      graft.operators.Bpe.queries ++
      graft.operators.Analytics.queries ++
      graft.operators.Mining.queries ++
      graft.operators.Snapshots.queries ++
      graft.streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++
      Similarity.oracle ++
      TextAnalysis.oracle ++
      graft.operators.Dedup.oracle ++
      graft.operators.Multimodal.oracle ++
      graft.operators.KaerQuery.oracle ++
      graft.operators.Pipeline.oracle ++
      graft.operators.Sessions.oracle ++
      graft.operators.IvfIndex.oracle ++
      graft.sources.Formats.oracle ++
      graft.operators.Skew.oracle ++
      graft.operators.Quantize.oracle ++
      graft.operators.Upsert.oracle ++
      graft.operators.Bucketing.oracle ++
      graft.operators.Layout.oracle ++
      graft.operators.Geo.oracle ++
      graft.operators.Cluster.oracle ++
      graft.operators.Bpe.oracle ++
      graft.operators.Analytics.oracle ++
      graft.operators.Mining.oracle ++
      graft.operators.Snapshots.oracle ++
      graft.streaming.StreamingOps.oracle
}
