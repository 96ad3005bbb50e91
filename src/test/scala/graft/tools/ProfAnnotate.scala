package graft.tools

import org.apache.spark.sql.functions._

/** r14 probe: annotate_docs at sf10 costs 3× the SUM of its component
  * gates (44.6 s vs tokens 2.4 + langid 1.8 + fingerprint 11.0 +
  * quality 1.1) — isolate which fused annotator breaks the one-pass
  * contract. Run: sbt "Test/runMain graft.tools.ProfAnnotate [sfdir]" */
object ProfAnnotate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-probe-sf10")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftRules.register(s)
    import graft.functions.TextFunctions.{fingerprint, langId, tokens}
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val base = d.select(col("doc_id"), col("text"), col("lang"),
      tokens(col("text")).as("ts"))
    time("tokens_only")(base.select(col("doc_id"), size(col("ts"))))
    time("plus_langid")(base.select(col("doc_id"),
      size(col("ts")).cast("long").as("n_tok"),
      langId(col("ts")).as("lang_pred")))
    time("plus_fingerprint")(base.select(col("doc_id"),
      size(col("ts")).cast("long").as("n_tok"),
      langId(col("ts")).as("lang_pred"),
      fingerprint(col("text"), 8).as("fp")))
    time("plus_quality_FULL")(base.select(col("doc_id"),
      size(col("ts")).cast("long").as("n_tok"),
      langId(col("ts")).as("lang_pred"),
      fingerprint(col("text"), 8).as("fp"),
      graft.operators.Pipeline.qualityKeepOver(
        col("text"), col("ts"), col("lang")).as("keep")))
    time("quality_only")(base.select(col("doc_id"),
      graft.operators.Pipeline.qualityKeepOver(
        col("text"), col("ts"), col("lang")).as("keep")))
    time("full_with_sort")(graft.operators.TextAnalysis
      .annotateDocs(s, dir))
    s.stop()
  }
}
