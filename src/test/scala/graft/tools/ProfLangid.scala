package graft.tools

import org.apache.spark.sql.functions._

/** r15 probe: text_langid_trained is 37 s standalone at sf10 (the
  * round's slowest non-adjudicated gate) — split featurize (md5 per
  * trigram) / checkpoint / train / score to name the dominant term.
  * Run: sbt "Test/runMain graft.tools.ProfLangid [sfdir]" */
object ProfLangid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-probe-sf10")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "32g")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftRules.register(s)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = s.read.parquet(s"$dir/documents.parquet")
    println(s"[prof] docs = ${docs.count()}")
    // featurize-only: the gate's exact plant+prefix+trigram+md5 chain,
    // materialized to noop (no checkpoint)
    import graft.operators.TextAnalysis
    time("full_gate_cold") {
      TextAnalysis.textLangIdTrained(s, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("full_gate_warm") {
      TextAnalysis.textLangIdTrained(s, dir)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
