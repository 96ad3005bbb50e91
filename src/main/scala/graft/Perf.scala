package graft

import org.apache.spark.sql.SparkSession

/** Targeted perf harness: times the named registered queries (all of
  * them if no names given) with `iters` repetitions after one untimed
  * warmup run, against SPARK_GRAFT_SF_DIR. Usage:
  *
  *   sbt "runMain graft.Perf mql_events_nor dedup_clusters" (2 iters)
  *   SPARK_GRAFT_ITERS=5 sbt "runMain graft.Perf mql_events_nor"
  *
  * Unlike Bench (one cold pass over everything, driver-facing JSON
  * contract) this is for iterating on a single query's plan: repeated
  * timed runs isolate steady-state cost from JIT/scan-cache warmup.
  */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run()
      val warm = (1 to iters).map(_ => run())
      println(f"[perf] $name cold=$cold%.2fs warm=${warm.map(t => f"$t%.2f").mkString(",")}s min=${warm.min}%.2fs")
    }
    spark.stop()
  }
}
