package graft

import org.apache.spark.sql.SparkSession

/** Fixed-cost profiler for one or more registered gates: splits each
  * run into
  *   build  — calling the registered builder (driver-side plan
  *            construction INCLUDING any eager actions it performs:
  *            localCheckpoint, index ensure, driver-side collects)
  *   plan   — forcing queryExecution.executedPlan (analysis+optimize+
  *            physical planning of the final frame)
  *   exec   — the noop write (job scheduling + executor compute)
  * plus the number of Spark jobs the whole gate launched. Usage:
  *
  *   SPARK_GRAFT_ITERS=3 sbt "runMain graft.ProfGate mql_window_nacc ..."
  */
object ProfGate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    // same JIT/scan warmup spirit as Bench: one throwaway pass
    spark.range(1 << 18).selectExpr("sum(id)")
      .write.format("noop").mode("overwrite").save()
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      (0 to iters).foreach { i =>
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        jobs.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        val tag = if (i == 0) "cold" else s"it$i"
        println(f"[prof] $name%-28s $tag%-5s total=${(t3 - t0) / 1e9}%6.2f " +
          f"build=${(t1 - t0) / 1e9}%6.2f plan=${(t2 - t1) / 1e9}%6.2f " +
          f"exec=${(t3 - t2) / 1e9}%6.2f jobs=${jobs.get()}%3d")
      }
    }
    spark.stop()
  }
}
