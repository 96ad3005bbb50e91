package graft

import org.apache.spark.sql.SparkSession

/** Micro-probe of per-job fixed cost in this environment: trivial and
  * small-shuffle jobs, timed individually after a warmup. */
object JobOverhead {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ovh] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    import org.apache.spark.sql.functions._
    (1 to 3).foreach { _ =>
      spark.range(1000).write.format("noop").mode("overwrite").save()
    }
    (1 to 5).foreach { i =>
      time(s"noop-range-32tasks $i") {
        spark.range(1 << 16).write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 5).foreach { i =>
      time(s"shuffle-32p $i") {
        spark.range(1 << 16).groupBy(col("id") % 97).count()
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 5).foreach { i =>
      time(s"scan-parquet-embeddings $i") {
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 5).foreach { i =>
      time(s"scan-parquet-lineitem-agg $i") {
        spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
          .groupBy("l_returnflag").count()
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
