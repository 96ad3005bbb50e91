package graft

import org.apache.spark.sql.SparkSession

/** A/B of AQE coalescing dials on small-shuffle fixed cost. */
object JobOverhead2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def bench(tag: String): Unit = {
      val times = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        spark.range(1 << 16).groupBy(col("id") % 97).count()
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ovh2] $tag min=${times.min}%.3f times=" +
        times.map(t => f"$t%.2f").mkString(","))
      val t2 = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("id"))
        spark.range(50000).select(col("id"), (col("id") % 500).as("g"))
          .withColumn("s", sum("id").over(w))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ovh2] $tag-window min=${t2.min}%.3f times=" +
        t2.map(t => f"$t%.2f").mkString(","))
    }
    bench("default")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    bench("parallelismFirst=false")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "8m")
    bench("pf=false,minPart=8m")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
    bench("back-to-default")
    spark.stop()
  }
}
