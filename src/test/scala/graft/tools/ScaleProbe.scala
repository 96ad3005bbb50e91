package graft.tools
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // warm JIT
    graft.operators.Dedup.minhashPairs(
      d.select(col("doc_id").as("id"), col("text"))).count()
    for (mult <- Seq(1, 4, 16)) {
      val corpus = (0 until mult).map(i =>
        d.select((col("doc_id") + i * 1000000L).as("id"),
          // remap the vocabulary per replica (prefix every word) so
          // replicas share no shingles: expected pairs grow LINEARLY
          regexp_replace(col("text"), "([a-z0-9]+)", s"r$i$$1").as("text")))
        .reduce(_ unionAll _)
        .repartition(32)
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.minhashPairs(corpus).count()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"[scale] mult=$mult%2d rows=${5000 * mult}%6d pairs=$n%5d time=$el%6.2fs per-1k-rows=${el / (5 * mult)}%5.3fs")
    }
    s.stop()
  }
}
