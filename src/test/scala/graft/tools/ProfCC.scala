package graft.tools
import org.apache.spark.sql.functions._
object ProfCC {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestBase.session
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime()-t0)/1e9}%6.2fs"); r
    }
    // warm
    s.range(1000).count()
    val d = s.read.parquet(s"$dir/documents.parquet")
    val corpus = d.select(col("doc_id").as("id"), col("text"))
      .unionAll(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("id"),
          col("text").substr(lit(1), length(col("text")) - 15).as("text")))
    val pairs = time("pairs+ckpt")(
      graft.operators.Dedup.minhashPairs(corpus).localCheckpoint(true))
    println("[prof] n_pairs " + pairs.count())
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    var labels = time("init labels")(corpus.select(col("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint(true))
    var prev = labels.agg(sum("lbl")).head().getLong(0)
    var done = false; var r = 0
    while (!done && r < 20) {
      r += 1
      labels = time(s"round $r")({
        val prop = edges.join(labels.select(col("id").as("dst"), col("lbl")), "dst")
          .select(col("src").as("id"), col("lbl"))
        labels.unionByName(prop).groupBy("id").agg(min("lbl").as("lbl"))
          .localCheckpoint(true)
      })
      val s2 = time(s"probe $r")(labels.agg(sum("lbl")).head().getLong(0))
      done = s2 == prev; prev = s2
    }
    println("[prof] rounds " + r)
    s.stop()
  }
}
