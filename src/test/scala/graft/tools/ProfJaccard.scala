package graft.tools
import org.apache.spark.sql.functions._

/** One-off candidate-volume analysis for the prefix-filter join. */
object ProfJaccard {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val d = s.read.parquet(s"$sf/documents.parquet")
    val corpus = d.select(col("doc_id").as("id"), col("text"))
      .unionAll(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("id"),
          col("text").substr(lit(1), length(col("text")) - 15).as("text")))
    import graft.functions.TextFunctions._
    val ex = corpus.select(col("id"),
      explode(array_distinct(wordNgrams(tokens(col("text")), 3))).as("g"))
    println("shingle rows: " + ex.count())
    val cnt = ex.groupBy("g").agg(count(lit(1)).as("c"))
    println("distinct shingles: " + cnt.count())
    println("df histogram: " + cnt.groupBy("c").count()
      .orderBy(col("c")).limit(8).collect().mkString(", "))
    val sets = ex.join(cnt, "g")
      .select(col("id"), struct(col("c"), md5Hash60(col("g")).as("h")).as("e"))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(col("e"))), x => x("h")).as("sh"))
    val plen = floor(size(col("sh")) / 2).cast("int") + 1
    val pref = sets.select(col("id"), explode(slice(col("sh"), lit(1), plen)).as("p"))
    println("prefix rows: " + pref.count())
    val t0 = System.nanoTime()
    val cand = pref.as("a").join(pref.as("b"),
        col("a.p") === col("b.p") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    println("candidates: " + cand.count() +
      f"  (${(System.nanoTime()-t0)/1e9}%.1fs)")
    s.stop()
  }
}
