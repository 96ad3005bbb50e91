package graft.tools
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestBase.session
    val dir = "/root/testdata/sf0.1"
    val d = s.read.parquet(s"$dir/documents.parquet")
    val corpus = d.select(col("doc_id").as("id"), col("text"))
      .unionAll(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("id"),
          col("text").substr(lit(1), length(col("text")) - 15).as("text")))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs n=$n")
    }
    time("corpus")(corpus.count())
    time("tokens")(corpus.select(tokens(col("text")).as("t")).selectExpr("sum(size(t))").head().getLong(0))
    val sh = corpus.withColumn("sh", array_distinct(wordNgrams(tokens(col("text")), 3))).filter(size(col("sh")) > 0)
    time("shingled")(sh.selectExpr("sum(size(sh))").head().getLong(0))
    time("minhash")(sh.select(minhashSignature(col("sh"), 12).as("g")).selectExpr("sum(size(g))").head().getLong(0))
    val banded = sh.select(col("id"), minhashSignature(col("sh"), 12).as("sig"))
    time("banded")(banded.count())
    time("pairs")(graft.operators.Dedup.minhashPairs(corpus).count())
    s.stop()
  }
}
