package graft.tools
object ExplainKnn {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestBase.session
    val df = graft.operators.Similarity.knnJoin(s, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("WindowGroupLimit") || l.contains("Exchange") || l.contains("Window")).mkString("\n"))
    s.stop()
  }
}
