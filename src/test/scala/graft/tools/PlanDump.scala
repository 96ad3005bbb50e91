package graft.tools
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestBase.session
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("mql_events_range", "asof_join", "sessionize", "salted_agg")) {
      val p = graft.SparkEntry.queries(name)(s, dir)
        .queryExecution.executedPlan.toString
      println(s"==== $name")
      println(p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("parse_json") ||
        l.contains("Window") || l.contains("HashAggregate")
      ).take(12).map(_.take(150)).mkString("\n"))
    }
    s.stop()
  }
}
