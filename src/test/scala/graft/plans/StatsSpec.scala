package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Catalog statistics drive physical planning: ANALYZE TABLE + CBO
  * column stats shrink a selective filter's size estimate below the
  * broadcast threshold and flip a sort-merge join to broadcast — the
  * mechanism that picks the right join strategy on a real warehouse
  * without hand hints. */
class StatsSpec extends SparkTestBase {

  test("ANALYZE + CBO flips the selectively-filtered dim join from " +
      "sort-merge to broadcast") {
    val suffix = java.util.UUID.randomUUID.toString.replace("-", "")
    val fact = s"stats_fact_$suffix"
    val dim = s"stats_dim_$suffix"
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.statistics.histogram.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.range(200000).selectExpr("id", "id % 5000 AS k")
        .write.saveAsTable(fact)
      // dim: 5000 keys x 40 groups; pad must be INCOMPRESSIBLE (a
      // constant pad parquet-compresses under the threshold and the
      // join broadcasts on file size alone); the g = 7 slice is ~1/40
      spark.range(5000).selectExpr("id AS k", "id % 40 AS g",
          "concat(md5(cast(id as string)), md5(cast(id + 7 as string))," +
            " md5(cast(id + 13 as string))) AS pad")
        .write.saveAsTable(dim)
      def plan(): String = spark.table(fact)
        .join(spark.table(dim).filter(col("g") === 7), "k")
        .groupBy("g").count()
        .queryExecution.executedPlan.toString
      val before = plan()
      assert(before.contains("SortMergeJoin"),
        s"expected SMJ before stats:\n$before")
      spark.sql(s"ANALYZE TABLE $dim COMPUTE STATISTICS FOR ALL COLUMNS")
      val after = plan()
      assert(after.contains("BroadcastHashJoin"),
        s"expected broadcast after ANALYZE:\n$after")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql(s"DROP TABLE IF EXISTS $fact")
      spark.sql(s"DROP TABLE IF EXISTS $dim")
    }
  }
}
