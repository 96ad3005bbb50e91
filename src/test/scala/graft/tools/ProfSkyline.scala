package graft.tools

import org.apache.spark.sql.functions._

/** r15 probe: skyline_orders sits at 23 s / 7.9× on the sf10 rung —
  * decompose the two-phase plan (per-customer agg → 32-bucket local
  * skyline → global skyline → final sort) to find which stage carries
  * the cost. Run: sbt "Test/runMain graft.tools.ProfSkyline [sfdir]" */
object ProfSkyline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-probe-sf10")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val orders = s.read.parquet(s"$dir/orders.parquet")
    println(s"[prof] orders rows = ${orders.count()}")
    val per = orders
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_custkey")
      .agg(sum(col("cents")).as("spend_c"), count(lit(1)).as("n_orders"))
    time("scan_only")(orders.select(col("o_custkey")))
    time("agg_only")(per)
    println(s"[prof] customers = ${per.count()}")
    val withB = per.withColumn("b", pmod(col("o_custkey"), lit(32L)))
    time("agg_plus_bucket")(withB)
    val local = graft.operators.Mining
      .skylinePass(withB, partCols = Seq("b")).drop("b")
    time("plus_local_pass")(local)
    println(s"[prof] local survivors = ${local.count()}")
    val global = graft.operators.Mining.skylinePass(local, partCols = Nil)
    time("plus_global_pass")(global)
    time("full_gate")(graft.operators.Mining.skylineOrders(s, dir))
    // repeat to separate cold-IO from compute
    time("full_gate_warm")(graft.operators.Mining.skylineOrders(s, dir))
    s.stop()
  }
}
