package graft.tools
object ProfSimhash {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestBase.session
    val dir = "/root/testdata/sf0.1"
    // warm JIT
    graft.operators.Dedup.dedupSimhashPairs(s, dir).count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.dedupSimhashPairs(s, dir).count()
      println(f"[simhash-pairs] run=$i n=$n time=${(System.nanoTime()-t0)/1e9}%6.2fs")
    }
    s.stop()
  }
}
