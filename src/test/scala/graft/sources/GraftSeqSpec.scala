package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pushdown arithmetic for the DSv2 connector — boundary off-by-ones
  * here silently flip row counts, so every operator form is pinned. */
class GraftSeqSpec extends SparkTestBase {

  private def seq(rows: Long) =
    spark.read.format("graftseq").option("rows", rows.toString)
      .option("slices", "3").load()

  test("range narrowing: >=, >, <, <=, = are honored exactly at the " +
      "boundaries (count twins the unfiltered scan)") {
    val df = seq(100)
    assert(df.count() == 100)
    assert(df.filter(col("id") >= 90).count() == 10)
    assert(df.filter(col("id") > 90).count() == 9)
    assert(df.filter(col("id") < 10).count() == 10)
    assert(df.filter(col("id") <= 10).count() == 11)
    assert(df.filter(col("id") === 42).count() == 1)
    assert(df.filter(col("id") >= 40 && col("id") <= 40).count() == 1)
    // contradictory bounds -> empty, no negative-length partitions
    assert(df.filter(col("id") > 50 && col("id") < 10).count() == 0)
  }

  test("values survive pushdown + pruning: formulas match the scan " +
      "with no filters") {
    val full = seq(1000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(_._1)
    full.foreach { case (id, b, v, t) =>
      assert(b == GraftSeqSource.bucketOf(id))
      assert(v == GraftSeqSource.vqOf(id))
      assert(t == GraftSeqSource.tagOf(id))
    }
    // pruned read returns the same vq values for the pushed range
    val pruned = seq(1000).filter(col("id") >= 500).select("vq")
      .collect().map(_.getLong(0)).sorted.toSeq
    val expect = (500L until 1000L).map(GraftSeqSource.vqOf).sorted
    assert(pruned == expect)
  }

  test("slices split the narrowed range, not the full table") {
    val df = seq(1000).filter(col("id") >= 997)
    assert(df.rdd.getNumPartitions <= 3)
    assert(df.count() == 3)
  }
}
