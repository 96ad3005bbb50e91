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

  test("LIMIT/OFFSET push into the source and compose with the " +
      "filter-narrowed range") {
    // offset advances lo, limit caps hi — the generated SET is exact
    val ids = seq(1000).filter(col("id") >= 100)
      .offset(10).limit(5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == (110L until 115L).toSet, ids)
    // limit alone on the unfiltered table
    assert(seq(1000).limit(7).count() == 7)
    // offset past the end -> empty, no negative ranges
    assert(seq(50).offset(60).count() == 0)
    // the scan description proves the range narrowed INSIDE the source
    val p = seq(1000).filter(col("id") >= 100).offset(10).limit(5)
      .queryExecution.executedPlan.toString
    assert(p.contains("range=[110, 115)"), p)
  }

  test("slices split the narrowed range, not the full table") {
    val df = seq(1000).filter(col("id") >= 997)
    assert(df.rdd.getNumPartitions <= 3)
    assert(df.count() == 3)
  }
}
