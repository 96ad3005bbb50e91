package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted aggregation == direct aggregation on a 100:1 skewed key") {
    // key 0 holds 10k rows, keys 1..9 hold 100 each
    val rows = (0 until 10000).map(i => (0L, i.toLong, (i % 7).toLong)) ++
      (1 to 9).flatMap(k => (0 until 100).map(i =>
        (k.toLong, (k * 1000 + i).toLong, i.toLong)))
    val df = rows.toDF("key", "rowid", "v").repartition(8)
    val salted = Skew.saltedSumCount(df, col("key"), col("v"),
        col("rowid"), salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = df.groupBy("key")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("the hot key's rows really spread across all salt buckets") {
    val df = (0 until 4000).map(i => (0L, i.toLong, 1L))
      .toDF("key", "rowid", "v")
    val buckets = df
      .groupBy(pmod(xxhash64(col("rowid")), lit(8L)).as("salt"))
      .count().collect().map(_.getLong(1))
    assert(buckets.length == 8)
    // deterministic hash ⇒ near-uniform: no bucket takes >25% of rows
    assert(buckets.max < 1000, buckets.mkString(","))
  }
}
