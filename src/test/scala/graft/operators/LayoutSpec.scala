package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness and the file-skipping property
  * the rewrite exists for — per-file min/max spans bounded on BOTH
  * dimensions, vs a linear sort that only bounds its own sort key. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zorder16 interleaves bits (a even positions, b odd)") {
    // a=3 (0b011), b=5 (0b101): bits -> 1 + 2 + 4 + 32 = 39
    val got = spark.range(1)
      .select(Layout.zorder16(lit(3L), lit(5L))).head().getLong(0)
    assert(got == 39L)
    // identity checks: b=0 spreads a's bits to even positions
    val a5 = spark.range(1)
      .select(Layout.zorder16(lit(5L), lit(0L))).head().getLong(0)
    assert(a5 == 17L) // 0b101 -> positions 0 and 4
    // clamp: only the low 16 bits participate
    val big = spark.range(1)
      .select(Layout.zorder16(lit((1L << 20) + 7L), lit(0L))).head().getLong(0)
    assert(big == spark.range(1)
      .select(Layout.zorder16(lit(7L), lit(0L))).head().getLong(0))
  }

  test("zorder clusters BOTH dimensions; linear sort only its own key") {
    // 64x64 grid, one row per cell, written as 16 files each way
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zDir = tmpDir("layout-z")
    val linDir = tmpDir("layout-lin")
    Layout.zorderWrite(grid, zDir, col("x"), col("y"), 16)
    grid.repartitionByRange(16, col("y")).sortWithinPartitions("y")
      .write.mode("overwrite").parquet(linDir)

    def avgSpans(dir: String): (Double, Double) = {
      val pf = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (pf.getDouble(0), pf.getDouble(1))
    }
    val (zx, zy) = avgSpans(zDir)
    val (lx, ly) = avgSpans(linDir)
    // linear layout: y tightly bounded, x spans the full 0..63 range in
    // every file; z-order: BOTH spans strictly tighter than full
    assert(ly < 8 && lx > 60, s"linear spans x=$lx y=$ly")
    assert(zx < 40 && zy < 40, s"zorder spans x=$zx y=$zy")
    // content unchanged by either rewrite
    assert(spark.read.parquet(zDir).count() == 64 * 64)
    assert(spark.read.parquet(zDir)
      .agg(sum(col("x") + col("y") * 64)).head().getLong(0) ==
      grid.agg(sum(col("x") + col("y") * 64)).head().getLong(0))
  }
}
