package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Snapshot store behavior: immutable versions, latest-pointer reads,
  * corrupt-manifest refusal. */
class SnapshotsSpec extends SparkTestBase {

  test("as-of reads are isolated: v1 is unchanged after v2 publishes; " +
      "latest follows the manifest") {
    import spark.implicits._
    val root = tmpDir("snapspec")
    Snapshots.writeSnapshot(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "x"), root, 1)
    Snapshots.writeSnapshot(
      Seq((1L, 99L), (3L, 30L)).toDF("k", "x"), root, 2)
    val v1 = Snapshots.readSnapshot(spark, root, Some(1))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1 == Map(1L -> 10L, 2L -> 20L))
    val latest = Snapshots.readSnapshot(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == Map(1L -> 99L, 3L -> 30L))
  }

  test("a corrupt manifest is refused loudly, never silently v0") {
    import spark.implicits._
    val root = tmpDir("snapbad")
    Snapshots.writeSnapshot(Seq((1L, 1L)).toDF("k", "x"), root, 1)
    // corrupt through the Hadoop FS so its .crc sidecar stays in sync
    // (a raw java.nio write would trip the checksum, not our parser)
    val p = new org.apache.hadoop.fs.Path(root, "_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    o.write("not json at all".getBytes); o.close()
    val e = intercept[IllegalStateException] {
      Snapshots.readSnapshot(spark, root)
    }
    assert(e.getMessage.contains("corrupt snapshot manifest"))
    // explicit as-of still works — the data dir is intact
    assert(Snapshots.readSnapshot(spark, root, Some(1)).count() == 1)
  }
}
