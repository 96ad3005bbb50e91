package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Upsert mode matrix on a tiny keyed corpus: every whenMatched ×
  * whenNotMatched combination the gate doesn't cover, plus the loud
  * contracts (null key, schema mismatch, fail modes). */
class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val target = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)
  ).toDF("k", "s", "v")
  private lazy val source = Seq(
    (2L, "B", 200L), (4L, "d", 40L)
  ).toDF("k", "s", "v")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("replace + insert (the gate's combination)") {
    assert(rows(Upsert.upsert(target, source, Seq("k"))) ==
      Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L),
        (4L, "d", 40L)))
  }

  test("keepExisting keeps the target row on match") {
    assert(rows(Upsert.upsert(target, source, Seq("k"),
      whenMatched = "keepExisting")) ==
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
        (4L, "d", 40L)))
  }

  test("merge coalesces per column: null source values keep target's") {
    val patchy = Seq((2L, null.asInstanceOf[String], 200L))
      .toDF("k", "s", "v")
    assert(rows(Upsert.upsert(target, patchy, Seq("k"),
      whenMatched = "merge", whenNotMatched = "discard")) ==
      Seq((1L, "a", 10L), (2L, "b", 200L), (3L, "c", 30L)))
  }

  test("discard drops unmatched source rows") {
    assert(rows(Upsert.upsert(target, source, Seq("k"),
      whenNotMatched = "discard")) ==
      Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L)))
  }

  test("fail modes raise on match / on unmatched source") {
    val m = intercept[Exception] {
      Upsert.upsert(target, source, Seq("k"),
        whenMatched = "fail").collect()
    }
    assert(m.getMessage.contains("whenMatched=fail"))
    val nm = intercept[Exception] {
      Upsert.upsert(target, source, Seq("k"),
        whenNotMatched = "fail").collect()
    }
    assert(nm.getMessage.contains("whenNotMatched=fail"))
  }

  test("null keys and schema drift are rejected loudly") {
    val nullKey = Seq((java.lang.Long.valueOf(2L), "x", 1L),
        (null.asInstanceOf[java.lang.Long], "y", 2L))
      .toDF("k", "s", "v")
    val nk = intercept[Exception] {
      Upsert.upsert(target, nullKey, Seq("k")).collect()
    }
    assert(nk.getMessage.contains("must be non-null"))
    val drift = intercept[IllegalArgumentException] {
      Upsert.upsert(target, source.withColumnRenamed("v", "w"), Seq("k"))
    }
    assert(drift.getMessage.contains("share a schema"))
  }
}
