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

  test("newerWins keeps the greater version either way (commutative)") {
    val t = Seq((1L, "old", 5L), (2L, "cur", 9L)).toDF("k", "s", "ver")
    val src = Seq((1L, "new", 7L), (2L, "stale", 3L)).toDF("k", "s", "ver")
    val out = Upsert.upsert(t, src, Seq("k"),
      whenMatched = "newerWins", versionCol = Some("ver"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // key 1: source ver 7 > 5 wins; key 2: source ver 3 < 9 loses
    assert(out == Seq((1L, "new", 7L), (2L, "cur", 9L)))
    // applying the SAME updates onto the result changes nothing
    // (idempotent under re-delivery)
    val again = Upsert.upsert(
      Upsert.upsert(t, src, Seq("k"), "newerWins", "insert", Some("ver")),
      src, Seq("k"), "newerWins", "insert", Some("ver"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(again == out)
    val noVer = intercept[IllegalArgumentException] {
      Upsert.upsert(t, src, Seq("k"), whenMatched = "newerWins")
    }
    assert(noVer.getMessage.contains("requires versionCol"))
  }

  test("newerWins: a null version on a matched row fails loudly") {
    // null >= x is null in SQL — silently that fell through to the
    // target branch, biasing resolution toward the target exactly on
    // malformed CDC rows; the contract is now the same loud failure as
    // null keys
    val t = Seq((1L, "cur", java.lang.Long.valueOf(5L))).toDF("k", "s", "ver")
    val srcNull = Seq((1L, "new", null.asInstanceOf[java.lang.Long]))
      .toDF("k", "s", "ver")
    val e = intercept[Exception] {
      Upsert.upsert(t, srcNull, Seq("k"),
        whenMatched = "newerWins", versionCol = Some("ver")).collect()
    }
    assert(e.getMessage.contains("version 'ver' is null"))
    // an UNMATCHED null-version row is untouched by resolution — only
    // matched rows need an orderable version
    val srcNew = Seq((9L, "ins", null.asInstanceOf[java.lang.Long]))
      .toDF("k", "s", "ver")
    val ok = Upsert.upsert(t, srcNew, Seq("k"),
      whenMatched = "newerWins", versionCol = Some("ver"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ok == Seq((1L, "cur"), (9L, "ins")))
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
