package graft.filter

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Cross-implementation lock for [[RedactWalk]] (r15): the jackson-walk
  * scale path and the plan-unrolled path are two implementations of the
  * same `$redact $$DESCEND` contract — this spec runs BOTH over a
  * generated corpus of nested documents (within the unrolled path's
  * depth envelope) for several interpretable verdicts and requires
  * identical surviving rows AND identical post-redaction field views.
  * Any interpreter drift from computeExpr's semantics (numeric bracket,
  * Kleene logic, null-condition else-branch) breaks this spec. */
class RedactWalkSpec extends SparkTestBase {

  private def corpus = {
    // deterministic generator: scalars, level fields of every residue,
    // embedded docs (depth ≤ 2 objects — the unrolled envelope), mixed
    // arrays with objects and scalars, nulls, strings-that-look-numeric
    spark.range(200).select(col("id"),
      to_json(struct(
        (col("id") % 7).as("level"),
        col("id").as("did"),
        lit("x5").as("s"),
        struct((col("id") % 5).as("level"),
          (col("id") * 3).as("v"),
          struct((col("id") % 3).as("level"),
            lit(1L).as("w")).as("inner")).as("sec"),
        struct((col("id") % 4 + 1).as("level"),
          col("id").as("v")).as("aux"),
        array(
          struct((col("id") % 2 + 2).as("level"), lit(7L).as("t")),
          struct((col("id") % 6).as("level"), lit(8L).as("t"))).as("arr")
      )).as("meta"))
  }

  private val verdicts = Seq(
    // the canonical ACL shape
    """{"$cond": [{"$gte": [{"$toLong": "$level"}, 3]},
      |  "$$DESCEND", "$$PRUNE"]}""".stripMargin,
    // nested conds + $and + 2-dot ref + $ifNull default: the dotted
    // ref resolves at ROOT (sec.inner.level exists) but is missing at
    // every re-rooted subdocument, so both the present and the
    // defaulted branch are exercised per level
    """{"$cond": [
      |  {"$and": [{"$gte": [{"$toLong": "$level"}, 2]},
      |            {"$lt": [{"$toLong": {"$ifNull":
      |               [{"$toLong": "$sec.inner.level"}, 40]}}, 50]}]},
      |  {"$cond": [{"$eq": [{"$toLong": "$level"}, 4]},
      |             "$$KEEP", "$$DESCEND"]},
      |  "$$PRUNE"]}""".stripMargin,
    // $or/$not, and a ref that is a STRING for some docs (null bracket)
    """{"$cond": [
      |  {"$or": [{"$lte": [{"$toLong": "$level"}, 1]},
      |           {"$not": {"$gt": [{"$toLong": "$s"}, 0]}}]},
      |  {"$cond": [{"$ne": [{"$toLong": "$level"}, 0]},
      |             "$$DESCEND", "$$PRUNE"]},
      |  "$$KEEP"]}""".stripMargin)

  // the post-redaction views compared between the two paths: presence
  // plus every planted field through the typed variant bracket
  private val viewPipeline =
    """ {"$project": {"id": 1,
      |   "lvl": {"$toLong": {"$ifNull": [{"$toLong": "$level"}, -1]}},
      |   "secv": {"$toLong": {"$ifNull": [{"$toLong": "$sec.v"}, -1]}},
      |   "secl": {"$toLong": {"$ifNull":
      |     [{"$toLong": "$sec.inner.level"}, -1]}},
      |   "auxv": {"$toLong": {"$ifNull": [{"$toLong": "$aux.v"}, -1]}},
      |   "na": {"$toLong": {"$ifNull": [{"$size": "$arr"}, -1]}}}},
      | {"$sort": {"id": 1}}""".stripMargin

  test("walk path and unrolled path agree row-for-row and field-for-" +
      "field over the generated corpus, for every verdict shape") {
    for (v <- verdicts) {
      val pipe = s"""[{"$$redact": $v},\n$viewPipeline]"""
      val walk = MqlPipeline.aggregate(corpus, col("meta"), pipe)
        .collect().map(_.toSeq).toSeq
      spark.conf.set("graft.redact.force_unroll", "true")
      val unrolled =
        try MqlPipeline.aggregate(corpus, col("meta"), pipe)
          .collect().map(_.toSeq).toSeq
        finally spark.conf.unset("graft.redact.force_unroll")
      assert(walk == unrolled,
        s"paths disagree for verdict $v:\n walk=${walk.take(5)}\n " +
          s"unrolled=${unrolled.take(5)}")
      assert(walk.nonEmpty, s"degenerate fixture for $v")
    }
  }

  test("interpretable() admits exactly the walk grammar") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def ok(s: String) = RedactWalk.interpretable(m.readTree(s))
    assert(ok(""""DESCEND""""))
    assert(ok("""{"$cond": [{"$gte": [{"$toLong": "$a.b"}, 3]},
      | "KEEP", "PRUNE"]}""".stripMargin))
    assert(!ok(""""oops"""")) // non-sentinel leaf must fall back (raise)
    assert(!ok("""{"$cond": [{"$gte": ["$a", 3]}, "KEEP", "$x"]}"""))
    assert(!ok("""{"$switch": {"branches": [], "default": "KEEP"}}"""))
    assert(!ok("""{"$cond": [{"$gte": [{"$concat": ["$a"]}, 3]},
      | "KEEP", "PRUNE"]}""".stripMargin))
    // $$-vars and bare "$" are not field refs
    assert(!ok("""{"$cond": [{"$gte": ["$$NOW", 3]}, "KEEP", "PRUNE"]}"""))
    assert(!ok("""{"$cond": [{"$gte": ["$", 3]}, "KEEP", "PRUNE"]}"""))
  }
}
