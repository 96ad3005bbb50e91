package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The SymSpell deletion-neighborhood fuzzy matcher: neighborhood
  * completeness (candidates ⊇ all true ≤2-distance pairs, including
  * transpositions, which cost 2 in plain Levenshtein), verify
  * exactness, and the no-all-pairs plan shape. */
class FuzzySearchSpec extends SparkTestBase {
  import spark.implicits._

  test("delNeighborhood: contains the string, all 1-deletions, all " +
      "2-deletions, deduplicated") {
    val got = spark.range(1)
      .select(TextAnalysis.delNeighborhood(lit("abc")).as("v"))
      .head().getSeq[String](0).toSet
    assert(got == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    val one = spark.range(1)
      .select(TextAnalysis.delNeighborhood(lit("x")).as("v"))
      .head().getSeq[String](0).toSet
    assert(one == Set("x", "")) // L=1: no 2-deletion tier
  }

  test("searchFuzzy: finds substitution, insertion, deletion AND " +
      "transposition typos within distance 2, never distance-3 noise") {
    val dir = tmpDir("fuzzy")
    Seq((1L, "join the table scan", "en", "w", 1L),
      (2L, "vector stream filter", "en", "w", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.searchFuzzy(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // jion→join is a transposition: distance 2 in plain Levenshtein,
    // caught because del1 of both meets at "jon"/"jin"... (deletion
    // neighborhood completeness), verified at 2
    assert(got.contains(("jion", "join", 2L)), got.mkString(","))
    assert(got.contains(("tabel", "table", 2L)))
    assert(got.contains(("scann", "scan", 1L)))
    assert(got.contains(("filtr", "filter", 1L)))
    assert(got.contains(("vektor", "vector", 1L)))
    assert(got.contains(("strem", "stream", 1L)))
    assert(got.contains(("the", "the", 0L)) == false) // not a query
    assert(!got.exists(_._1 == "zzzzzz")) // no-match probe stays empty
    assert(got.forall(_._3 <= 2L))
  }

  test("plan shape: candidates come from an equi-join on deletion " +
      "variants with the query side broadcast — no cartesian product") {
    val dir = tmpDir("fuzzy-plan")
    Seq((1L, "join the table", "en", "w", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val plan = TextAnalysis.searchFuzzy(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
