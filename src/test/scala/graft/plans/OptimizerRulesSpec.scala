package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The array_contains→InSet optimizer rule: fires on null-free literal
  * arrays past the threshold, preserves results and null semantics,
  * and leaves null-bearing arrays (three-valued misses) untouched.
  * Inputs come from Range/parquet scans — a local Seq would be folded
  * into a LocalRelation before the rewrite is observable. */
class OptimizerRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = ('a' to 'z').map(_.toString)

  test("rewrite fires: optimized plan carries INSET, not " +
      "array_contains, and results are identical") {
    GraftRules.register(spark)
    val df = spark.range(4).select(
        when(col("id") === 3, lit(null).cast("string"))
          .when(col("id") === 2, lit("zz"))
          .otherwise(expr("char(97 + id)")).as("w"))
      .select(col("w"), array_contains(typedLit(vocab), col("w"))
        .as("hit"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.toUpperCase.contains("INSET"), opt)
    assert(!opt.contains("array_contains"), opt)
    val got = df.collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toSet
    // null probe stays null (InSet contract == array_contains on a
    // null-free array); miss is false, hit is true
    assert(got == Set(("a", Some(true)), ("b", Some(true)),
      ("zz", Some(false)), (null, None)), got.mkString(","))
  }

  test("guards: below-threshold and null-bearing arrays are untouched") {
    GraftRules.register(spark)
    val w = spark.range(1).select(lit("zz").as("w"))
    val small = w
      .select(array_contains(typedLit(Seq("a", "b")), col("w")).as("h"))
    assert(!small.queryExecution.optimizedPlan.toString.toUpperCase
      .contains("INSET"))
    // an array CONTAINING null is three-valued on miss — must not
    // rewrite (InSet would return false where SQL semantics say null)
    val withNull = w
      .select(array_contains(
        typedLit(Seq(Some("a"), None, Some("b"), Some("c"), Some("d"),
          Some("e"), Some("f"), Some("g"), Some("h"))), col("w")).as("h"))
    assert(!withNull.queryExecution.optimizedPlan.toString.toUpperCase
      .contains("INSET"))
    assert(withNull.head().isNullAt(0)) // the three-valued miss survives
  }

  test("floating-point arrays are untouched: -0.0 vs 0.0 keeps SQL " +
      "equality (InSet's boxed equals would flip the probe to false)") {
    GraftRules.register(spark)
    val v = spark.range(1).select(lit(-0.0d).as("v"))
    val df = v.select(array_contains(
      typedLit(Seq(0.0d, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)),
      col("v")).as("h"))
    assert(!df.queryExecution.optimizedPlan.toString.toUpperCase
      .contains("INSET"))
    assert(df.head().getBoolean(0)) // SQL equality: -0.0 == 0.0
  }

  test("the viterbi gate plans through the rule (INSET in its " +
      "optimized plan) and its spec fixture still holds") {
    val dir = tmpDir("vit-inset")
    Seq(("abcd", 5L)).toDF("w", "n").write.mode("overwrite")
      .parquet(dir)
    val words = spark.read.parquet(dir)
    val got = graft.operators.Bpe
      .viterbiOver(words, ('a' to 'z').map(_.toString) ++ Seq("ab", "bcd"))
    assert(got.queryExecution.optimizedPlan.toString.toUpperCase
      .contains("INSET"))
    assert(got.head().getLong(2) == 2L)
  }
}
