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

  // ---- SizeOfFilterToExists ----------------------------------------

  test("size(filter) > 0 rewrites to nulls-as-false exists: plan " +
      "carries exists, results match the unrewritten semantics") {
    GraftRules.register(spark)
    val dir = tmpDir("sz-exists")
    Seq((1L, Seq("a", "b", "c")), (2L, Seq("x", "y")),
      (3L, Seq.empty[String]), (4L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "arr").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).select(col("id"),
      (size(filter(col("arr"), t => t === "b")) > 0).as("hit"),
      (size(filter(col("arr"), t => t === "b")) === 0).as("miss"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("exists("), opt)
    assert(!opt.contains("size(filter"), opt)
    val got = df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getBoolean(1)),
      if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toSet
    // null array: size(null)=null -> null comparison, exists(null)=null
    assert(got == Set((1L, Some(true), Some(false)),
      (2L, Some(false), Some(true)), (3L, Some(false), Some(true)),
      (4L, None, None)), got.mkString(","))
  }

  test("size(filter) guard: a null-emitting predicate stays " +
      "nulls-as-false after the rewrite (filter drops nulls; the 3VL " +
      "exists default would return null instead of false)") {
    GraftRules.register(spark)
    val dir = tmpDir("sz-3vl")
    // predicate (t / 0-safe): t > 1 on [null, 1] -> no true, one null
    Seq((1L, Seq[Integer](null, Integer.valueOf(1))))
      .toDF("id", "arr").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select((size(filter(col("arr"), t => t > 1)) > 0).as("hit"))
    assert(df.queryExecution.optimizedPlan.toString.contains("exists("))
    assert(df.head().getBoolean(0) == false) // false, NOT null
  }

  test("size(filter) guard: two-argument (elem, idx) lambdas are " +
      "untouched (exists has no index form)") {
    GraftRules.register(spark)
    val dir = tmpDir("sz-idx")
    Seq((1L, Seq("a", "b"))).toDF("id", "arr")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select((size(filter(col("arr"), (t, i) => i === 0)) > 0).as("h"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("exists("))
    assert(df.head().getBoolean(0))
  }

  // ---- ArrayPositionToInSet ----------------------------------------

  test("array_position(<literal>, v) > 0 rewrites to InSet, composing " +
      "with the exists rewrite inside a filter lambda") {
    GraftRules.register(spark)
    val dir = tmpDir("pos-inset")
    Seq((1L, "the cat sat"), (2L, "zz qq ww")).toDF("id", "text")
      .write.mode("overwrite").parquet(dir)
    val stop = array(vocab.map(lit): _*) // 26 literal strings
    val df = spark.read.parquet(dir).select(col("id"),
      (size(filter(split(col("text"), " "),
        t => array_position(stop, t) > 0)) >= 1).as("has_stop"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.toUpperCase.contains("INSET"), opt)
    assert(opt.contains("exists("), opt)
    assert(!opt.contains("array_position"), opt)
    val got = df.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    // "the cat sat" has no single-letter token; vocab is a-z singles
    assert(got == Set((1L, false), (2L, false)))
    // positive case: token IS in the literal vocabulary
    val df2 = spark.read.parquet(dir).select(
      (array_position(stop, lit("q")) > 0).as("m"),
      (array_position(stop, lit("qq")) === 0).as("nm"),
      (array_position(stop, lit(null).cast("string")) > 0).as("np"))
    val r2 = df2.head()
    assert(r2.getBoolean(0) && r2.getBoolean(1) && r2.isNullAt(2))
  }

  test("array_position guards: below-threshold and floating arrays " +
      "are untouched; null ELEMENTS are safely dropped from the set") {
    GraftRules.register(spark)
    // non-foldable probes (ConstantFolding would pre-compute a literal
    // probe before the extra batch ever sees the shape)
    val w = spark.range(1)
      .select(when(col("id") >= 0, "b").otherwise("x").as("w"))
    val small = w.select(
      (array_position(typedLit(Seq("a", "b")), col("w")) > 0).as("h"))
    assert(!small.queryExecution.optimizedPlan.toString.toUpperCase
      .contains("INSET"))
    assert(small.head().getBoolean(0))
    val fl = spark.range(1)
      .select(when(col("id") >= 0, -0.0d).otherwise(1.0d).as("v"))
      .select((array_position(typedLit(
        Seq(0.0d, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)),
        col("v")) > 0).as("h"))
    assert(!fl.queryExecution.optimizedPlan.toString.toUpperCase
      .contains("INSET"))
    assert(fl.head().getBoolean(0)) // SQL equality: -0.0 == 0.0
    // null elements never match under array_position -> rewrite holds
    val nb = w.select((array_position(
      typedLit(Seq(Some("a"), None, Some("b"), Some("c"), Some("d"),
        Some("e"), Some("f"), Some("g"), Some("h"))), col("w")) > 0)
      .as("h"))
    assert(nb.queryExecution.optimizedPlan.toString.toUpperCase
      .contains("INSET"))
    assert(nb.head().getBoolean(0))
  }

  test("the quality gates plan through both rules: exists + INSET in " +
      "quality_filter, INSET in gopher_quality") {
    val q = graft.operators.Pipeline
      .qualityFilter(spark, "/root/testdata/sf0.001")
    val qp = q.queryExecution.optimizedPlan.toString
    assert(qp.contains("exists(") && qp.toUpperCase.contains("INSET") &&
      !qp.contains("array_position"), qp.linesIterator.take(4).mkString)
    val g = graft.operators.Pipeline
      .gopherQuality(spark, "/root/testdata/sf0.001")
    val gp = g.queryExecution.optimizedPlan.toString
    assert(gp.toUpperCase.contains("INSET") &&
      !gp.contains("array_position"))
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
