package graft.sql

import graft.expr._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** SQL surface for the engine's custom expression family.
  *
  * Registered two ways, both standard Spark extension architecture:
  *
  *  - `spark.sql.extensions=graft.sql.GraftExtensions` at session build
  *    (the `SparkSessionExtensions.injectFunction` path — works for any
  *    downstream session, survives `newSession()`), or
  *  - [[GraftFunctions.register]] on an existing session.
  *
  * After either, every operator primitive is usable from plain SQL —
  * `SELECT graft_simhash(graft_tokens(text)) FROM docs` — and lands on
  * the SAME codegen'd expressions as the Column API (no UDF wrapping,
  * no performance cliff between the Scala and SQL surfaces). Builders
  * construct Catalyst nodes directly (a Column-wrapped body would reach
  * the plan as an unresolvable lazy node).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.sql.GraftFunctions", name),
        builder))
    }
    // whole-operator extensions (graft.plans.*) — the same strategies
    // NativeAsof.register plants on an existing session
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // optimizer extensions — GraftRules.register's session-build twin
    graft.plans.GraftRules.all.foreach(r => ext.injectOptimizerRule(_ => r))
  }
}

object GraftFunctions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def dArr(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** Same tree as TextFunctions.tokens. */
  private def tokensE(e: Expression): Expression =
    RegExpExtractAll(Lower(e), Literal("[a-z0-9]+"), Literal(0))

  /** Same tree as TextFunctions.md5Hash60. */
  private def hash60E(e: Expression): Expression =
    Cast(Conv(Substring(Md5(e), Literal(1), Literal(15)),
      Literal(16), Literal(10)), LongType)

  private def normE(e: Expression): Expression =
    Sqrt(NormSqExpr(dArr(e)))

  /** name → expression builder, for both registration paths. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // vector family (native VectorMath)
    "graft_l2sq" -> ((es: Seq[Expression]) =>
      L2SqExpr(dArr(es(0)), dArr(es(1)))),
    "graft_l2" -> ((es: Seq[Expression]) =>
      Sqrt(L2SqExpr(dArr(es(0)), dArr(es(1))))),
    "graft_dot" -> ((es: Seq[Expression]) =>
      DotExpr(dArr(es(0)), dArr(es(1)))),
    "graft_norm" -> ((es: Seq[Expression]) => normE(es.head)),
    "graft_cosine_sim" -> ((es: Seq[Expression]) =>
      Divide(DotExpr(dArr(es(0)), dArr(es(1))),
        new NullIf(Multiply(normE(es(0)), normE(es(1))), Literal(0.0)))),
    // text family (native TextHash)
    "graft_tokens" -> ((es: Seq[Expression]) => tokensE(es.head)),
    "graft_hash60" -> ((es: Seq[Expression]) => hash60E(es.head)),
    "graft_simhash" -> ((es: Seq[Expression]) => SimHash60(es.head)),
    "graft_langid" -> ((es: Seq[Expression]) => LangIdHash(es.head)),
    "graft_fingerprint" -> ((es: Seq[Expression]) =>
      FingerprintHash(es(0),
        if (es.length > 1) litInt(es(1), "fingerprint n") else 8)),
    "graft_word_ngrams" -> ((es: Seq[Expression]) =>
      WordNgramsExpr(es(0), litInt(es(1), "ngram n"))),
    "graft_minhash" -> ((es: Seq[Expression]) =>
      MinHashSig(es(0), litInt(es(1), "minhash k"))),
    "graft_minhash_shingles" -> ((es: Seq[Expression]) =>
      MinHashShingleSig(es(0), litInt(es(1), "shingle n"),
        litInt(es(2), "minhash k"))),
    "graft_hamming" -> ((es: Seq[Expression]) =>
      Cast(BitwiseCount(BitwiseXor(es(0), es(1))), LongType)),
    // native TypedImperativeAggregate: KMV distinct sketch over an
    // already-hashed long column (compose with graft_hash60)
    "graft_kmv" -> ((es: Seq[Expression]) =>
      KmvDistinctAgg(es(0), litInt(es(1), "kmv k"))
        .toAggregateExpression()),
    "graft_kmv_sketch" -> ((es: Seq[Expression]) =>
      KmvSketchAgg(es(0), litInt(es(1), "kmv k"))
        .toAggregateExpression())
  )

  /** Register every function on an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.FunctionBridge
        .register(spark, name, builder)
    }
}
