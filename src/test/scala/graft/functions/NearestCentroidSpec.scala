package graft.functions

import graft.SparkTestBase
import graft.functions.VectorFunctions.{cosineSim, l2Sq}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity locks for the native NearestCentroidExpr kernel against the
  * Column-space `aggregate` fold it replaced (the r12 assignment
  * kernel — BASELINE.md r12 sf10 audit): identical argmin/argmax,
  * identical strict-compare first-wins tie-break, identical null/zero
  * handling. The fold forms below are verbatim the pre-r12
  * IvfIndex.assignCid / assignCosCid bodies — kept here as the
  * reference semantics. */
class NearestCentroidSpec extends SparkTestBase {

  private def foldL2(
      cents: Seq[(Long, Array[Float])], emb: Column): Column =
    aggregate(
      array(cents.map { case (cid, cv) =>
        struct(lit(cid).as("cid"), array(cv.map(lit(_)): _*).as("cv"))
      }: _*),
      struct(lit(Double.MaxValue).as("d"), lit(-1L).as("cid")),
      (acc, c) => {
        val dc = l2Sq(emb, c.getField("cv"))
        when(dc < acc.getField("d"),
          struct(dc.as("d"), c.getField("cid").as("cid"))).otherwise(acc)
      }).getField("cid")

  private def foldCos(
      cents: Seq[(Long, Array[Float])], emb: Column): Column =
    aggregate(
      array(cents.map { case (cid, cv) =>
        struct(lit(cid).as("cid"), array(cv.map(lit(_)): _*).as("cv"))
      }: _*),
      struct(lit(-2.0).as("c"), lit(-1L).as("cid")),
      (acc, c) => {
        val cc = cosineSim(emb, c.getField("cv"))
        when(cc > acc.getField("c"),
          struct(cc.as("c"), c.getField("cid").as("cid"))).otherwise(acc)
      }).getField("cid")

  private def native(cents: Seq[(Long, Array[Float])], emb: Column,
      cosine: Boolean): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(graft.expr.NearestCentroidExpr(
      toExpr(emb.cast("array<double>")),
      cents.map(_._1).toArray,
      cents.map(_._2.map(_.toDouble)).toArray,
      cosine))
  }

  private def corpus = spark.read
    .parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def seedCents(k: Int): Seq[(Long, Array[Float])] =
    corpus.orderBy("vec_id").limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  test("native L2 assignment == the aggregate fold on the corpus") {
    val cents = seedCents(16)
    val d = corpus
      .withColumn("f", foldL2(cents, col("embedding")))
      .withColumn("n", native(cents, col("embedding"), cosine = false))
    assert(d.filter(col("f") =!= col("n")).count() === 0)
  }

  test("native cosine assignment == the aggregate fold on the corpus") {
    val cents = seedCents(16)
    val d = corpus
      .withColumn("f", foldCos(cents, col("embedding")))
      .withColumn("n", native(cents, col("embedding"), cosine = true))
    assert(d.filter(col("f") =!= col("n")).count() === 0)
  }

  test("adversarial vectors: ties, scaled copies, zero vector, NaN") {
    // centroid 1 ≡ centroid 0 ×2 (cosine tie — lower cid must win),
    // centroid 3 ≡ centroid 2 (exact duplicate — L2 AND cosine tie)
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val cents: Seq[(Long, Array[Float])] = Seq(
      10L -> base,
      11L -> base.map(_ * 2f),
      12L -> Array.tabulate(8)(i => (8 - i).toFloat),
      13L -> Array.tabulate(8)(i => (8 - i).toFloat),
      14L -> Array.fill(8)(0f))
    val rows: Seq[(Long, Seq[Float])] = Seq(
      1L -> base.toSeq,                 // exact hit on the tied pair
      2L -> base.map(_ * 4f).toSeq,     // scaled copy of the tied pair
      3L -> Seq(8f, 7f, 6f, 5f, 4f, 3f, 2f, 1f), // dup-centroid tie
      4L -> Seq.fill(8)(0f),            // zero vector (cosine null-skip)
      5L -> Seq(Float.NaN, 1f, 1f, 1f, 1f, 1f, 1f, 1f), // NaN poison
      6L -> Seq.fill(8)(1f))
    import spark.implicits._
    val df = rows.toDF("id", "embedding")
    for (cosine <- Seq(false, true)) {
      val fold = if (cosine) foldCos(cents, col("embedding"))
                 else foldL2(cents, col("embedding"))
      val got = df
        .withColumn("f", fold)
        .withColumn("n", native(cents, col("embedding"), cosine))
        .orderBy("id")
      assert(got.filter(col("f") =!= col("n")).count() === 0,
        s"cosine=$cosine mismatch: ${got.collect().mkString(", ")}")
    }
  }

  test("null element and null array reproduce the fold's -1 init cid") {
    val cents: Seq[(Long, Array[Float])] =
      Seq(0L -> Array.fill(4)(1f), 1L -> Array.fill(4)(2f))
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(1.0F, 2.0F, NULL, 4.0F)),
        |  (2L, CAST(NULL AS ARRAY<FLOAT>)),
        |  (3L, array(1.0F, 2.0F, 3.0F, 4.0F))
        |AS t(id, embedding)""".stripMargin)
    for (cosine <- Seq(false, true)) {
      val out = df
        .withColumn("n", native(cents, col("embedding"), cosine))
        .orderBy("id").collect().map(_.getLong(2)).toSeq
      assert(out.take(2) === Seq(-1L, -1L), s"cosine=$cosine got $out")
      assert(out(2) >= 0L)
    }
  }

  test("CosineDupRemovedExpr == composed pair expansion + filter + distinct") {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    // clusters with planted structure: scaled copies (cos == 1 both
    // ways), near-misses, a zero vector, a NaN vector
    val rows: Seq[(Long, Long, Seq[Float])] = Seq(
      (1L, 0L, Seq(1f, 2f, 3f, 4f)),
      (2L, 0L, Seq(2f, 4f, 6f, 8f)),      // ×2 of id 1 → removed
      (3L, 0L, Seq(4f, 3f, 2f, 1f)),      // different direction
      (4L, 0L, Seq(0f, 0f, 0f, 0f)),      // zero vector: null cosine
      (5L, 0L, Seq(8f, 6f, 4f, 2f)),      // ×2 of id 3 → removed
      (6L, 1L, Seq(Float.NaN, 1f, 1f, 1f)), // NaN...
      (7L, 1L, Seq(1f, 1f, 1f, 1f)),      // NaN cos vs 6 → removed (nan-safe >=)
      (8L, 2L, Seq(5f, 5f, 5f, 5f)))      // singleton-ish cluster pair base
    import spark.implicits._
    val df = rows.toDF("id", "cid", "embedding")
    val ms = df.groupBy("cid")
      .agg(collect_list(struct(col("id"),
        col("embedding").cast("array<double>").as("emb"))).as("ms"))
    val nativeIds = ms
      .select(explode(toCol(graft.expr.CosineDupRemovedExpr(
        toExpr(col("ms")), 0.99))).as("id"))
      .collect().map(_.getLong(0)).toSet
    val composedIds = ms
      .select(explode(flatten(transform(col("ms"), a =>
        transform(filter(col("ms"), b => b("id") > a("id")), b =>
          struct(a("id").as("id_a"), b("id").as("id_b"),
            a("emb").as("emb_a"), b("emb").as("emb_b"))))))
        .as("p"))
      .filter(cosineSim(col("p.emb_a"), col("p.emb_b")) >= 0.99)
      .select(col("p.id_b")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(nativeIds === composedIds)
    assert(nativeIds === Set(2L, 5L, 7L))
  }

  test("interpreted eval path matches codegen") {
    val cents = seedCents(8)
    val withCodegen = corpus
      .withColumn("n", native(cents, col("embedding"), cosine = true))
      .orderBy("vec_id").collect().map(_.getLong(2)).toSeq
    val e = graft.expr.NearestCentroidExpr(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true),
      cents.map(_._1).toArray,
      cents.map(_._2.map(_.toDouble)).toArray,
      cosine = true)
    val interpreted = corpus.orderBy("vec_id").collect().map { r =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        r.getSeq[Float](1).map(_.toDouble).toArray)
      e.assign(arr)
    }.toSeq
    assert(interpreted === withCodegen)
  }
}
