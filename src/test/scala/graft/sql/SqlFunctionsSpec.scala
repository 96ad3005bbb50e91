package graft.sql

import graft.SparkTestBase
import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** The SQL surface must be the SAME expressions as the Column API:
  * register, then compare SQL results bit-for-bit against Column calls. */
class SqlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("text family: SQL == Column API on real documents") {
    spark.read.parquet(s"$sf0001/documents.parquet")
      .limit(30).createOrReplaceTempView("sqlspec_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_simhash(graft_tokens(text)) AS sh,
        |  graft_fingerprint(text, 8) AS fp,
        |  graft_langid(graft_tokens(text)) AS lang_pred,
        |  graft_minhash(graft_word_ngrams(graft_tokens(text), 3), 4) AS mh
        |FROM sqlspec_docs""".stripMargin)
    val t = col("text")
    val viaCol = spark.table("sqlspec_docs").select(col("doc_id"),
      TextFunctions.simhash60(TextFunctions.tokens(t)).as("sh"),
      TextFunctions.fingerprint(t, 8).as("fp"),
      TextFunctions.langId(TextFunctions.tokens(t)).as("lang_pred"),
      TextFunctions.minhashSignature(
        TextFunctions.wordNgrams(TextFunctions.tokens(t), 3), 4).as("mh"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("vector family: SQL == Column API on embeddings") {
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(30).createOrReplaceTempView("sqlspec_emb")
    val viaSql = spark.sql(
      """SELECT vec_id, graft_l2sq(embedding, embedding) AS zero,
        |  graft_norm(embedding) AS nrm,
        |  graft_cosine_sim(embedding, embedding) AS one
        |FROM sqlspec_emb""".stripMargin)
    val e = col("embedding")
    val viaCol = spark.table("sqlspec_emb").select(col("vec_id"),
      VectorFunctions.l2Sq(e, e).as("zero"),
      VectorFunctions.norm(e).as("nrm"),
      VectorFunctions.cosineSim(e, e).as("one"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    assert(viaSql.filter(col("zero") =!= 0.0).isEmpty)
  }

  test("a full SQL kNN query runs on the registered functions") {
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("sqlspec_knn")
    val top = spark.sql(
      """SELECT e.vec_id
        |FROM sqlspec_knn e, (SELECT embedding qv FROM sqlspec_knn
        |                     WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY graft_l2sq(e.embedding, q.qv) ASC, e.vec_id ASC
        |LIMIT 5""".stripMargin).collect().map(_.getLong(0))
    val viaOp = graft.operators.Similarity.knnL2(spark, sf0001)
      .limit(5).collect().map(_.getLong(0))
    assert(top.sameElements(viaOp), top.mkString(","))
  }

  test("null elements: vector funcs return NULL; hash funcs skip, not crash") {
    val r = spark.sql(
      """SELECT
        |  graft_l2sq(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS l2n,
        |  graft_norm(array(CAST(NULL AS DOUBLE))) AS nn,
        |  graft_minhash(array('a', CAST(NULL AS STRING)), 2) AS mh,
        |  graft_simhash(array('a', CAST(NULL AS STRING))) AS sh,
        |  graft_minhash(array('a'), 2) AS mh_ref,
        |  graft_simhash(array('a')) AS sh_ref""".stripMargin).head()
    assert(r.isNullAt(0), "l2sq with null element must be NULL")
    assert(r.isNullAt(1), "norm with null element must be NULL")
    // null elements are skipped: same answer as without them
    assert(r.getSeq[String](2) == r.getSeq[String](4))
    assert(r.getLong(3) == r.getLong(5))
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), vec_id) FROM sqlspec_emb")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("graft_kmv: exact below k, estimate stable across partitioning " +
      "(serialize/merge path), duplicates never double-count") {
    import org.apache.spark.sql.functions._
    graft.sql.GraftFunctions.register(spark)
    // 40 distinct hashed values + every one duplicated: k=64 > 40 so
    // the sketch must return the EXACT distinct count, proving both
    // dedup and the below-k branch
    val df = spark.range(80).select((col("id") % 40).as("v"))
      .selectExpr("graft_hash60(CAST(v AS STRING)) AS h")
    assert(df.repartition(7).selectExpr("graft_kmv(h, 64)")
      .head().getLong(0) == 40L)
    // above k: the estimate must be IDENTICAL for 1 vs 13 partitions —
    // the TreeSet merge is order-free and the serialize path round-trips
    val big = spark.range(5000)
      .selectExpr("graft_hash60(CAST(id AS STRING)) AS h")
    val e1 = big.coalesce(1).selectExpr("graft_kmv(h, 64)").head().getLong(0)
    val e13 = big.repartition(13).selectExpr("graft_kmv(h, 64)")
      .head().getLong(0)
    assert(e1 == e13, s"$e1 vs $e13")
    // and lands within a plausible band of the true 5000
    assert(e1 > 3000 && e1 < 8000, e1.toString)
  }

  test("graft_kmv_sketch: sorted retained k-min set, partition-stable, " +
      "and its kth element reproduces graft_kmv's estimate") {
    import org.apache.spark.sql.functions._
    graft.sql.GraftFunctions.register(spark)
    val big = spark.range(5000)
      .selectExpr("graft_hash60(CAST(id AS STRING)) AS h")
    val s1 = big.coalesce(1).selectExpr("graft_kmv_sketch(h, 64) AS s")
      .head().getSeq[Long](0)
    val s13 = big.repartition(13).selectExpr("graft_kmv_sketch(h, 64) AS s")
      .head().getSeq[Long](0)
    assert(s1 == s13)
    assert(s1.length == 64 && s1 == s1.sorted)
    val est = big.selectExpr("graft_kmv(h, 64)").head().getLong(0)
    assert(math.round(63.0 * (1L << 60).toDouble / s1.last) == est)
    // below k: the sketch IS the distinct set
    val small = spark.range(10)
      .selectExpr("graft_hash60(CAST(id AS STRING)) AS h")
    assert(small.selectExpr("graft_kmv_sketch(h, 64) AS s")
      .head().getSeq[Long](0).length == 10)
  }

  test("sketchSetOps: union/intersection estimates within a plausible " +
      "band of the true overlap, intersection <= each side") {
    val r = graft.operators.Relational
      .sketchSetOps(spark, "/root/testdata/sf0.001").head()
    val (estA, estB, common, estU, estI) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    // truth at sf0.001: same ~150-user pool does every event type, so
    // A ≈ B ≈ A∪B ≈ A∩B; the estimates must sit in one band together
    assert(estU >= math.max(estA, estB) * 3 / 4, s"$estU vs $estA/$estB")
    assert(estI <= estU && estI > 0, s"$estI vs $estU")
    assert(common > 0 && common <= 64)
  }

  test("GraftExtensions injects the same builders (builder-path smoke)") {
    // full session-build injection is exercised implicitly: the class
    // only delegates to GraftFunctions.all, which the tests above cover
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
