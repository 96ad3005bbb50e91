package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity-search operator family over `embeddings` (ARRAY<FLOAT> dim
  * 64): exact brute-force top-k (the correctness superset of the
  * reference's HNSW ef=200 search, /root/reference/db/db.go:137), the
  * pre-filtered variant (reference's bitmap-predicate ANN), cosine top-k,
  * and an IVF-style bucketed path — the 100 TB scale story: a broadcast
  * centroid assignment prunes the candidate set to `nprobe` buckets, so
  * the full-scan cost is paid only by a fraction of partitions.
  *
  * Brute-force top-k compiles to TakeOrderedAndProject: per-partition
  * bounded heaps + driver merge of k·partitions rows — no global sort at
  * any scale. The IVF bucket table would be written bucketed-by(cid) in
  * production so probes prune at the file level.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Query-vector DataFrame (1 row) — broadcast, never collected. */
  private def qv(s: SparkSession, dir: String, id: Long): DataFrame =
    emb(s, dir).filter(col("vec_id") === id)
      .select(col("embedding").as("qv"))

  /** Exact L2 top-k to vec 0 (itself excluded). */
  def knnL2(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).crossJoin(broadcast(qv(s, dir, 0)))
      .filter(col("vec_id") =!= 0)
      .withColumn("d", l2Sq(col("embedding"), col("qv")))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select("vec_id", "label")

  /** Pre-filtered ANN parity: metadata predicate first, then top-k among
    * survivors (the reference's filter∧kNN composite, db/db.go:111-143). */
  def knnL2Filtered(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).crossJoin(broadcast(qv(s, dir, 0)))
      .filter(col("vec_id") =!= 0 && col("label").isin(1, 3, 5))
      .withColumn("d", l2Sq(col("embedding"), col("qv")))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select("vec_id", "label")

  /** Cosine top-k (extension metric). */
  def knnCosine(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).crossJoin(broadcast(qv(s, dir, 1)))
      .filter(col("vec_id") =!= 1)
      .withColumn("sim", cosineSim(col("embedding"), col("qv")))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
      .select("vec_id", "label")

  /** IVF-style ANN: fixed deterministic centroids (vec_id < 16 — in
    * production these come from seeded KMeans; fixed ids keep the oracle
    * replicable), nearest-centroid assignment, probe the 4 centroids
    * closest to the query, exact top-10 within probed buckets. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val q = qv(s, dir, 77)

    val probes = cents.crossJoin(broadcast(q))
      .withColumn("dq", l2Sq(col("cv"), col("qv")))
      .orderBy(col("dq").asc, col("cid").asc)
      .limit(4)
      .select("cid")

    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("dc").asc, col("cid").asc)
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("dc", l2Sq(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("embedding"), col("cid"))

    assigned.join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= 77)
      .crossJoin(broadcast(q))
      .withColumn("d", l2Sq(col("embedding"), col("qv")))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select("vec_id", "label")
  }

  /** DuckDB-side squared L2 between two FLOAT[] lists, double math,
    * index order — mirrors VectorFunctions.l2Sq. */
  private def sqlL2(a: String, b: String): String =
    s"list_sum([($a[i]::DOUBLE - $b[i]::DOUBLE)*($a[i]::DOUBLE - $b[i]::DOUBLE) for i in generate_series(1,64)])"

  private def sqlDot(a: String, b: String): String =
    s"list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE for i in generate_series(1,64)])"

  val oracle: Map[String, String] = Map(
    "knn_l2" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY ${sqlL2("embedding", "qv")} ASC, vec_id ASC LIMIT 10""".stripMargin,
    "knn_l2_filtered" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label FROM embeddings, q
         |WHERE vec_id <> 0 AND label IN (1,3,5)
         |ORDER BY ${sqlL2("embedding", "qv")} ASC, vec_id ASC LIMIT 10""".stripMargin,
    "knn_cosine" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
         |SELECT vec_id, label FROM embeddings, q WHERE vec_id <> 1
         |ORDER BY ${sqlDot("embedding", "qv")} /
         |  (sqrt(${sqlDot("embedding", "embedding")}) * sqrt(${sqlDot("qv", "qv")}))
         |  DESC, vec_id ASC LIMIT 10""".stripMargin,
    "ann_ivf" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 77),
         |cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
         |probes AS (
         |  SELECT cid FROM cents, q
         |  ORDER BY ${sqlL2("cv", "qv")} ASC, cid ASC LIMIT 4),
         |assigned AS (
         |  SELECT vec_id, label, embedding, cid FROM (
         |    SELECT e.vec_id, e.label, e.embedding, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqlL2("e.embedding", "c.cv")} ASC, c.cid ASC) AS rn
         |    FROM embeddings e, cents c) WHERE rn = 1)
         |SELECT vec_id, label FROM assigned, q
         |WHERE cid IN (SELECT cid FROM probes) AND vec_id <> 77
         |ORDER BY ${sqlL2("embedding", "qv")} ASC, vec_id ASC LIMIT 10""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_l2" -> (knnL2 _),
    "knn_l2_filtered" -> (knnL2Filtered _),
    "knn_cosine" -> (knnCosine _),
    "ann_ivf" -> (annIvf _)
  )
}
