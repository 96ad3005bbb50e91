package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-geometry operators whose MATH is exact-integer so the whole
  * distributed computation is oracle-replicable bit-for-bit:
  *
  *  - [[kmeansStep]] — one full Lloyd iteration (assign + centroid
  *    recompute) over micro-quantized vectors. The production fitter
  *    ([[IvfIndex.kmeansFit]] / [[IvfIndex.kmeansFitMl]]) runs the same
  *    two jobs per round in float math; this gate pins the distributed
  *    shape (broadcast-argmin assignment with ZERO shuffle, then one
  *    partial-aggregated groupBy) under the DuckDB hash by quantizing
  *    every coordinate to integer micros first — integer sums are
  *    order-independent, so Spark's partial aggregation and DuckDB's
  *    serial fold agree exactly.
  *  - [[embedProject]] — Johnson-Lindenstrauss-style signed random
  *    projection 64→16 dims (the dimensionality-reduction front end a
  *    100 TB ANN pipeline puts before indexing: 4× fewer bytes per
  *    vector, map-side only), then brute-force top-k by integer dot
  *    product in the projected space. The sign matrix derives from a
  *    hash of (i, j), so both engines synthesize the identical matrix
  *    with no stored state.
  *
  * Scale: quantization, assignment, and projection are per-row codegen'd
  * expressions — no shuffle until the k-sized aggregate (kmeans) or the
  * TakeOrderedAndProject heap (top-k). The centroid recompute explodes
  * rows×dim values, which is the same data volume as the input vectors
  * themselves (linear), partial-aggregated map-side before the one
  * shuffle on (cid, pos).
  */
object Cluster {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Quantization scale: 1e6 (integer micros per unit). Embedding
    * coordinates are |x| < ~2, so quantized values are < 2^21 and a
    * 64-dim squared L2 distance stays < 2^46 — exact in LONG. */
  private val Q = 1000000L

  /** Number of seed centroids for the Lloyd step (vec_id < K). */
  private val K = 8

  /** Projected dimensionality for [[embedProject]]. */
  private val ProjDim = 16

  /** round(x · 1e6) per element — exact integer embedding, identical in
    * Spark and DuckDB (both round half away from zero; float→double is
    * exact, and the ·1e6 product is correctly rounded IEEE on both). */
  private def quant(c: Column): Column =
    transform(c, x => round(x.cast("double") * Q).cast("long"))

  /** Nearest-seed assignment over quantized vectors: integer squared L2,
    * strict `<` keeps the LOWEST cid on ties — the same tie-break as an
    * ORDER BY d2, cid row_number. Pure codegen'd fold over a literal
    * seed array: zero shuffle, the exact [[IvfIndex.assignCid]] shape.
    * [[assignStruct]] exposes the winning (d, cid) pair so the trainer
    * can read the distance without a second fold. */
  private def assignStruct(seeds: Seq[(Long, Array[Long])],
      qe: Column): Column =
    aggregate(
      array(seeds.map { case (cid, cv) =>
        struct(lit(cid).as("cid"), array(cv.map(lit(_)): _*).as("cv"))
      }: _*),
      struct(lit(Long.MaxValue).as("d"), lit(-1L).as("cid")),
      (acc, c) => {
        val d = aggregate(
          zip_with(qe, c.getField("cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (x, y) => x + y)
        when(d < acc.getField("d"),
          struct(d.as("d"), c.getField("cid").as("cid"))).otherwise(acc)
      })

  private def assignQ(seeds: Seq[(Long, Array[Long])], qe: Column): Column =
    assignStruct(seeds, qe).getField("cid")

  /** One distributed Lloyd iteration from the K lowest-vec_id seeds:
    * per-cluster size and the recomputed centroid (per-dim floor of the
    * exact integer mean, emitted as a space-joined string — scalar
    * columns only, so the oracle compare can sort rows). */
  def kmeansStep(s: SparkSession, dir: String): DataFrame = {
    val qe = emb(s, dir)
      .select(col("vec_id"), quant(col("embedding")).as("qe"))
    // K-sized bounded collect — the seed fixture, same pattern as the
    // IVF centroid reads (IvfIndex.readCentroids)
    val seeds = qe.filter(col("vec_id") < K).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    val assigned = qe
      .withColumn("cid", assignQ(seeds, col("qe")))
    val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("n"))
    // exact integer per-dim sums (order-independent), then floor-mean;
    // floor(double-division) is exact here: |sum| < 2^53 so the
    // correctly-rounded quotient floors identically in both engines
    val means = assigned
      .select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
        .cast("long").as("mq"))
      .groupBy("cid")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("mq")))),
        x => x("mq").cast("string")), " ").as("centroid"))
    sizes.join(means, "cid")
      .select("cid", "n", "centroid").orderBy("cid")
  }

  /** Rounds the multi-round trainer runs. */
  private val TrainRounds = 3

  /** FULL KMeans training oracle-checked over [[TrainRounds]] Lloyd
    * rounds — the production fitter ([[IvfIndex]]) run shape with every
    * round's centroids exact-integer: assign (broadcast argmin, zero
    * shuffle) → per-dim floor-mean recompute → K-sized driver collect
    * feeds the next round's literal centroids (the same bounded-fixture
    * pattern as the per-round BPE argmax). Empty clusters KEEP their
    * previous centroid (the standard Lloyd convention, also what
    * [[Quantize]]'s trained-PQ uses). Output: per final cluster its
    * size, exact-integer SSE, and the centroid. SSE stays in LONG here
    * (d² < 2^46 per row); at trillion-row scale the sum column is the
    * one operand that would move to DECIMAL. */
  def kmeansTrain(s: SparkSession, dir: String): DataFrame = {
    val qe = emb(s, dir)
      .select(col("vec_id"), quant(col("embedding")).as("qe"))
      .localCheckpoint(true) // reused by every round + the final pass
    var cents: Seq[(Long, Array[Long])] =
      qe.filter(col("vec_id") < K).orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    for (_ <- 1 to TrainRounds) {
      val means = qe
        .withColumn("cid", assignQ(cents, col("qe")))
        .select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
          .cast("long").as("mq"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("mq"))))
          .as("cv"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toArray)
        .toMap
      cents = cents.map { case (cid, prev) =>
        (cid, means.getOrElse(cid, prev))
      }
    }
    val fin = qe.withColumn("a", assignStruct(cents, col("qe")))
      .select(col("a.cid").as("cid"), col("a.d").as("d2"))
    val centStr = cents.map { case (cid, cv) =>
      (cid, cv.mkString(" "))
    }.toMap
    val centLit = map(centStr.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v))
    }: _*)
    fin.groupBy("cid")
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("sse"))
      .withColumn("centroid", element_at(centLit, col("cid")))
      .orderBy("cid")
  }

  private def kmeansTrainOracle: String = {
    def l2(a: String, b: String): String =
      s"""list_sum([($a[i]-$b[i])*($a[i]-$b[i])
         |    for i in generate_series(1,64)])""".stripMargin
    val rounds = (1 to TrainRounds).map { r =>
      val p = r - 1
      s"""d$r AS (SELECT q.vec_id, c.cid,
         |    ${l2("q.qe", "c.cv")} AS d2
         |  FROM q, c$p c),
         |a$r AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, cid) AS rn FROM d$r) WHERE rn = 1),
         |e$r AS (SELECT a.cid, unnest(q.qe) AS v,
         |    unnest(generate_series(1,64)) AS pos
         |  FROM a$r a JOIN q USING (vec_id)),
         |mm$r AS (SELECT cid, pos,
         |    floor(sum(v)::DOUBLE / count(*))::BIGINT AS mq
         |  FROM e$r GROUP BY 1, 2),
         |m$r AS (SELECT cid, list(mq ORDER BY pos) AS cv
         |  FROM mm$r GROUP BY 1),
         |c$r AS MATERIALIZED (SELECT p.cid, COALESCE(m.cv, p.cv) AS cv
         |  FROM c$p p LEFT JOIN m$r m USING (cid))""".stripMargin
    }.mkString(",\n")
    val f = TrainRounds + 1
    s"""WITH q AS MATERIALIZED (SELECT vec_id,
       |    [round(x::DOUBLE * $Q)::BIGINT for x in embedding] AS qe
       |  FROM embeddings),
       |c0 AS MATERIALIZED (SELECT vec_id AS cid, qe AS cv FROM q
       |  WHERE vec_id < $K),
       |$rounds,
       |df AS (SELECT q.vec_id, c.cid, ${l2("q.qe", "c.cv")} AS d2
       |  FROM q, c$TrainRounds c),
       |af AS (SELECT vec_id, cid, d2 FROM (
       |    SELECT vec_id, cid, d2, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM df)
       |  WHERE rn = 1)
       |SELECT a.cid, count(*) AS n, CAST(sum(a.d2) AS BIGINT) AS sse,
       |  array_to_string([x::VARCHAR for x in c.cv], ' ') AS centroid
       |FROM af a JOIN c$TrainRounds c USING (cid)
       |GROUP BY a.cid, c.cv ORDER BY a.cid""".stripMargin
  }

  /** Quantize + signed-project in ONE native call
    * ([[graft.expr.SignedProjExpr]]): proj[j] = Σ_i round(x_i·1e6) ·
    * sign(i, j), |proj[j]| < 64·2^21 = 2^27, exact LONG math. The
    * native kernel replaced both an interpreted nested-HOF form (per-row
    * lambda evaluation, ~18× slower) and a flat projDim×dim expression
    * tree (whose one-time Janino compile dominated cold runs); the sign
    * mixer and rounding are bit-identical to the DuckDB oracle. */
  private def project(embF: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(graft.expr.SignedProjExpr(toExpr(embF), ProjDim))
  }

  /** Top-10 by integer dot product in the projected space against the
    * projection of vec 0 (itself excluded). Scores stay exact in LONG:
    * |Σ_j proj·projq| < 16·2^54 — within 2^63. The candidate side never
    * shuffles; the ranking is a TakeOrderedAndProject heap. */
  def embedProject(s: SparkSession, dir: String): DataFrame = {
    val p = emb(s, dir)
      .select(col("vec_id"),
        project(col("embedding")).as("pv"))
    val q = p.filter(col("vec_id") === 0).select(col("pv").as("qpv"))
    p.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .withColumn("score", (1 to ProjDim).map(j =>
        element_at(col("pv"), j) * element_at(col("qpv"), j))
        .reduce(_ + _))
      .orderBy(col("score").desc, col("vec_id").asc).limit(10)
      .select("vec_id", "score")
  }

  /** Per-dimension SUFFICIENT STATISTICS over the quantized corpus —
    * the distributed form of feature standardization (z-scoring before
    * clustering/ANN): (n, Σq, Σq²) per dimension, all exact LONG (Σq²
    * ≤ rows·2^42 — overflow-safe far past this scale), plus the exact
    * floor-mean. Sufficient stats MERGE BY ADDITION across partitions
    * and batches (the same contract as the histogram sketch), so the
    * 100 TB path is one posexplode (the input's own volume) into a
    * 64-row partial-aggregated groupBy; the standardization itself is
    * then per-row arithmetic against the broadcast 64-row table. */
  def embedStats(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(posexplode(quant(col("embedding"))).as(Seq("pos", "q")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
        sum(col("q") * col("q")).as("s2"))
      .withColumn("mean_q",
        floor(col("s1").cast("double") / col("n")).cast("long"))
      .select(col("pos").cast("long").as("pos"), col("n"),
        col("s1"), col("s2"), col("mean_q"))
      .orderBy("pos")

  /** Embedding-distribution DRIFT between two corpus slices — the
    * "did the new batch's embedding space move" monitor: cosine²
    * between the slices' SUM vectors (direction of the mean — the n
    * factors cancel in cosine), kept EXACT: centi-quantized components
    * (drift is a distribution-level metric; centi precision keeps
    * every cross-multiplied product inside DECIMAL(38), where the
    * µ-quantization the per-vector gates use would overflow it), dims
    * summed in LONG, the final (Σab)²·10⁶/(Σa²·Σb²) in DECIMAL.
    * Scale bound: (Σab)²·10⁶ fits DECIMAL(38,0) while per-slice sum
    * vectors stay under ~10¹⁵ centi-units per dim (≈10¹³ vectors of
    * unit norm) — past that, non-ANSI Spark decimal returns NULL
    * silently where the HUGEINT oracle errors; shard slices first.
    * Scale: one posexplode + a 64-row-per-slice aggregation — sum
    * vectors merge by addition, the incremental-monitor contract. */
  def embedDrift(s: SparkSession, dir: String): DataFrame = {
    val q = emb(s, dir)
      .select((col("vec_id") % 2).as("slice"),
        posexplode(expr(
          "transform(embedding," +
            " x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT))"))
          .as(Seq("pos", "v")))
      .groupBy("slice", "pos").agg(sum(col("v")).as("sv"))
    val a = q.filter(col("slice") === 0)
      .select(col("pos"), col("sv").as("av"))
    val b = q.filter(col("slice") === 1)
      .select(col("pos"), col("sv").as("bv"))
    a.join(b, "pos")
      .agg(count(lit(1)).as("dims"),
        sum(col("av") * col("bv")).as("ab"),
        sum(col("av") * col("av")).as("aa"),
        sum(col("bv") * col("bv")).as("bb"))
      .withColumn("cos2_ppm", expr(
        "CAST((CAST(ab AS DECIMAL(38,0)) * ab * 1000000)" +
          " DIV (CAST(aa AS DECIMAL(38,0)) * bb) AS BIGINT)"))
      .select("dims", "ab", "cos2_ppm")
  }

  val oracle: Map[String, String] = Map(
    "embed_drift" ->
      """WITH q AS (SELECT vec_id % 2 AS slice,
        |    unnest([round(x::DOUBLE * 100)::BIGINT for x in embedding])
        |      AS v,
        |    unnest(generate_series(0, 63)) AS pos
        |  FROM embeddings),
        |sv AS (SELECT slice, pos, CAST(sum(v) AS BIGINT) AS sv
        |  FROM q GROUP BY 1, 2),
        |j AS (SELECT a.sv AS av, b.sv AS bv
        |  FROM (SELECT * FROM sv WHERE slice = 0) a
        |  JOIN (SELECT * FROM sv WHERE slice = 1) b USING (pos)),
        |t AS (SELECT count(*) AS dims,
        |    CAST(sum(av * bv) AS BIGINT) AS ab,
        |    CAST(sum(av * av) AS BIGINT) AS aa,
        |    CAST(sum(bv * bv) AS BIGINT) AS bb FROM j)
        |SELECT dims, ab,
        |  CAST(ab::HUGEINT * ab * 1000000 // (aa::HUGEINT * bb)
        |    AS BIGINT) AS cos2_ppm
        |FROM t""".stripMargin,
    "kmeans_train" -> kmeansTrainOracle,
    "embed_stats" ->
      s"""WITH q AS (SELECT
         |    [round(x::DOUBLE * $Q)::BIGINT for x in embedding] AS qe
         |  FROM embeddings),
         |ex AS (SELECT unnest(qe) AS v,
         |    unnest(generate_series(0, 63)) AS pos FROM q)
         |SELECT CAST(pos AS BIGINT) AS pos, count(*) AS n,
         |  CAST(sum(v) AS BIGINT) AS s1,
         |  CAST(sum(v * v) AS BIGINT) AS s2,
         |  CAST(floor(sum(v)::DOUBLE / count(*)) AS BIGINT) AS mean_q
         |FROM ex GROUP BY pos ORDER BY pos""".stripMargin,
    "kmeans_step" ->
      s"""WITH q AS (SELECT vec_id,
         |    [round(x::DOUBLE * $Q)::BIGINT for x in embedding] AS qe
         |  FROM embeddings),
         |s AS (SELECT vec_id AS cid, qe AS cv FROM q WHERE vec_id < $K),
         |d AS (SELECT q.vec_id, s.cid,
         |    list_sum([(q.qe[i]-s.cv[i])*(q.qe[i]-s.cv[i])
         |      for i in generate_series(1,64)]) AS d2
         |  FROM q CROSS JOIN s),
         |asn AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid)
         |        AS rn
         |    FROM d) WHERE rn = 1),
         |ex AS (SELECT a.cid, unnest(q.qe) AS v,
         |    unnest(generate_series(1,64)) AS pos
         |  FROM asn a JOIN q USING (vec_id)),
         |m AS (SELECT cid, pos,
         |    floor(sum(v)::DOUBLE / count(*))::BIGINT AS mq
         |  FROM ex GROUP BY 1, 2),
         |n AS (SELECT cid, count(*) AS n FROM asn GROUP BY 1)
         |SELECT n.cid, n.n,
         |  string_agg(m.mq::VARCHAR, ' ' ORDER BY m.pos) AS centroid
         |FROM n JOIN m USING (cid) GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "embed_project" ->
      s"""WITH q AS (SELECT vec_id,
         |    [round(x::DOUBLE * $Q)::BIGINT for x in embedding] AS qe
         |  FROM embeddings),
         |p AS (SELECT vec_id,
         |    [list_sum([qe[i] * (CASE WHEN
         |        (i*73856093 + j*19349663) % 97 < 48
         |        THEN 1 ELSE -1 END) for i in generate_series(1,64)]
         |      )::BIGINT for j in generate_series(1,$ProjDim)] AS pv
         |  FROM q),
         |qq AS (SELECT pv AS qpv FROM p WHERE vec_id = 0)
         |SELECT p.vec_id,
         |  list_sum([p.pv[j] * qq.qpv[j]
         |    for j in generate_series(1,$ProjDim)])::BIGINT AS score
         |FROM p, qq WHERE p.vec_id <> 0
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmeans_step" -> (kmeansStep _),
    "kmeans_train" -> (kmeansTrain _),
    "embed_project" -> (embedProject _),
    "embed_stats" -> (embedStats _),
    "embed_drift" -> (embedDrift _)
  )
}
