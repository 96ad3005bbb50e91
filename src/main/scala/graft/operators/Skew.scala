package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew handling: two-phase salted aggregation. A single hot key turns
  * a groupBy into one straggler task; salting fans each key across
  * `salts` sub-keys — phase 1 aggregates on (key, salt) so the hot key's
  * rows spread over `salts` reducers, phase 2 merges the `salts` partial
  * rows per key (tiny). Works for any algebraic aggregate (sum/count/
  * min/max); AQE's skew-join handling covers joins, this covers
  * aggregation. The salt is a deterministic per-row hash — NOT rand() —
  * so retried/speculated tasks reproduce identical partials.
  */
object Skew {

  /** Deterministic row salt in [0, salts). */
  private def salt(on: Column, salts: Int): Column =
    pmod(xxhash64(on), lit(salts.toLong))

  /** Two-phase sum/count per key. `saltOn` must be a column distributing
    * rows of the same key across salts (any high-cardinality payload
    * column works). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltOn: Column, salts: Int): DataFrame =
    df.groupBy(key.as("k"), salt(saltOn, salts).as("_salt"))
      .agg(sum(value).as("_s"), count(lit(1)).as("_n"))
      .groupBy(col("k"))
      .agg(sum(col("_s")).as("total"), sum(col("_n")).as("n"))

  /** agg_having through the salted path — same oracle as the direct
    * plan: the salt must be invisible in the result. */
  def saltedAgg(s: SparkSession, dir: String): DataFrame =
    saltedSumCount(
      s.read.parquet(s"$dir/orders.parquet"),
      col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long"),
      col("o_orderkey"), salts = 8)
      .filter(col("n") >= 8)
      .select(col("k").as("o_custkey"), col("n").as("n_orders"),
        col("total").as("total_cents"))
      .orderBy("o_custkey")

  /** Salted shuffle JOIN — the aggregation trick's join twin, for when a
    * skewed key would make one join task the straggler and the build
    * side is too big to broadcast outright. The fact side gets a
    * deterministic salt in [0, salts); the dim side is replicated once
    * per salt value (explode of a literal range — dim × salts rows);
    * the join is then an equi-join on (key, salt) whose hot key spreads
    * over `salts` reducers. AQE's skew-join split handles this
    * adaptively when stats surface it; the salted form is the explicit,
    * planner-independent cure. Salt invisibility is the oracle check. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: Column, saltOn: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(saltOn, salts))
    val repDim = dim
      .withColumn("_salt", explode(array((0 until salts).map(i =>
        lit(i.toLong)): _*)))
    // shuffle_hash hint: at test scale the dim would be auto-broadcast,
    // which hides the very shuffle the salt exists to balance — at real
    // scale a broadcastable dim means you broadcast and skip salting
    saltedFact.join(repDim.hint("shuffle_hash"),
      factKey === dimKey && saltedFact("_salt") === repDim("_salt"))
  }

  /** Revenue per market segment through the salted join — orders (fact)
    * × customer (dim, replicated ×8). */
  def saltedJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = s.read.parquet(s"$dir/orders.parquet")
    val cust = s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(orders, cust, col("o_custkey"), col("c_custkey"),
        col("o_orderkey"), salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
      .orderBy("c_mktsegment")
  }

  /** Join-size estimation from Count-Min sketches — the optimizer
    * statistic that decides broadcast-vs-shuffle BEFORE paying the
    * join: |A ⋈ B| = Σₖ aₖ·bₖ is estimated by the classic CMS inner
    * product, min over hash rows of Σ_b cmsA[r][b]·cmsB[r][b] — never
    * an underestimate, and each side's sketch is 4×1024 LONG cells
    * built in one map-side-combined pass (mergeable by addition, so
    * per-partition/per-day sketches compose). md5-derived hashes make
    * the estimate itself bit-deterministic under the oracle, emitted
    * beside the exact size and the error in permille. */
  def joinSizeEstimate(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Hash60
    val D = 4
    val W = 1024L
    def sketch(df: DataFrame, key: Column): DataFrame = df
      .select(posexplode(array((0 until D).map(i =>
        pmod(md5Hash60(concat(lit(s"jse$i:"), key.cast("string"))),
          lit(W))): _*)).as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
    val orders = s.read.parquet(s"$dir/orders.parquet")
    val cust = s.read.parquet(s"$dir/customer.parquet")
    val est = sketch(orders, col("o_custkey"))
      .join(sketch(cust, col("c_custkey"))
        .withColumnRenamed("c", "c2"), Seq("r", "b"))
      .groupBy("r").agg(sum(col("c") * col("c2")).as("ip"))
      .agg(min(col("ip")).as("cms_estimate"))
    val exact = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("na"))
      .join(cust.groupBy("c_custkey").agg(count(lit(1)).as("nb")),
        col("o_custkey") === col("c_custkey"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L))
        .as("exact_size"))
    exact.crossJoin(est)
      .select(col("exact_size"), col("cms_estimate"),
        expr("(cms_estimate - exact_size) * 1000 DIV exact_size")
          .as("overcount_pm"))
  }

  val oracle: Map[String, String] = Map(
    "join_size_estimate" -> {
      def bs(src: String): String = (0 until 4).map(i =>
        s"('0x' || substr(md5('jse$i:' || $src), 1, 15))::BIGINT % 1024")
        .mkString("[", ",\n      ", "]")
      s"""WITH sa AS (SELECT r, b, count(*) AS c FROM (
         |    SELECT unnest([0, 1, 2, 3]) AS r,
         |      unnest(${bs("o_custkey")}) AS b FROM orders)
         |  GROUP BY 1, 2),
         |sb AS (SELECT r, b, count(*) AS c FROM (
         |    SELECT unnest([0, 1, 2, 3]) AS r,
         |      unnest(${bs("c_custkey")}) AS b FROM customer)
         |  GROUP BY 1, 2),
         |ip AS (SELECT sa.r, CAST(sum(sa.c * sb.c) AS BIGINT) AS ip
         |  FROM sa JOIN sb USING (r, b) GROUP BY 1),
         |est AS (SELECT CAST(min(ip) AS BIGINT) AS cms_estimate FROM ip),
         |ex AS (SELECT CAST(COALESCE(sum(na * nb), 0) AS BIGINT)
         |    AS exact_size FROM
         |  (SELECT o_custkey, count(*) AS na FROM orders GROUP BY 1) a
         |  JOIN (SELECT c_custkey, count(*) AS nb FROM customer
         |    GROUP BY 1) b ON a.o_custkey = b.c_custkey)
         |SELECT exact_size, cms_estimate,
         |  (cms_estimate - exact_size) * 1000 // exact_size
         |    AS overcount_pm
         |FROM ex, est""".stripMargin
    },
    "salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "salted_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1 HAVING count(*) >= 8
        |ORDER BY o_custkey""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "salted_agg" -> (saltedAgg _),
    "salted_join" -> (saltedJoinQuery _),
    "join_size_estimate" -> (joinSizeEstimate _)
  )
}
