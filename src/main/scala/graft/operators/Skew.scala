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

  val oracle: Map[String, String] = Map(
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
    "salted_join" -> (saltedJoinQuery _)
  )
}
