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

  val oracle: Map[String, String] = Map(
    "salted_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1 HAVING count(*) >= 8
        |ORDER BY o_custkey""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "salted_agg" -> (saltedAgg _)
  )
}
