package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert — the Mongo `$merge` / ANSI `MERGE INTO` shape, as a
  * pure DataFrame transform: no Delta/iceberg table format required,
  * the merged result is written back as ordinary parquet.
  *
  * Reference surface: the kaer API mutates collections row-wise
  * (update($set)/delete, /root/reference/db/db.go:111-147 delegates to
  * FerretDB's update path); $merge is the BULK form of the same
  * contract — a whole frame of changes applied by key in ONE pass.
  *
  * Semantics (Mongo $merge naming):
  *  - whenMatched:  "replace" (source wins), "keepExisting" (target
  *    wins), "merge" (per-column coalesce: source value unless null),
  *    "newerWins" (version-aware: the greater `versionCol` survives —
  *    commutative/idempotent, the CDC sink mode), "fail" (loud error
  *    if ANY key matches)
  *  - whenNotMatched: "insert" (new rows appended), "discard" (source
  *    rows without a match dropped), "fail" (loud error)
  *
  * Scale shape: ONE full-outer shuffle join on the key — both sides
  * hash-partition by key, no broadcast assumption (the target is the
  * big side by construction), no driver materialization. Non-key
  * columns ride inside a packed struct so arbitrary schemas work
  * without column-name gymnastics; both frames must share the schema
  * (checked loudly — $merge's "on" fields must exist both sides).
  * Merge keys must be non-null: a null key matches nothing in Mongo
  * and silently duplicates here, so it is rejected up front.
  */
object Upsert {

  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
      whenMatched: String = "replace",
      whenNotMatched: String = "insert",
      versionCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val cols = target.columns.toSeq
    require(source.columns.toSeq == cols,
      s"upsert frames must share a schema: target=$cols " +
        s"source=${source.columns.toSeq}")
    for (k <- keys) require(cols.contains(k), s"missing key column: $k")
    val rest = cols.filterNot(keys.contains)
    def packed(df: DataFrame, as: String): DataFrame = {
      val withCheck = keys.foldLeft(df)((d, k) =>
        d.withColumn(k, assertNullFree(col(k), k)))
      withCheck.select(keys.map(col) :+
        struct(rest.map(col): _*).as(as): _*)
    }
    val j = packed(target, "_t")
      .join(packed(source, "_s"), keys, "full_outer")
    val matched = col("_t").isNotNull && col("_s").isNotNull
    val onlyT = col("_s").isNull
    def field(side: String): Seq[Column] =
      rest.map(f => col(s"$side.$f").as(f))
    val resolved: Seq[Column] = whenMatched match {
      case "replace" => rest.map(f =>
        when(onlyT, col(s"_t.$f")).otherwise(col(s"_s.$f")).as(f))
      case "keepExisting" => rest.map(f =>
        when(col("_t").isNotNull, col(s"_t.$f"))
          .otherwise(col(s"_s.$f")).as(f))
      case "merge" => rest.map(f =>
        when(matched, coalesce(col(s"_s.$f"), col(s"_t.$f")))
          .when(onlyT, col(s"_t.$f")).otherwise(col(s"_s.$f")).as(f))
      case "fail" => rest.map(f =>
        when(matched, raise_error(concat(
            lit("upsert whenMatched=fail hit a matching key: "),
            concat_ws(",", keys.map(k => col(k).cast("string")): _*)))
            .cast(target.schema(f).dataType))
          .when(onlyT, col(s"_t.$f")).otherwise(col(s"_s.$f")).as(f))
      case "newerWins" =>
        // the CDC-correct mode: the matched row with the GREATER version
        // survives (ties → source), so applying updates is commutative
        // across arrival order and idempotent under at-least-once
        // re-delivery — "replace" silently trusts arrival order instead
        val v = versionCol.getOrElse(throw new IllegalArgumentException(
          "whenMatched=newerWins requires versionCol"))
        require(rest.contains(v),
          s"versionCol must be a shared non-key column: $v")
        // a null version on EITHER matched side fails loudly — the same
        // contract as null keys. Silently, null >= x is null and the
        // comparison would fall through to the target branch, biasing
        // resolution toward the target exactly on the malformed CDC rows
        // (missing versions) where the user most needs the loud signal.
        def versioned(side: String): Column =
          when(matched && col(s"$side.$v").isNull, raise_error(concat(
            lit(s"upsert newerWins: version '$v' is null on a matched " +
              "row (key "),
            concat_ws(",", keys.map(k => col(k).cast("string")): _*),
            lit(") — null versions cannot be ordered; $match them out " +
              "or backfill before merging")))
            .cast(target.schema(v).dataType))
            .otherwise(col(s"$side.$v"))
        rest.map(f =>
          when(matched && versioned("_s") >= versioned("_t"), col(s"_s.$f"))
            .when(matched, col(s"_t.$f"))
            .when(onlyT, col(s"_t.$f"))
            .otherwise(col(s"_s.$f")).as(f))
      case other => throw new IllegalArgumentException(
        s"unsupported whenMatched: $other " +
          "(replace|keepExisting|merge|fail)")
    }
    val base = j.select(keys.map(col) ++ resolved :+
      col("_t").isNull.as("_unmatched_src"): _*)
    val out = whenNotMatched match {
      case "insert" => base
      case "discard" => base.filter(!col("_unmatched_src"))
      case "fail" =>
        // the raise_error must live in a CONSUMED expression (an unused
        // column would be pruned away and never fire); when() guarantees
        // it only evaluates on the unmatched branch
        base.filter(when(col("_unmatched_src"),
          raise_error(lit("upsert whenNotMatched=fail hit an " +
            "unmatched source row")).isNotNull).otherwise(lit(true)))
      case other => throw new IllegalArgumentException(
        s"unsupported whenNotMatched: $other (insert|discard|fail)")
    }
    out.drop("_unmatched_src").select(cols.map(col): _*)
  }

  private def assertNullFree(c: Column, name: String): Column =
    when(c.isNull, raise_error(
      lit(s"upsert key '$name' must be non-null (a null key matches " +
        "nothing and would silently duplicate)"))).otherwise(c)

  /** Registered gate: target = documents with doc_id < 300, source =
    * a changed slice [200, 400) (n_chars bumped by 1000), merged on
    * doc_id with replace+insert, WRITTEN to parquet and READ BACK —
    * the sink and source sit under the oracle like the format
    * round-trip gates. Rows 200-299 must carry the bumped value
    * (replace), 300-399 appear new (insert), 0-199 survive untouched. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val target = docs.filter(col("doc_id") < 300)
    val source = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
      .withColumn("n_chars", col("n_chars") + 1000)
    val out = graft.core.Scratch.dir("upsert", dir)
    upsert(target, source, Seq("doc_id"))
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out).orderBy("doc_id")
  }

  /** Slowly-changing-dimension Type 2 build — the other half of the CDC
    * story: [[upsert]] applies changes to a snapshot; `scd2` turns the
    * full change HISTORY into versioned validity intervals
    * (valid_from/valid_to half-open, `is_current` on the last version).
    * This is the standard warehouse dimension shape (Kimball SCD2), built
    * from any keyed event stream in two window passes:
    *
    *  1. change detection — `lag(tracked)` per key over the event order
    *     drops events that repeat the previous tracked value (a re-stated
    *     attribute is not a new version);
    *  2. interval stitch — `lead(ts)` over the surviving change rows
    *     closes each version at the next version's start; the last stays
    *     open (valid_to null, is_current true). `row_number` = version.
    *
    * Scale shape: ONE hash shuffle on the key; both window passes and the
    * final stitch share the same (key × event-order) sort, so the filter
    * between them costs a local re-sort but no second Exchange. No
    * driver materialization, no self-join (the naive SCD2 formulation
    * joins the history to itself on "next change" — strictly worse).
    * Event order must be made total by a tiebreak column: with ties on
    * `ts` alone the lag/lead pairing — and therefore which duplicate
    * survives — would be nondeterministic under shuffle.
    */
  def scd2(changes: DataFrame, key: String, tracked: String, ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
    val boundary = changes
      .withColumn("_prev", lag(col(tracked), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(tracked))
    boundary
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(tracked),
        col(ts).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("version"))
  }

  /** Registered gate: the customer order-status dimension — each
    * customer's `o_orderstatus` history from `orders` (ordered by
    * o_orderdate, o_orderkey as the tiebreak) collapsed into SCD2
    * validity intervals. Oracle replays the same two window passes in
    * DuckDB. */
  def scd2Build(s: SparkSession, dir: String): DataFrame = {
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate"), col("o_orderkey"))
    scd2(orders, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
      .select(col("o_custkey").as("custkey"),
        col("o_orderstatus").as("status"),
        col("valid_from"), col("valid_to"), col("is_current"),
        col("version"))
      .orderBy("custkey", "version")
  }

  /** Point-in-time lookup against an SCD2 dimension — the join every
    * fact table needs once the dimension is versioned: each fact row
    * picks the dimension version whose `[valid_from, valid_to)` interval
    * covers the fact timestamp. The gate joins `orders` back to the
    * [[scd2Build]] dimension built from the same table, so every order
    * must land in exactly one version (its own date's) — a structural
    * invariant the row count re-proves on every run.
    *
    * Scale shape: an EQUI-join on the dimension key carries the
    * colocation (both sides hash-partition by custkey); the interval
    * predicate rides along as a post-join filter on the matched pairs,
    * never a Cartesian — a key's fact rows meet only that key's few
    * versions. This is the standard interval-lookup plan when the
    * equi-key is selective; the bucketed-range-join pattern
    * ([[graft.operators.Bucketing]]) covers the keyless case. */
  def scd2Lookup(s: SparkSession, dir: String): DataFrame = {
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val dim = scd2Build(s, dir)
    orders.join(dim,
      orders("o_custkey") === dim("custkey") &&
        orders("o_orderdate") >= dim("valid_from") &&
        (dim("valid_to").isNull ||
          orders("o_orderdate") < dim("valid_to")))
      .select(col("o_orderkey"), col("o_custkey"),
        col("status").as("status_at_order"), col("version"))
      .orderBy("o_orderkey")
  }

  /** Incremental aggregate maintenance — the materialized-view refresh
    * every warehouse runs nightly: per-customer order partials
    * (n_orders, total_cents) are built over the history BEFORE the
    * split date and persisted as the MV; the new batch (rows at/after
    * the split) is aggregated ALONE and merged into the stored
    * partials by re-aggregation. The oracle recomputes from the full
    * table, so the hash match proves merge ≡ recompute — the property
    * incremental refresh depends on.
    *
    * Scale shape: the refresh touches `|MV| + |delta|` rows, never the
    * history — the whole point at 100 TB, where the base table is
    * unreadable nightly but the MV (one row per key) and the day's
    * delta are small. count/sum partials merge by ADDITION, so the
    * merge is a union + one hash re-aggregate (map-side combinable);
    * avg, stddev, and the KMV distinct sketch ([[graft.operators
    * .Pipeline]] sketch_distinct) all carry mergeable partials the
    * same way. */
  def incrAgg(s: SparkSession, dir: String): DataFrame = {
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val split = lit("1999-01-01").cast("timestamp")
    def partials(df: DataFrame): DataFrame = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("total_cents"))
    val mv = graft.core.Scratch.dir("incr_mv", dir)
    partials(orders.filter(col("o_orderdate") < split))
      .write.mode("overwrite").parquet(mv)
    s.read.parquet(mv)
      .unionByName(partials(orders.filter(col("o_orderdate") >= split)))
      .groupBy("o_custkey")
      .agg(sum("n_orders").as("n_orders"),
        sum("total_cents").as("total_cents"))
      .orderBy("o_custkey")
  }

  val oracle: Map[String, String] = Map(
    "incr_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "scd2_lookup" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |    lag(o_orderstatus) OVER
        |      (PARTITION BY o_custkey
        |       ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (SELECT * FROM seq
        |        WHERE prev IS NULL OR prev <> o_orderstatus),
        |dim AS (SELECT o_custkey AS custkey, o_orderstatus AS status,
        |    o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER w AS valid_to,
        |    CAST(row_number() OVER w AS BIGINT) AS version
        |  FROM chg
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey))
        |SELECT o.o_orderkey, o.o_custkey,
        |  d.status AS status_at_order, d.version
        |FROM orders o JOIN dim d
        |  ON o.o_custkey = d.custkey
        | AND o.o_orderdate >= d.valid_from
        | AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
        |ORDER BY o.o_orderkey""".stripMargin,
    "scd2_build" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |    lag(o_orderstatus) OVER
        |      (PARTITION BY o_custkey
        |       ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |chg AS (SELECT * FROM seq
        |        WHERE prev IS NULL OR prev <> o_orderstatus),
        |ver AS (SELECT o_custkey, o_orderstatus, o_orderdate,
        |    CAST(row_number() OVER w AS BIGINT) AS version,
        |    lead(o_orderdate) OVER w AS valid_to
        |  FROM chg
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey))
        |SELECT o_custkey AS custkey, o_orderstatus AS status,
        |  o_orderdate AS valid_from, valid_to,
        |  valid_to IS NULL AS is_current, version
        |FROM ver ORDER BY custkey, version""".stripMargin,
    "merge_upsert" ->
      """WITH t AS (SELECT doc_id, lang, n_chars FROM documents
        |           WHERE doc_id < 300),
        |s AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars
        |      FROM documents WHERE doc_id >= 200 AND doc_id < 400)
        |SELECT doc_id,
        |  CASE WHEN s.doc_id IS NOT NULL THEN s.lang ELSE t.lang END
        |    AS lang,
        |  CASE WHEN s.doc_id IS NOT NULL THEN s.n_chars
        |       ELSE t.n_chars END AS n_chars
        |FROM t FULL OUTER JOIN s USING (doc_id)
        |ORDER BY doc_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_upsert" -> (mergeUpsert _),
    "incr_agg" -> (incrAgg _),
    "scd2_build" -> (scd2Build _),
    "scd2_lookup" -> (scd2Lookup _)
  )
}
