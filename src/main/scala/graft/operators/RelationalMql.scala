package graft.operators

import graft.filter.MqlFilter
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The MQL find/aggregate gate family over events/documents —
  * split from Relational.scala in r11: a PURE MOVE into a mixin
  * trait (see RelationalTpch's note) — zero behavior change. */
private[graft] trait RelationalMql { this: Relational.type =>
  /** MQL predicate over the schemaless events.props JSON column — the
    * reference's user-facing filter language (db/db.go:111-113) evaluated
    * through the VARIANT-based JsonResolver: operator conjunction on one
    * field + $exists on a missing field. */
  def mqlEventsRange(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(MqlFilter.toColumn(
        """{"k": {"$gte": 20, "$lt": 60}, "missing": {"$exists": false}}""",
        MqlFilter.JsonResolver(col("props"))))
      .select(col("event_id"))
      .orderBy("event_id")

  /** MQL logical tree: $nor of two comparisons + field-level $not. */
  def mqlEventsNor(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(MqlFilter.toColumn(
        """{"$nor": [{"k": {"$lt": 30}}, {"k": {"$gte": 70}}],
          | "k": {"$not": {"$eq": 42}}}""".stripMargin,
        MqlFilter.JsonResolver(col("props"))))
      .select(col("event_id"))
      .orderBy("event_id")

  /** MQL date predicates — the single most common metadata filter on a
    * real corpus (crawl timestamps, ingestion dates). JSON has no date
    * type, so dates travel as ISO-8601 strings in the metadata document;
    * the filter uses Mongo extended-JSON `{"$date": "ISO"}` literals (the
    * form FerretDB accepts through the reference's delegated filter,
    * /root/reference/db/db.go:111-113) and MqlFilter compares both sides
    * as TIMESTAMP. Combined with $in on a string field and $exists so the
    * date view composes with the rest of the operator surface. */
  def mqlEventsDate(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("meta", to_json(struct(
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("created"),
        col("event_type").as("etype"))))
      .filter(MqlFilter.toColumn(
        """{"created": {"$gte": {"$date": "2024-01-10T00:00:00"},
          |             "$lt":  {"$date": "2024-01-20T12:00:00"}},
          | "etype": {"$in": ["click", "view"]},
          | "missing": {"$exists": false}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("event_id"))
      .orderBy("event_id")

  /** Mongo date OPERATOR family under the gate ($dateToString/$dayOfMonth/
    * $dateDiff over the ISO-string metadata date convention): derive
    * day-of-month and a formatted day label, filter a mid-month band,
    * group per day with the max day-index since an epoch date. The oracle
    * replays with strftime/date_diff — both engines count calendar-day
    * boundaries. */
  def mqlDatesPipeline(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("meta", to_json(struct(
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("created")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "dom": {"$dayOfMonth": "$created"},
        |   "day_label": {"$dateToString": {"format": "%Y-%m-%d",
        |     "date": "$created"}},
        |   "day_idx": {"$dateDiff": {"startDate": "2024-01-01T00:00:00",
        |     "endDate": "$created", "unit": "day"}}}},
        | {"$match": {"dom": {"$gte": 10, "$lt": 20}}},
        | {"$group": {"_id": "$day_label", "n": {"$sum": 1},
        |   "idx": {"$max": {"$toLong": "$day_idx"}}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)

  /** $dateAdd / $dateSubtract under the gate (r12) — Mongo 5.0 date
    * arithmetic on the fixed-length units: each event's deadline is
    * its timestamp + 3 days, its warning mark 90 minutes before the
    * deadline (a NESTED $dateSubtract over the $dateAdd — date
    * expressions compose), both emitted through $dateToString. The
    * oracle replays with interval arithmetic on the second-truncated
    * timestamp. Calendar units (month/quarter/year) and timezone
    * refuse loudly (MqlPipelineSpec) — variable-length arithmetic
    * cannot be engine-exact on the integer discipline. */
  def mqlDateAdd(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("created")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "due": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "$created",
        |       "unit": "day", "amount": 3}}}},
        |   "warn": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateSubtract": {
        |       "startDate": {"$dateAdd": {"startDate": "$created",
        |         "unit": "day", "amount": 3}},
        |       "unit": "minute", "amount": 90}}}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "due": 1, "warn": 1}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 200}
        |]""".stripMargin)

  /** Calendar-unit $dateAdd / $dateSubtract under the gate (r13) —
    * Mongo 5.0's month/quarter/year arithmetic with the documented
    * month-end clamp. The planted base date sweeps two years of
    * calendar (every day of 2023-2024 incl. leap Feb 29) with a
    * nonzero time-of-day, so the result set exercises clamping
    * (Jan 31 + 1 month → Feb 28/29, Feb 29 + 1 year → Feb 28) and
    * time preservation on every path. Both engines run pure
    * civil-date integer arithmetic (Spark add_months + epoch-day
    * seconds; DuckDB ts + to_months) — exact, no floats, no DST
    * (timezone stays loud). */
  def mqlDateAddCal(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("base", timestamp_seconds(
          lit(1672531200L) + (col("event_id") % 730) * 86400L +
            col("event_id") % 86399))
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"),
          date_format(col("base"), "yyyy-MM-dd'T'HH:mm:ss")
            .as("created")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "plus_m": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "$created",
        |       "unit": "month", "amount": 1}}}},
        |   "minus_q": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateSubtract": {"startDate": "$created",
        |       "unit": "quarter", "amount": 1}}}},
        |   "plus_y": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "$created",
        |       "unit": "year", "amount": 1}}}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "plus_m": 1, "minus_q": 1, "plus_y": 1}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 250}
        |]""".stripMargin)

  /** FIXED-OFFSET timezone date arithmetic under the gate (r14) —
    * Mongo 5.0's `timezone` option on the exactly-implementable
    * bracket: "+HH:MM" offsets are pure integer epoch shifts (no DST,
    * no tzdata), so calendar arithmetic runs in the shifted frame and
    * shifts back — engine-exact on both sides. The same two-year base
    * sweep as mql_date_add_cal, so near-midnight rows (where the
    * offset frame lands on a DIFFERENT civil day and a different
    * month-end clamp applies) are exercised on every path: +1 month
    * in +05:30, −1 quarter in −08:00, day-trunc in +05:30, and the
    * −08:00 wall-clock rendering. Named DST zones stay loud
    * (MqlPipelineSpec). */
  def mqlDateAddTz(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("base", timestamp_seconds(
          lit(1672531200L) + (col("event_id") % 730) * 86400L +
            col("event_id") % 86399))
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"),
          date_format(col("base"), "yyyy-MM-dd'T'HH:mm:ss")
            .as("created")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "m_tz": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "$created",
        |       "unit": "month", "amount": 1, "timezone": "+05:30"}}}},
        |   "q_tz": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateSubtract": {"startDate": "$created",
        |       "unit": "quarter", "amount": 1, "timezone": "-08:00"}}}},
        |   "tr_tz": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateTrunc": {"date": "$created",
        |       "unit": "day", "timezone": "+05:30"}}}},
        |   "lbl_tz": {"$dateToString": {"format": "%Y-%m-%d %H:%M",
        |     "date": "$created", "timezone": "-08:00"}},
        |   "dom_tz": {"$dayOfMonth": {"date": "$created",
        |     "timezone": "+05:30"}},
        |   "diff_d_tz": {"$dateDiff": {
        |     "startDate": "2023-01-01T00:00:00", "endDate": "$created",
        |     "unit": "day", "timezone": "-08:00"}},
        |   "from_tz": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateFromString": {"dateString": "$created",
        |       "timezone": "+05:30"}}}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "m_tz": 1, "q_tz": 1, "tr_tz": 1, "lbl_tz": 1,
        |   "dom_tz": {"$toLong": "$dom_tz"},
        |   "diff_d_tz": {"$toLong": "$diff_d_tz"}, "from_tz": 1}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 250}
        |]""".stripMargin)

  /** NAMED-timezone (DST) date arithmetic under the gate (r15) —
    * Mongo's `timezone: "America/New_York"` form, exact by the baked-
    * ZoneRules device: the engine resolves per-instant offsets from a
    * transition table derived ONCE from the JVM's tzdata
    * ([[graft.expr.TzTable]]), and the oracle replays the IDENTICAL
    * table (serialized into the SQL as list literals by
    * [[nyReplaySql]]) — one rules source, so the tzdata-vintage
    * divergence that kept named zones loud through r14 cannot occur.
    * Local→instant resolution is java.time's (gap → shift forward by
    * the gap; overlap → the base instant's offset when still valid,
    * else the earlier instant), implemented by the same two-probe
    * algorithm on both sides.
    *
    * The base sweep plants rows straddling all four 2023 NY windows
    * that matter: the spring-forward instant (mod-7=3), the fall-back
    * instant (mod-7=4), one day before each (mod-7=5/6 — so +1 day /
    * +1 month arithmetic LANDS in the skipped/repeated hour and the
    * gap and overlap rules are pinned under the oracle), plus the
    * plain two-year sweep. `$dateFromString` reads planted local
    * strings INSIDE the skipped hour (02:xx Mar 12 → forward shift)
    * and the repeated hour (01:xx Nov 5 → earlier instant). */
  def mqlDateTzNamed(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("base", timestamp_seconds(
          when(col("event_id") % 7 === 3,
            lit(1678597200L) + (col("event_id") % 240) * 60)
          .when(col("event_id") % 7 === 4,
            lit(1699156800L) + (col("event_id") % 240) * 60)
          .when(col("event_id") % 7 === 5,
            lit(1678510800L) + (col("event_id") % 240) * 60)
          .when(col("event_id") % 7 === 6,
            lit(1699070400L) + (col("event_id") % 240) * 60)
          .otherwise(lit(1672531200L) +
            (col("event_id") % 730) * 86400L + col("event_id") % 86399)))
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"),
          date_format(col("base"), "yyyy-MM-dd'T'HH:mm:ss")
            .as("created"),
          when(col("event_id") % 7 === 3, concat(lit("2023-03-12T02:"),
              lpad((col("event_id") % 60).cast("string"), 2, "0"),
              lit(":00")))
            .when(col("event_id") % 7 === 4, concat(lit("2023-11-05T01:"),
              lpad((col("event_id") % 60).cast("string"), 2, "0"),
              lit(":00")))
            .otherwise(date_format(col("base"),
              "yyyy-MM-dd'T'HH:mm:ss")).as("fsin")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "lbl_ny": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": "$created", "timezone": "America/New_York"}},
        |   "hr_ny": {"$hour": {"date": "$created",
        |     "timezone": "America/New_York"}},
        |   "pm_ny": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "$created",
        |       "unit": "month", "amount": 1,
        |       "timezone": "America/New_York"}}}},
        |   "pd_ny": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "$created",
        |       "unit": "day", "amount": 1,
        |       "timezone": "America/New_York"}}}},
        |   "tr_ny": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateTrunc": {"date": "$created",
        |       "unit": "day", "timezone": "America/New_York"}}}},
        |   "dd_ny": {"$dateDiff": {
        |     "startDate": "2023-01-01T00:00:00", "endDate": "$created",
        |     "unit": "day", "timezone": "America/New_York"}},
        |   "fs_ny": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateFromString": {"dateString": "$fsin",
        |       "timezone": "America/New_York"}}}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "lbl_ny": 1, "hr_ny": {"$toLong": "$hr_ny"}, "pm_ny": 1,
        |   "pd_ny": 1, "tr_ny": 1, "dd_ny": {"$toLong": "$dd_ny"},
        |   "fs_ny": 1}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 400}
        |]""".stripMargin)

  /** NAMED-timezone SUB-DAY `$dateDiff` under the gate (r17 — lifts
    * the r15 loud bracket): hour/minute/second boundary counts in
    * America/New_York as wall-clock LABEL arithmetic over the baked
    * [[graft.expr.TzTable]] offsets — each operand shifts by its OWN
    * per-instant offset and the unit indexes diff, exactly Mongo's
    * local-convert-then-truncate evaluation; the oracle replays the
    * identical transition table. The fixture plants start/end pairs
    * STRADDLING the 2023 NY spring-forward gap (the skipped 02:xx
    * labels still count — one physical hour across the jump counts 2
    * hour boundaries) and the fall-back overlap (the repeated hour
    * counts once), plus a plain off-transition sweep; `day` rides
    * along to pin the calendar unit against the same operands. */
  def mqlDateDiffTz(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("sEp",
          when(col("event_id") % 3 === 0,
            lit(1678597200L) + (col("event_id") % 120) * 60)
          .when(col("event_id") % 3 === 1,
            lit(1699156800L) + (col("event_id") % 120) * 60)
          .otherwise(lit(1672531200L) + (col("event_id") % 365) * 86400L
            + col("event_id") % 43200))
        .withColumn("eEp",
          when(col("event_id") % 3 === 0,
            lit(1678604400L) + (col("event_id") % 180) * 60)
          .when(col("event_id") % 3 === 1,
            lit(1699164000L) + (col("event_id") % 180) * 60)
          .otherwise(col("sEp") + (col("event_id") % 90000)))
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"),
          date_format(timestamp_seconds(col("sEp")),
            "yyyy-MM-dd'T'HH:mm:ss").as("s"),
          date_format(timestamp_seconds(col("eEp")),
            "yyyy-MM-dd'T'HH:mm:ss").as("e")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "dh": {"$dateDiff": {"startDate": "$s", "endDate": "$e",
        |     "unit": "hour", "timezone": "America/New_York"}},
        |   "dm": {"$dateDiff": {"startDate": "$s", "endDate": "$e",
        |     "unit": "minute", "timezone": "America/New_York"}},
        |   "ds": {"$dateDiff": {"startDate": "$s", "endDate": "$e",
        |     "unit": "second", "timezone": "America/New_York"}},
        |   "dd": {"$dateDiff": {"startDate": "$s", "endDate": "$e",
        |     "unit": "day", "timezone": "America/New_York"}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "dh": {"$toLong": "$dh"}, "dm": {"$toLong": "$dm"},
        |   "ds": {"$toLong": "$ds"}, "dd": {"$toLong": "$dd"}}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 300}
        |]""".stripMargin)

  /** Oracle twin of [[mqlDateDiffTz]]: the SAME baked NY transition
    * table as list literals; per-operand offset lookup, then the
    * identical label arithmetic for hour/minute (`//` truncation ≡
    * floor — the local epochs are positive). The second unit (r18) is
    * the raw physical-epoch difference — Mongo's dateDiffSecond never
    * consults the timezone. */
  private def ddTzReplaySql: String = {
    val tbl = graft.expr.TzTable.of("America/New_York")
    val trL = tbl.trans.drop(1).mkString("[", ",", "]")
    val osL = tbl.offs.mkString("[", ",", "]")
    def offAt(t: String) =
      s"os[len(list_filter(tr, x -> x <= ($t))) + 1]"
    s"""WITH z AS (SELECT $trL::BIGINT[] AS tr, $osL::BIGINT[] AS os),
       |b AS (SELECT event_id,
       |  (CASE WHEN event_id % 3 = 0
       |        THEN 1678597200 + (event_id % 120) * 60
       |        WHEN event_id % 3 = 1
       |        THEN 1699156800 + (event_id % 120) * 60
       |        ELSE 1672531200 + (event_id % 365) * 86400
       |          + event_id % 43200 END)::BIGINT AS st
       |  FROM events),
       |b2 AS (SELECT event_id, st,
       |  (CASE WHEN event_id % 3 = 0
       |        THEN 1678604400 + (event_id % 180) * 60
       |        WHEN event_id % 3 = 1
       |        THEN 1699164000 + (event_id % 180) * 60
       |        ELSE st + (event_id % 90000) END)::BIGINT AS et
       |  FROM b),
       |c AS (SELECT event_id, st, et,
       |    st + ${offAt("st")} AS ls, et + ${offAt("et")} AS le
       |  FROM b2, z)
       |SELECT event_id,
       |  (le // 3600) - (ls // 3600) AS dh,
       |  (le // 60) - (ls // 60) AS dm,
       |  et - st AS ds,
       |  date_diff('day', CAST(make_timestamp(ls * 1000000) AS DATE),
       |    CAST(make_timestamp(le * 1000000) AS DATE)) AS dd
       |FROM c ORDER BY event_id LIMIT 300""".stripMargin
  }

  /** Extended date parts + calendar-unit $dateDiff under the gate
    * (r15) — the rest of Mongo's part family ($dayOfWeek/$dayOfYear/
    * $isoDayOfWeek/$isoWeek/$isoWeekYear/$week/$millisecond, all
    * integer calendar arithmetic both engines compute identically;
    * $week is the strftime %U Sunday-anchored count, derived from
    * day-of-year and weekday on both sides) and $dateDiff's calendar
    * boundary counts (week with startOfWeek, month, quarter, year —
    * pure index differences). The two-year sweep crosses ISO-week-year
    * boundaries (Jan 1 2023 is a Sunday: isoWeek 52 of isoWeekYear
    * 2022); the millisecond column rides a planted fractional
    * $dateFromString (the fixture timestamps are whole seconds). One
    * part carries a fixed-offset timezone to pin the {date, timezone}
    * form on the new operators. */
  def mqlDatePartsExt(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("base", timestamp_seconds(
          lit(1672531200L) + (col("event_id") % 730) * 86400L +
            col("event_id") % 86399))
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"),
          date_format(col("base"), "yyyy-MM-dd'T'HH:mm:ss")
            .as("created"),
          concat(lit("2024-01-01T00:00:00."),
            lpad((col("event_id") % 1000).cast("string"), 3, "0"))
            .as("fsms")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "dow": {"$dayOfWeek": "$created"},
        |   "doy": {"$dayOfYear": "$created"},
        |   "idow": {"$isoDayOfWeek": "$created"},
        |   "iwk": {"$isoWeek": "$created"},
        |   "iwy": {"$isoWeekYear": "$created"},
        |   "wk": {"$week": "$created"},
        |   "dow_ist": {"$dayOfWeek": {"date": "$created",
        |     "timezone": "+05:30"}},
        |   "ms": {"$millisecond": {"$dateFromString": {
        |     "dateString": "$fsms"}}},
        |   "dd_w": {"$dateDiff": {"startDate": "2023-01-01T00:00:00",
        |     "endDate": "$created", "unit": "week"}},
        |   "dd_wm": {"$dateDiff": {"startDate": "2023-01-01T00:00:00",
        |     "endDate": "$created", "unit": "week",
        |     "startOfWeek": "monday"}},
        |   "dd_m": {"$dateDiff": {"startDate": "2023-01-01T00:00:00",
        |     "endDate": "$created", "unit": "month"}},
        |   "dd_q": {"$dateDiff": {"startDate": "2023-01-01T00:00:00",
        |     "endDate": "$created", "unit": "quarter"}},
        |   "dd_y": {"$dateDiff": {"startDate": "2023-01-01T00:00:00",
        |     "endDate": "$created", "unit": "year"}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "dow": {"$toLong": "$dow"}, "doy": {"$toLong": "$doy"},
        |   "idow": {"$toLong": "$idow"}, "iwk": {"$toLong": "$iwk"},
        |   "iwy": {"$toLong": "$iwy"}, "wk": {"$toLong": "$wk"},
        |   "dow_ist": {"$toLong": "$dow_ist"},
        |   "ms": {"$toLong": "$ms"},
        |   "dd_w": {"$toLong": "$dd_w"}, "dd_wm": {"$toLong": "$dd_wm"},
        |   "dd_m": {"$toLong": "$dd_m"}, "dd_q": {"$toLong": "$dd_q"},
        |   "dd_y": {"$toLong": "$dd_y"}}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 400}
        |]""".stripMargin)

  /** $dateFromString format/onNull/onError under the gate (r15) —
    * Mongo's format-driven parsing with the full routing surface: a
    * planted US-style string field is valid for most docs, garbage
    * every 5th (→ onError, a sentinel), missing every 7th (→ onNull,
    * the epoch); the %-format's numeric subset parses identically on
    * both engines (Spark try_to_timestamp with the converted pattern
    * ≡ DuckDB try_strptime with the %-format verbatim); a second
    * column composes format with a fixed-offset timezone (wall clock
    * → instant). Unparseable-without-onError RAISES per row (the
    * pre-r15 path surfaced Spark's ANSI cast error instead — loud
    * but mislabeled; now it is the Mongo error, spec-locked). */
  def mqlDateFromStr(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("raw",
          when(col("event_id") % 7 === 1, lit(null).cast("string"))
          .when(col("event_id") % 5 === 0, lit("not a date"))
          .otherwise(concat(
            lpad(((col("event_id") % 12) + 1).cast("string"), 2, "0"),
            lit("/"),
            lpad(((col("event_id") % 27) + 1).cast("string"), 2, "0"),
            lit("/2024 "),
            lpad((col("event_id") % 24).cast("string"), 2, "0"),
            lit(":"),
            lpad((col("event_id") % 60).cast("string"), 2, "0"))))
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"), col("raw")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "parsed": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateFromString": {"dateString": "$raw",
        |       "format": "%m/%d/%Y %H:%M",
        |       "onError": "1999-12-31T23:59:59",
        |       "onNull": "1970-01-01T00:00:00"}}}},
        |   "parsed_tz": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateFromString": {"dateString": "$raw",
        |       "format": "%m/%d/%Y %H:%M", "timezone": "+05:30",
        |       "onError": "1999-12-31T23:59:59",
        |       "onNull": "1970-01-01T00:00:00"}}}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "parsed": 1, "parsed_tz": 1}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 400}
        |]""".stripMargin)

  /** DuckDB replay of the America/New_York baked table + the engine's
    * two-probe local→instant resolution — generated from the SAME
    * [[graft.expr.TzTable]] the Spark plan uses, so the two engines
    * cannot disagree on rules. */
  private def nyReplaySql: String = {
    val tbl = graft.expr.TzTable.of("America/New_York")
    val trL = tbl.trans.drop(1).mkString("[", ",", "]") // drop sentinel
    val osL = tbl.offs.mkString("[", ",", "]")
    val off0 = tbl.offsetAt(1672531200L) // 2023-01-01T00:00:00Z
    def offAt(t: String) =
      s"os[len(list_filter(tr, x -> x <= ($t))) + 1]"
    def lastTr(t: String) =
      s"tr[len(list_filter(tr, x -> x <= ($t)))]"
    // the engine's localToInstant, with an overlap preference
    def rev(l: String, b: String, a: String, t: String,
        pref: Option[String]) = {
      val overlap = pref.map(p =>
        s"WHEN ($p) = $a OR ($p) = $b THEN ($l) - ($p)\n").getOrElse("")
      s"""CASE WHEN $b = $a THEN ($l) - $a
         |  WHEN ($l) < $t + least($a, $b) THEN ($l) - $b
         |  WHEN ($l) >= $t + greatest($a, $b) THEN ($l) - $a
         |  WHEN $a > $b THEN ($l) - $b
         |  $overlap ELSE ($l) - $b END""".stripMargin
    }
    s"""WITH z AS (SELECT $trL::BIGINT[] AS tr, $osL::BIGINT[] AS os),
       |b AS (SELECT event_id,
       |  (CASE WHEN event_id % 7 = 3
       |        THEN 1678597200 + (event_id % 240) * 60
       |        WHEN event_id % 7 = 4
       |        THEN 1699156800 + (event_id % 240) * 60
       |        WHEN event_id % 7 = 5
       |        THEN 1678510800 + (event_id % 240) * 60
       |        WHEN event_id % 7 = 6
       |        THEN 1699070400 + (event_id % 240) * 60
       |        ELSE 1672531200 + (event_id % 730) * 86400
       |          + event_id % 86399 END)::BIGINT AS t,
       |  CASE WHEN event_id % 7 = 3
       |       THEN epoch(TIMESTAMP '2023-03-12 02:00:00')::BIGINT
       |         + (event_id % 60) * 60
       |       WHEN event_id % 7 = 4
       |       THEN epoch(TIMESTAMP '2023-11-05 01:00:00')::BIGINT
       |         + (event_id % 60) * 60
       |       ELSE NULL END AS fl0
       |  FROM events),
       |c AS (SELECT event_id, t, COALESCE(fl0, t) AS fl, tr, os,
       |    ${offAt("t")} AS o0
       |  FROM b, z),
       |l AS (SELECT *, t + o0 AS lcl FROM c),
       |n AS (SELECT *,
       |  epoch(make_timestamp(lcl * 1000000) + to_months(1))::BIGINT
       |    AS nlm,
       |  lcl + 86400 AS nld,
       |  epoch(date_trunc('day', make_timestamp(lcl * 1000000)))::BIGINT
       |    AS nltr
       |  FROM l),
       |r AS (SELECT *,
       |  ${offAt("nlm - 64800")} AS m_b, ${offAt("nlm + 64800")} AS m_a,
       |  ${lastTr("nlm + 64800")} AS m_t,
       |  ${offAt("nld - 64800")} AS d_b, ${offAt("nld + 64800")} AS d_a,
       |  ${lastTr("nld + 64800")} AS d_t,
       |  ${offAt("nltr - 64800")} AS r_b, ${offAt("nltr + 64800")} AS r_a,
       |  ${lastTr("nltr + 64800")} AS r_t,
       |  ${offAt("fl - 64800")} AS f_b, ${offAt("fl + 64800")} AS f_a,
       |  ${lastTr("fl + 64800")} AS f_t
       |  FROM n),
       |i AS (SELECT *,
       |  ${rev("nlm", "m_b", "m_a", "m_t", Some("o0"))} AS im,
       |  ${rev("nld", "d_b", "d_a", "d_t", Some("o0"))} AS idy,
       |  ${rev("nltr", "r_b", "r_a", "r_t", Some("o0"))} AS itr,
       |  ${rev("fl", "f_b", "f_a", "f_t", None)} AS ifs
       |  FROM r)
       |SELECT event_id,
       |  strftime(make_timestamp(lcl * 1000000), '%Y-%m-%d %H:%M:%S')
       |    AS lbl_ny,
       |  CAST(date_part('hour', make_timestamp(lcl * 1000000))
       |    AS BIGINT) AS hr_ny,
       |  strftime(make_timestamp(im * 1000000), '%Y-%m-%d %H:%M:%S')
       |    AS pm_ny,
       |  strftime(make_timestamp(idy * 1000000), '%Y-%m-%d %H:%M:%S')
       |    AS pd_ny,
       |  strftime(make_timestamp(itr * 1000000), '%Y-%m-%d %H:%M:%S')
       |    AS tr_ny,
       |  CAST(date_diff('day',
       |    CAST(make_timestamp((1672531200::BIGINT + ($off0)) * 1000000)
       |      AS DATE),
       |    CAST(make_timestamp(lcl * 1000000) AS DATE)) AS BIGINT)
       |    AS dd_ny,
       |  strftime(make_timestamp(ifs * 1000000), '%Y-%m-%d %H:%M:%S')
       |    AS fs_ny
       |FROM i ORDER BY event_id LIMIT 400""".stripMargin
  }

  /** $convert under the gate (r12) — Mongo's safe cast with the full
    * error surface: a planted string field is numeric for most docs,
    * garbage every 5th (→ onError -1), missing every 5th+1 (→ onNull
    * 0); the oracle replays with TRY_CAST + the same null/error
    * routing. The no-onError RAISE path is MqlPipelineSpec's. */
  def mqlConvert(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          col("doc_id").as("did"),
          when(col("doc_id") % 5 === 1, lit(null).cast("string"))
            .when(col("doc_id") % 5 === 0, lit("oops"))
            .otherwise(col("n_chars").cast("string")).as("raw")))),
      col("meta"),
      """[
        | {"$addFields": {"v": {"$convert": {"input": "$raw",
        |   "to": "long", "onError": -1, "onNull": 0}}}},
        | {"$project": {"did": {"$toLong": "$did"},
        |   "v": {"$toLong": "$v"}}},
        | {"$sort": {"did": 1}}
        |]""".stripMargin)

  /** Atlas `$vectorSearch` under the gate (r17): exact cosine top-k
    * over a metadata vector field — queryVector baked as full-precision
    * DOUBLE literals of corpus vector 77 (Double.toString roundtrips,
    * so the engine's parsed literal equals the oracle's ::DOUBLE cast
    * of the same floats; the document side crosses the JSON boundary
    * pre-cast to array<double> for the same reason), pre-filter
    * excluding the query row, integer-micro (1+cos)/2 scores exposed
    * through {$meta: "vectorSearchScore"}, selection totalized by the
    * tieBreakField extension. The oracle replays brute-force cosine
    * with the established list-comprehension dot device. */
  def mqlVectorSearch(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val qv = e.filter(col("vec_id") === 77)
      .select(col("embedding")).head().getSeq[Float](0)
    val qvJson = qv.map(f => java.lang.Double.toString(f.toDouble))
      .mkString("[", ", ", "]")
    graft.filter.MqlPipeline.aggregate(
      e.withColumn("meta", to_json(struct(
        col("vec_id").cast("long").as("vid"),
        col("embedding").cast("array<double>").as("emb")))),
      col("meta"),
      s"""[
         | {"$$vectorSearch": {"index": "emb_idx", "path": "emb",
         |   "queryVector": $qvJson, "limit": 12,
         |   "numCandidates": 200, "exact": true,
         |   "similarity": "cosine",
         |   "filter": {"vid": {"$$ne": 77}},
         |   "tieBreakField": "vid"}},
         | {"$$project": {"vid": {"$$toLong": "$$vid"},
         |   "score": {"$$meta": "vectorSearchScore"}}},
         | {"$$sort": {"score": -1, "vid": 1}}
         |]""".stripMargin)
  }

  /** $convert LONG→DATE under the gate (r17 — lifts the r14 numeric
    * refusal for the integral bracket): Mongo reads an integral input
    * as epoch MILLISECONDS; the engine constructs the timestamp with
    * an explicit millis constructor (the refusal was about Spark's
    * CAST being epoch-seconds — the cast never runs), bounded so the
    * µs value fits a long on both engines. The fixture plants
    * sub-second millis (…%1000) so $millisecond proves precision, a
    * missing field every 5th routes through onNull (the epoch), and
    * the converted value composes with $dateToString downstream.
    * Doubles stay loud (fractional-millis truncate-vs-round is not
    * pinnable). */
  def mqlConvertEpoch(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"),
          when(col("event_id") % 5 === 1, lit(null).cast("long"))
            .otherwise(lit(1672531200000L) +
              (col("event_id") % 730) * 86400017L +
              col("event_id") % 1000).as("ms")))),
      col("meta"),
      """[
        | {"$addFields": {"d": {"$convert": {
        |   "input": {"$toLong": "$ms"}, "to": "date",
        |   "onNull": {"$dateFromString":
        |     {"dateString": "1970-01-01T00:00:00"}}}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "s": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": "$d"}},
        |   "msec": {"$millisecond": "$d"}}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 300}
        |]""".stripMargin)

  /** $convert TO-DATE under the gate (r14) — the ISO-string bracket
    * with the full error surface: a planted string field is a valid
    * ISO timestamp for most docs, garbage every 5th (→ onError, a
    * sentinel date), missing every 5th+1 (→ onNull, the epoch); the
    * converted TIMESTAMP then feeds $dateToString (typed date ops
    * compose downstream of the convert), keeping the gate's output
    * string-typed. The oracle replays with TRY_CAST AS TIMESTAMP +
    * the same routing. Numeric→date stays loud (epoch-millis vs
    * epoch-seconds vs error across engines — MqlPipelineSpec). */
  def mqlConvertDate(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          col("doc_id").as("did"),
          when(col("doc_id") % 5 === 1, lit(null).cast("string"))
            .when(col("doc_id") % 5 === 0, lit("not-a-date"))
            .otherwise(concat(lit("2024-"),
              lpad(((col("doc_id") % 12) + 1).cast("string"), 2, "0"),
              lit("-"),
              lpad(((col("doc_id") % 27) + 1).cast("string"), 2, "0"),
              lit("T"),
              lpad((col("doc_id") % 24).cast("string"), 2, "0"),
              lit(":30:00"))).as("raw")))),
      col("meta"),
      """[
        | {"$addFields": {"d": {"$convert": {"input": "$raw",
        |   "to": "date", "onError": "1999-12-31T23:59:59",
        |   "onNull": "1970-01-01T00:00:00"}}}},
        | {"$addFields": {"lbl": {"$dateToString": {
        |   "format": "%Y-%m-%d %H:%M:%S", "date": "$d"}}}},
        | {"$project": {"did": {"$toLong": "$did"}, "lbl": 1}},
        | {"$sort": {"did": 1}}
        |]""".stripMargin)

  /** $convert DOUBLE→string under the gate (r15) — the exactly-
    * integral sub-bracket: a provably-double input ($toDouble) whose
    * values are integral renders under an explicit integer cast,
    * digit-identical on both engines and to Mongo's $toString of an
    * integral double. Negative values and an onNull route compose;
    * fractional/huge/-0.0 inputs raise per row (unit-tested, not
    * gate-plantable — the gate corpus is all-integral by
    * construction). */
  def mqlConvertDoubleStr(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          col("doc_id").as("did"),
          when(col("doc_id") % 7 === 1, lit(null).cast("long"))
            .otherwise(col("n_chars").cast("long")).as("nc")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "s": {"$convert": {"input": {"$toDouble": "$nc"},
        |     "to": "string", "onNull": "absent"}},
        |   "neg": {"$convert": {
        |     "input": {"$toDouble": {"$subtract": [0, "$nc"]}},
        |     "to": "string", "onNull": "-"}}}},
        | {"$project": {"did": {"$toLong": "$did"}, "s": 1, "neg": 1}},
        | {"$sort": {"did": 1}}
        |]""".stripMargin)

  /** $convert TO-STRING under the gate (r13) — the integral/boolean/
    * string bracket with onNull/onError composition: a planted long
    * (itself a $convert with onError routing) renders to digits or
    * takes onNull, a comparison renders "true"/"false", and a raw
    * string passes through identity with onNull. Double→string stays
    * loud (MqlPipelineSpec) — float formatting is engine-divergent. */
  def mqlConvertStr(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          col("doc_id").as("did"),
          when(col("doc_id") % 5 === 1, lit(null).cast("string"))
            .when(col("doc_id") % 5 === 0, lit("oops"))
            .otherwise(col("n_chars").cast("string")).as("raw"),
          col("n_chars").cast("long").as("nc")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "vl": {"$convert": {"input": "$raw", "to": "long",
        |     "onError": -1}},
        |   "sb": {"$convert": {"input":
        |     {"$gt": [{"$toLong": "$nc"}, 300]}, "to": "string"}}}},
        | {"$addFields": {
        |   "sl": {"$convert": {"input": "$vl", "to": "string",
        |     "onNull": "none"}}}},
        | {"$project": {"did": {"$toLong": "$did"}, "sl": 1, "sb": 1,
        |   "ss": {"$convert": {"input": "$raw", "to": "string",
        |     "onNull": "missing"}}}},
        | {"$sort": {"did": 1}}
        |]""".stripMargin)

  /** $switch + $dateTrunc under the gate: events bucketed by calendar
    * week (Mongo 5.0 truncation) × a multi-branch severity label
    * (first-match-wins $switch with default), rolled up per composite
    * key. Weeks start SUNDAY — Mongo's documented startOfWeek default
    * (r15 fixed the Monday/ISO divergence this gate originally
    * shipped with); the oracle steps back dayofweek(ts) days (DuckDB
    * dayofweek is Sunday-based 0..6) and replays the CASE chain. */
  def mqlSwitchTrunc(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("meta", to_json(struct(
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("created"),
          col("value").as("v")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "wk": {"$dateToString": {"format": "%Y-%m-%d",
        |     "date": {"$dateTrunc": {"date": "$created", "unit": "week"}}}},
        |   "sev": {"$switch": {"branches": [
        |     {"case": {"$gte": ["$v", 300]}, "then": "high"},
        |     {"case": {"$gte": ["$v", 50]}, "then": "mid"}],
        |     "default": "low"}}}},
        | {"$addFields": {"key": {"$concat": ["$wk", "/", "$sev"]}}},
        | {"$group": {"_id": "$key", "n": {"$sum": 1}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)

  /** MQL $mod — Mongo's divisor/remainder predicate, over the same
    * schemaless props field as the other MQL gates. */
  def mqlEventsMod(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(MqlFilter.toColumn(
        """{"k": {"$mod": [7, 3]}}""",
        MqlFilter.JsonResolver(col("props"))))
      .select(col("event_id"))
      .orderBy("event_id")

  /** Embedded-document $elemMatch under the gate: metadata carries an
    * array of sub-documents ({k, n} items synthesized from `documents`
    * columns) and ONE element must satisfy the whole sub-filter — the
    * FerretDB/Mongo form the scalar-array $elemMatch can't express. The
    * oracle evaluates the same per-element conjunction directly on the
    * source columns. */
  /** The $bits* find operators (r11) over the int64-exact numeric
    * view: AllSet as position array, AnySet as position array, and
    * AnyClear as a numeric mask on the same field — together they
    * select documents whose flag word has bits 0 and 2 set plus
    * EXACTLY ONE of bits 4/5 (AnySet ∧ AnyClear on the same mask).
    * The DuckDB twin is plain integer bitwise algebra. */
  def mqlDocsBits(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("meta", to_json(struct(col("doc_id"),
        col("n_chars").cast("long").as("flags"))))
      .filter(MqlFilter.toColumn(
        """{"flags": {"$bitsAllSet": [0, 2]}, "$and": [
          | {"flags": {"$bitsAnySet": [4, 5]}},
          | {"flags": {"$bitsAnyClear": 48}}]}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** Vertices of the [[mqlGeoWithin]] gate polygon — deliberately
    * CONCAVE (the (45000, 50000) notch) so the ray-casting parity is
    * exercised, not just a convex hull test. ONE source of truth: both
    * the MQL filter JSON and the DuckDB oracle SQL derive from this
    * list, edge by edge, with identical integer arithmetic. */
  private val GeoWithinPoly: Seq[(Long, Long)] = Seq(
    (20000L, 10000L), (80000L, 25000L), (45000L, 50000L),
    (70000L, 80000L), (15000L, 60000L))

  /** $geoWithin under the gate (r12) — the find-side geo operator
    * beside $geoNear: customers planted on the integer grid (the Geo
    * coordinate recipe), packed as `loc: [x, y]` metadata, then ONE
    * boundary-inclusive point-in-$polygon predicate. All arithmetic is
    * exact integers (cross-product on-edge test; cross-multiplied
    * ray-casting with driver-chosen inequality directions — no
    * division on either engine). Pure scan+filter: pushes nothing to
    * parquet (the point is computed), but runs as a single codegen
    * stage — no join, no window, no shuffle beyond the presentation
    * sort (PlanSpec lock). */
  def mqlGeoWithin(s: SparkSession, dir: String): DataFrame = {
    val polyJson = GeoWithinPoly.map { case (x, y) => s"[$x, $y]" }
      .mkString("[", ", ", "]")
    t(s, dir, "customer")
      .select(col("c_custkey").as("id"),
        (col("c_custkey") * 7919 % 100000).as("x"),
        (col("c_custkey") * 104729 % 100000).as("y"))
      .withColumn("meta", to_json(struct(col("id"),
        array(col("x"), col("y")).as("loc"))))
      .filter(MqlFilter.toColumn(
        s"""{"loc": {"$$geoWithin": {"$$polygon": $polyJson}}}""",
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("id"), col("x"), col("y"))
      .orderBy("id")
  }

  private val geoWithinSql: String = {
    val ring = GeoWithinPoly
    val edges = ring.zip(ring.tail :+ ring.head)
    val onEdge = edges.map { case ((xa, ya), (xb, yb)) =>
      s"((x - $xa) * ${yb - ya} - (y - $ya) * ${xb - xa} = 0 AND " +
        s"x BETWEEN ${math.min(xa, xb)} AND ${math.max(xa, xb)} AND " +
        s"y BETWEEN ${math.min(ya, yb)} AND ${math.max(ya, yb)})"
    }.mkString("(", " OR ", ")")
    val crossings = edges.flatMap { case ((xa, ya), (xb, yb)) =>
      if (ya == yb) None
      else {
        val d = yb - ya
        val spans =
          if (ya < yb) s"(y >= $ya AND y < $yb)"
          else s"(y >= $yb AND y < $ya)"
        val cmp = if (d > 0) "<" else ">"
        Some(s"CASE WHEN $spans AND (x - $xa) * $d $cmp " +
          s"(y - $ya) * ${xb - xa} THEN 1 ELSE 0 END")
      }
    }.mkString(" + ")
    s"""WITH p AS (SELECT c_custkey AS id,
       |  c_custkey * 7919 % 100000 AS x,
       |  c_custkey * 104729 % 100000 AS y FROM customer)
       |SELECT id, x, y FROM p
       |WHERE $onEdge OR ($crossings) % 2 = 1
       |ORDER BY id""".stripMargin
  }

  /** Collation under the gate (r12): case is mangled deterministically
    * (every 3rd doc's lang uppercased — the textNormalize planting
    * device), then a `{locale: "en", strength: 2}` collation makes the
    * $in match and the $sort order case-insensitive: both sides of
    * every string compare fold through lower(), which is exactly what
    * ICU strength ≤ 2 degenerates to on a diacritic-free locale. The
    * output keeps the ORIGINAL case (collation affects comparison,
    * never the stored value); ties in the folded key break on did. */
  def mqlCollation(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 3 === 0, upper(col("lang")))
            .otherwise(col("lang")).as("langx"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"langx": {"$in": ["EN", "fr"]}}},
        | {"$sort": {"langx": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "langx": "$langx"}}
        |]""".stripMargin,
      """{"locale": "en", "strength": 2}""")

  /** Strength-1 collation under the gate (r13) — ICU primary: case
    * AND Latin-1 diacritics are non-differences. Accented variants
    * are planted deterministically (café/CAFE/cafe/naïve/NAÏVE by
    * doc_id residue), a `{locale: "en", strength: 1}` collation makes
    * `$in: ["cafe", "naive"]` match every variant and the $sort order
    * fold-insensitive; the fold is the public one-to-one Latin-1
    * table as a translate() chain — exact on both engines. Output
    * keeps the ORIGINAL spelling (collation affects comparison,
    * never the stored value). */
  def mqlCollationDiacritic(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 5 === 0, lit("café"))
            .when(col("doc_id") % 5 === 1, lit("CAFE"))
            .when(col("doc_id") % 5 === 2, lit("naïve"))
            .when(col("doc_id") % 5 === 3, lit("NAÏVE"))
            .otherwise(lit("résumé")).as("word"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"word": {"$in": ["cafe", "Naïve"]}}},
        | {"$sort": {"word": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "word": "$word"}}
        |]""".stripMargin,
      // locale fr exercises the r13 widening: Latin-1 primary is
      // locale-independent across the ICU-root Western locales
      """{"locale": "fr", "strength": 1}""")

  /** numericOrdering collation under the gate (r14) — Mongo's
    * numeric-string compare: planted tags mix case ("ITEM"/"item"),
    * 1-3 digit numbers, and leading-zero variants ("item0042");
    * `{locale: "en", strength: 2, numericOrdering: true}` makes the
    * range $match and the $sort numeric-aware AND case-insensitive
    * ("item2" < "item10", "0042" ≡ "42"). The engine keys digit runs
    * (leading zeros stripped, zero-padded to 18); the ORACLE replays
    * the SEMANTICS directly (sort by the planted numeric value) — an
    * independent check of the ordering contract, not a re-derivation
    * of the key. Ties in the collation key break on did. */
  def mqlCollationNumeric(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          concat(
            when(col("doc_id") % 3 === 0, lit("ITEM"))
              .otherwise(lit("item")),
            when(col("doc_id") % 7 === 0,
              lpad((col("doc_id") % 120).cast("string"), 4, "0"))
              .otherwise((col("doc_id") % 120).cast("string")))
            .as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gte": "item10", "$lt": "ITEM100"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "en", "strength": 2, "numericOrdering": true}""")

  /** Strength-2 ACCENT-SENSITIVE collation under the gate (r15) —
    * ICU secondary semantics: case folds, accents are significant AND
    * order by secondary weight (cote < coté < côte < côté; ring before
    * diaeresis: såte < säte), digit runs compare numerically and
    * carry no secondary weight ("2" ≡ "002" through the tie), and a
    * primary difference always beats any accent. The planted variants
    * carry a known ICU rank; the oracle replays the rank semantically
    * (the engine's key construction is parity-locked against icu4j
    * root in MqlFilterSpec). $gt excludes the rank-0 equality class
    * ("item2 cote" ≡ "ITEM002 cote" at this strength); $ne excludes
    * by case+accent-folded equality ("ITEM10 côté" ≡ "ITEM10 CÔTÉ"). */
  def mqlCollationAccent(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 9 === 0, lit("item2 cote"))
            .when(col("doc_id") % 9 === 1, lit("ITEM002 cote"))
            .when(col("doc_id") % 9 === 2, lit("item2 coté"))
            .when(col("doc_id") % 9 === 3, lit("item2 côte"))
            .when(col("doc_id") % 9 === 4, lit("item2 côté"))
            .when(col("doc_id") % 9 === 5, lit("item10 cote"))
            .when(col("doc_id") % 9 === 6, lit("ITEM10 CÔTÉ"))
            .when(col("doc_id") % 9 === 7, lit("item10 såte"))
            .otherwise(lit("item10 säte")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gt": "item2 cote",
        |    "$ne": "ITEM10 côté"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "en", "strength": 2, "numericOrdering": true}""")

  /** es TAILORED collation under the gate (r16) — the one supported
    * primary tailoring: ICU es orders ñ as its own letter between n
    * and o (root folds it to n+tilde), implemented by the ñ → "n"+DEL
    * key expansion and locked to icu4j es by the MqlFilterSpec parity
    * test at strengths 1 and 2. The fixture plants the deciding
    * neighborhood — nino/niño/nominal/nz/ñandu — so the ordering the
    * root fold would get WRONG (niño before nz; root says after) is
    * exactly what the oracle pins, plus numericOrdering composition
    * and case-insensitive ñ ≡ Ñ equality under $ne. The oracle
    * encodes the expected es ranks explicitly (the accent-gate
    * device). */
  def mqlCollationTailored(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 8 === 0, lit("nido 2"))
            .when(col("doc_id") % 8 === 1, lit("NIÑO 2"))
            .when(col("doc_id") % 8 === 2, lit("niño 10"))
            .when(col("doc_id") % 8 === 3, lit("nino 2"))
            .when(col("doc_id") % 8 === 4, lit("nominal 2"))
            .when(col("doc_id") % 8 === 5, lit("ñandu 5"))
            .when(col("doc_id") % 8 === 6, lit("nz 5"))
            .otherwise(lit("Ñu 3")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gt": "nino 2", "$ne": "ñu 3"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "es", "strength": 1, "numericOrdering": true}""")

  /** sv TAILORED collation under the gate (r16) — Swedish's primary
    * letters after z (å < ä≡æ < ô≡ö≡ø) and ü≡y, at strength 2 with
    * numericOrdering, so the gate pins the class-internal secondary
    * ranks too (ä < æ, ö < ø < ô, y < ü) and the digit-run key
    * composing with the tailored expansions. Oracle = explicit
    * measured ranks (the accent-gate device); the key math is locked
    * to icu4j sv pairwise in MqlFilterSpec. */
  def mqlCollationSv(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 10 === 0, lit("zebra 2"))
            .when(col("doc_id") % 10 === 1, lit("zon 10"))
            .when(col("doc_id") % 10 === 2, lit("år 2"))
            .when(col("doc_id") % 10 === 3, lit("ÄRA 2"))
            .when(col("doc_id") % 10 === 4, lit("æra 2"))
            .when(col("doc_id") % 10 === 5, lit("öra 2"))
            .when(col("doc_id") % 10 === 6, lit("øra 2"))
            .when(col("doc_id") % 10 === 7, lit("ôra 2"))
            .when(col("doc_id") % 10 === 8, lit("yta 2"))
            .otherwise(lit("üta 2")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gt": "zebra 2", "$ne": "ØRA 2"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "sv", "strength": 2, "numericOrdering": true}""")

  /** da TAILORED collation under the gate (r16) — Danish's reversed
    * class layout (ä≡æ < ö≡ø < aa≡å after z) INCLUDING the "aa"
    * digraph contraction: aarhus ≡ århus at strength 1, pinned both
    * by the sort (equal keys fall to the did tiebreak) and by $ne
    * "AARHUS" dropping BOTH spellings. */
  def mqlCollationDa(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 8 === 0, lit("zut"))
            .when(col("doc_id") % 8 === 1, lit("ära"))
            .when(col("doc_id") % 8 === 2, lit("æble"))
            .when(col("doc_id") % 8 === 3, lit("øre"))
            .when(col("doc_id") % 8 === 4, lit("östers"))
            .when(col("doc_id") % 8 === 5, lit("aalborg"))
            .when(col("doc_id") % 8 === 6, lit("århus"))
            .otherwise(lit("aarhus")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gte": "æble", "$ne": "AARHUS"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "da", "strength": 1}""")

  /** tr TAILORED collation under the gate (r16) — Turkish's six
    * primary letters (ç ğ ı ö ş ü) AND the dotless-ı case rules
    * (I ≡ ı and İ ≡ i, via the preLower translate): the fixture pins
    * the h < ı < i ordering, ç/ş as letters after c/s, and the case
    * equivalences both by sort-equality and by $ne "ilik" dropping
    * İLİK too. Oracle = explicit measured ranks; key math locked to
    * icu4j tr pairwise in MqlFilterSpec. */
  def mqlCollationTr(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 9 === 0, lit("hal"))
            .when(col("doc_id") % 9 === 1, lit("ılık"))
            .when(col("doc_id") % 9 === 2, lit("ILIK"))
            .when(col("doc_id") % 9 === 3, lit("ilik"))
            .when(col("doc_id") % 9 === 4, lit("İLİK"))
            .when(col("doc_id") % 9 === 5, lit("çay"))
            .when(col("doc_id") % 9 === 6, lit("cam"))
            .when(col("doc_id") % 9 === 7, lit("şal"))
            .otherwise(lit("sal")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gt": "hal", "$ne": "ilik"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "tr", "strength": 1}""")

  /** STRENGTH-3 (tertiary = case level) tailored collation under the
    * gate (r17 — lifts "strength 3 silently means codepoint identity
    * for tailored locales"): the full three-level key — tailored
    * primary, locale secondary, case as the least-significant level
    * (da UPPER-first, the others lower-first) — icu4j-locked pairwise
    * in MqlFilterSpec, with the expected ranks measured from icu4j
    * baked into the oracle (the r16 rank-gate device). es composes
    * with numericOrdering: $ne "Niño 02" must drop the planted
    * "Niño 2" (02 ≡ 2 holds through the tertiary level) and NOTHING
    * else (NIÑO 02 differs by case). */
  def mqlCollationTertiary(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 12 === 0, lit("cote 7"))
            .when(col("doc_id") % 12 === 1, lit("cotE 7"))
            .when(col("doc_id") % 12 === 2, lit("coté 7"))
            .when(col("doc_id") % 12 === 3, lit("nino 2"))
            .when(col("doc_id") % 12 === 4, lit("Nino 2"))
            .when(col("doc_id") % 12 === 5, lit("NINO 2"))
            .when(col("doc_id") % 12 === 6, lit("niño 2"))
            .when(col("doc_id") % 12 === 7, lit("niñO 2"))
            .when(col("doc_id") % 12 === 8, lit("Niño 2"))
            .when(col("doc_id") % 12 === 9, lit("NIÑO 02"))
            .when(col("doc_id") % 12 === 10, lit("nz 1"))
            .otherwise(lit("ñandu 3")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gt": "cotE 7", "$ne": "Niño 02"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "es", "strength": 3, "numericOrdering": true}""")

  /** sv at strength 3: the tailored classes order by case within —
    * $ne "Öra" drops EXACTLY that casing (öra and ÖRA stay, the
    * tertiary contract; strength ≤2 would drop all three). */
  def mqlCollationTerSv(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 14 === 0, lit("yta"))
            .when(col("doc_id") % 14 === 1, lit("Yta"))
            .when(col("doc_id") % 14 === 2, lit("üta"))
            .when(col("doc_id") % 14 === 3, lit("år"))
            .when(col("doc_id") % 14 === 4, lit("År"))
            .when(col("doc_id") % 14 === 5, lit("ära"))
            .when(col("doc_id") % 14 === 6, lit("æra"))
            .when(col("doc_id") % 14 === 7, lit("Æra"))
            .when(col("doc_id") % 14 === 8, lit("öra"))
            .when(col("doc_id") % 14 === 9, lit("Öra"))
            .when(col("doc_id") % 14 === 10, lit("ÖRA"))
            .when(col("doc_id") % 14 === 11, lit("øra"))
            .when(col("doc_id") % 14 === 12, lit("Øra"))
            .otherwise(lit("ôra")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gte": "üta", "$ne": "Öra"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "sv", "strength": 3}""")

  /** da at strength 3: UPPER-first case (measured Å < AA < Aa < å <
    * aa at the å-class), the aa/Aa/AA contraction case ladder, and
    * the NON-contracting "aA" form ("aAlborg" sorts at primary a-a,
    * first) — $ne "Aarhus" drops exactly that casing of the five
    * å-class spellings. */
  def mqlCollationTerDa(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 14 === 0, lit("zut"))
            .when(col("doc_id") % 14 === 1, lit("æble"))
            .when(col("doc_id") % 14 === 2, lit("Æble"))
            .when(col("doc_id") % 14 === 3, lit("øre"))
            .when(col("doc_id") % 14 === 4, lit("Øre"))
            .when(col("doc_id") % 14 === 5, lit("aalborg"))
            .when(col("doc_id") % 14 === 6, lit("Aalborg"))
            .when(col("doc_id") % 14 === 7, lit("AAlborg"))
            .when(col("doc_id") % 14 === 8, lit("aAlborg"))
            .when(col("doc_id") % 14 === 9, lit("århus"))
            .when(col("doc_id") % 14 === 10, lit("Århus"))
            .when(col("doc_id") % 14 === 11, lit("aarhus"))
            .when(col("doc_id") % 14 === 12, lit("Aarhus"))
            .otherwise(lit("AARHUS")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$ne": "Aarhus"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "da", "strength": 3}""")

  /** tr at strength 3: the dotless-ı CASE pairs become significant
    * (ı < I, i < İ — lower-first) — $ne "İLİK" drops exactly that
    * casing (ilik/iLİK stay; strength ≤2 folds them together). */
  def mqlCollationTerTr(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 13 === 0, lit("cam"))
            .when(col("doc_id") % 13 === 1, lit("çay"))
            .when(col("doc_id") % 13 === 2, lit("Çay"))
            .when(col("doc_id") % 13 === 3, lit("hal"))
            .when(col("doc_id") % 13 === 4, lit("ılık"))
            .when(col("doc_id") % 13 === 5, lit("Ilık"))
            .when(col("doc_id") % 13 === 6, lit("ILIK"))
            .when(col("doc_id") % 13 === 7, lit("ilik"))
            .when(col("doc_id") % 13 === 8, lit("iLİK"))
            .when(col("doc_id") % 13 === 9, lit("İLİK"))
            .when(col("doc_id") % 13 === 10, lit("sal"))
            .when(col("doc_id") % 13 === 11, lit("şal"))
            .otherwise(lit("Şal")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gt": "Çay", "$ne": "İLİK"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "tr", "strength": 3}""")

  /** ROOT-class locale at strength 3 under the gate (r17): fr (with
    * de/it/pt/nl, all measured ≡ ICU root at every strength) gains the
    * tertiary case level — root fold + root secondary + lower-first
    * case digits — composing with numericOrdering; $ne "COTE 2" must
    * drop exactly the planted "COTE 02" (numeric equivalence holds
    * through tertiary, case is significant) and nothing else. Ranks
    * measured from icu4j fr (plant order). */
  def mqlCollationTerRoot(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregateCollated(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("doc_id") % 12 === 0, lit("cote 2"))
            .when(col("doc_id") % 12 === 1, lit("cotE 2"))
            .when(col("doc_id") % 12 === 2, lit("Cote 2"))
            .when(col("doc_id") % 12 === 3, lit("COTE 02"))
            .when(col("doc_id") % 12 === 4, lit("coté 2"))
            .when(col("doc_id") % 12 === 5, lit("Coté 2"))
            .when(col("doc_id") % 12 === 6, lit("côte 2"))
            .when(col("doc_id") % 12 === 7, lit("CÔTÉ 2"))
            .when(col("doc_id") % 12 === 8, lit("item2 a"))
            .when(col("doc_id") % 12 === 9, lit("ITEM002 a"))
            .when(col("doc_id") % 12 === 10, lit("naïve 1"))
            .otherwise(lit("Naïve 1")).as("tag"),
          col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$match": {"tag": {"$gt": "cotE 2", "$ne": "COTE 2"}}},
        | {"$sort": {"tag": 1, "did": 1}},
        | {"$project": {"doc_id": 1, "tag": "$tag"}}
        |]""".stripMargin,
      """{"locale": "fr", "strength": 3, "numericOrdering": true}""")

  /** $redact under the gate (r12) — Mongo's access-control stage on
    * flat documents: a nested $cond decides $$KEEP/$$PRUNE per
    * document from its numeric char-count bracket ([300, 800)); the
    * oracle is the equivalent relational predicate. $$DESCEND is loud
    * by contract (flat documents — see the stage doc). */
  def mqlRedact(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          col("doc_id").as("did"),
          col("n_chars").cast("long").as("nc")))),
      col("meta"),
      """[
        | {"$redact": {"$cond": [
        |   {"$gte": [{"$toLong": "$nc"}, 300]},
        |   {"$cond": [{"$lt": [{"$toLong": "$nc"}, 800]},
        |              "$$KEEP", "$$PRUNE"]},
        |   "$$PRUNE"]}},
        | {"$project": {"doc_id": {"$toLong": "$did"}}},
        | {"$sort": {"doc_id": 1}}
        |]""".stripMargin)

  /** $redact $$DESCEND under the gate (r13, widened r14) — Mongo's
    * per-subdocument ACL recursion to BOUNDED DEPTH: each document
    * carries a root clearance, an embedded sub-document that itself
    * nests a level-2 sub-sub-document (r14 — r13 kept this loud), a
    * low-clearance sibling, and an ARRAY of embedded documents whose
    * low-clearance elements must be removed per-element (r14); the
    * classic {"$cond": [level>=3, "$$DESCEND", "$$PRUNE"]} expression
    * drives every level. The oracle is the equivalent relational
    * predicate over the planted levels. */
  def mqlRedactDescend(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          col("doc_id").as("did"),
          (col("doc_id") % 5).as("level"),
          struct((col("doc_id") % 7).as("level"),
            col("n_chars").cast("long").as("v"),
            struct((col("doc_id") % 4).as("level"),
              (col("doc_id") * 2).as("w"),
              // r15: a LEVEL-3 subdocument — past the unrolled path's
              // plan-size cap, served by the RedactWalk runtime path
              struct((col("doc_id") % 6).as("level"),
                (col("doc_id") + 7).as("z")).as("deep")).as("inner"))
            .as("sec"),
          struct(lit(2L).as("level"),
            col("doc_id").as("v")).as("aux"),
          array(
            struct((col("doc_id") % 2 + 2).as("level"),
              lit(1L).as("t")),
            struct(lit(5L).as("level"),
              (col("doc_id") % 9).as("t"))).as("arr")))),
      col("meta"),
      """[
        | {"$redact": {"$cond": [
        |   {"$gte": [{"$toLong": "$level"}, 3]},
        |   "$$DESCEND", "$$PRUNE"]}},
        | {"$project": {"did": {"$toLong": "$did"},
        |   "sec_v": {"$toLong": {"$ifNull":
        |     [{"$toLong": "$sec.v"}, -1]}},
        |   "inner_w": {"$toLong": {"$ifNull":
        |     [{"$toLong": "$sec.inner.w"}, -1]}},
        |   "deep_z": {"$toLong": {"$ifNull":
        |     [{"$toLong": "$sec.inner.deep.z"}, -1]}},
        |   "aux_v": {"$toLong": {"$ifNull":
        |     [{"$toLong": "$aux.v"}, -1]}},
        |   "na": {"$size": "$arr"}}},
        | {"$sort": {"did": 1}}
        |]""".stripMargin)

  /** $rankFusion under the gate (r12) — Mongo 8.1's hybrid-search
    * stage end to end: two named input pipelines rank the same
    * documents collection by OPPOSING criteria (longest English docs
    * weighted 2× vs shortest en/fr docs), each ending in the contract's
    * total-order $sort + $limit, then weighted integer-RRF fusion with
    * scoreDetails exposing per-leg ranks, and a post-fusion $limit.
    * The DuckDB twin replicates both legs and the
    * Σ w·(10¹² // (60+rank)) fusion exactly. */
  def mqlRankFusion(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          col("doc_id").as("did"), col("lang"),
          col("n_chars").cast("long").as("nc")))),
      col("meta"),
      """[
        | {"$rankFusion": {
        |   "input": {"pipelines": {
        |     "long": [
        |       {"$match": {"lang": "en"}},
        |       {"$project": {"_id": {"$toLong": "$did"},
        |                     "nc": {"$toLong": "$nc"}}},
        |       {"$sort": {"nc": -1, "_id": 1}},
        |       {"$limit": 20}],
        |     "short": [
        |       {"$match": {"lang": {"$in": ["en", "fr"]}}},
        |       {"$project": {"_id": {"$toLong": "$did"},
        |                     "nc": {"$toLong": "$nc"}}},
        |       {"$sort": {"nc": 1, "_id": 1}},
        |       {"$limit": 25}]}},
        |   "combination": {"weights": {"long": 2, "short": 1}},
        |   "scoreDetails": true}},
        | {"$limit": 15}
        |]""".stripMargin)

  /** $scoreFusion under the gate (r12) — Mongo 8.2's score-based
    * hybrid fusion end to end, the sibling of [[mqlRankFusion]]: two
    * legs score the same documents collection on DIFFERENT scales
    * (raw length in chars vs a 100k-minus-length shortness score —
    * exactly the cross-scale mismatch minMaxScaler normalization
    * exists to absorb), each ending in the contract's total-order
    * $sort + $limit and projecting the engine's `_score` column, then
    * per-leg exact-integer minmax normalization onto [0, 10⁶], a 2:1
    * weighted average fused with the pmod floor device, and
    * scoreDetails exposing per-leg normalized scores. The DuckDB twin
    * replicates both legs, both minmax windows, and the
    * floor((2·a + b)/3) combination exactly. */
  def mqlScoreFusion(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          col("doc_id").as("did"), col("lang"),
          col("n_chars").cast("long").as("nc")))),
      col("meta"),
      """[
        | {"$scoreFusion": {
        |   "input": {"pipelines": {
        |     "long": [
        |       {"$match": {"lang": "en"}},
        |       {"$project": {"_id": {"$toLong": "$did"},
        |                     "_score": {"$toLong": "$nc"}}},
        |       {"$sort": {"_score": -1, "_id": 1}},
        |       {"$limit": 20}],
        |     "short": [
        |       {"$match": {"lang": {"$in": ["en", "fr"]}}},
        |       {"$project": {"_id": {"$toLong": "$did"},
        |                     "_score": {"$toLong": {"$subtract":
        |                       [100000, {"$toLong": "$nc"}]}}}},
        |       {"$sort": {"_score": -1, "_id": 1}},
        |       {"$limit": 25}]},
        |    "normalization": "minMaxScaler"},
        |   "combination": {"weights": {"long": 2, "short": 1}},
        |   "scoreDetails": true}},
        | {"$limit": 15}
        |]""".stripMargin)

  /** $scoreFusion SIGMOID normalization under the gate (r16 — the
    * r14/r15 loud bracket lifted by the baked-table device): scores
    * are integral by the stage contract and floor(10⁶·σ(s)) saturates
    * outside |s| ≤ 20, so the whole transcendental is 41 driver-
    * computed literals embedded identically on BOTH engines (the
    * ZoneRules discipline — no cross-engine float math). The planted
    * scores span the live band of the curve (±10) AND the saturation
    * clamp; asymmetric weights keep the fused order non-trivial. */
  def mqlScoreFusionSigmoid(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          col("doc_id").as("did"), col("lang"),
          ((col("n_chars") % 21) - 10).cast("long").as("sp"),
          ((col("n_chars") % 15) - 7).cast("long").as("sq")))),
      col("meta"),
      """[
        | {"$scoreFusion": {
        |   "input": {"pipelines": {
        |     "hot": [
        |       {"$match": {"lang": "en"}},
        |       {"$project": {"_id": {"$toLong": "$did"},
        |                     "_score": {"$toLong": "$sp"}}},
        |       {"$sort": {"_score": -1, "_id": 1}},
        |       {"$limit": 30}],
        |     "cold": [
        |       {"$match": {"lang": {"$in": ["en", "de"]}}},
        |       {"$project": {"_id": {"$toLong": "$did"},
        |                     "_score": {"$toLong": "$sq"}}},
        |       {"$sort": {"_score": -1, "_id": 1}},
        |       {"$limit": 40}]},
        |    "normalization": "sigmoid"},
        |   "combination": {"weights": {"hot": 3, "cold": 2}},
        |   "scoreDetails": true}},
        | {"$limit": 25}
        |]""".stripMargin)

  /** $jsonSchema under the gate (r12) — validation-as-predicate from
    * find(): three violation classes planted deterministically in a
    * hand-built JSON document (every 7th doc omits `lang` → required
    * fails; every 5th doc writes `nc` as a STRING → bsonType fails;
    * out-of-bracket n_chars → minimum/maximum fail), then one
    * $jsonSchema predicate admits exactly the clean documents. The
    * oracle is the same three rules as relational algebra. Pure
    * scan+filter — validation runs at scan speed like any other
    * predicate, which is the point of the operator at 100 TB. */
  def mqlJsonSchema(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("meta", concat(
        lit("{\"did\": "), col("doc_id"),
        when(col("doc_id") % 7 === 0, lit(""))
          .otherwise(concat(lit(", \"lang\": \""), col("lang"),
            lit("\""))),
        lit(", \"nc\": "),
        when(col("doc_id") % 5 === 0,
          concat(lit("\""), col("n_chars"), lit("\"")))
          .otherwise(col("n_chars").cast("string")),
        lit("}")))
      .filter(MqlFilter.toColumn(
        """{"$jsonSchema": {
          |  "bsonType": "object",
          |  "required": ["did", "lang"],
          |  "properties": {
          |    "did": {"bsonType": "long"},
          |    "lang": {"bsonType": "string", "pattern": "^[a-z]{2}$",
          |      "minLength": 2, "maxLength": 2},
          |    "nc": {"bsonType": "long", "minimum": 100,
          |      "maximum": 500}}}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  def mqlElemMatch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("meta", to_json(struct(array(
        struct(col("lang").as("k"),
          (col("n_chars") % 10).cast("long").as("n")),
        struct(col("source").as("k"),
          (col("n_chars") % 7).cast("long").as("n"))).as("items"))))
      .filter(MqlFilter.toColumn(
        """{"items": {"$elemMatch":
          |  {"k": {"$in": ["en", "src2"]}, "n": {"$gte": 5}}}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** Computed pipeline fields under the gate: $addFields derives real
    * columns from the metadata document ($divide/$concat), $match filters
    * on one, and a computed $project emits arithmetic over them — the
    * post-$addFields document shape flowing through typed resolution. */
  def mqlPipelineCompute(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("doc_id"), col("lang"),
          col("source"), col("n_chars")))),
      col("meta"),
      """[
        |  {"$addFields": {
        |    "kc": {"$divide": [{"$toLong": "$n_chars"}, 100]},
        |    "label": {"$concat": [{"$toUpper": "$lang"}, ":", "$source"]}}},
        |  {"$match": {"kc": {"$gt": 9}}},
        |  {"$project": {
        |    "did": {"$toLong": "$doc_id"},
        |    "label": 1,
        |    "kc": 1,
        |    "score": {"$subtract": [{"$multiply": ["$kc", 2]}, 1.5]}}},
        |  {"$sort": {"did": 1}}
        |]""".stripMargin)

  /** $replaceRoot + $ifNull/$cond under the gate: metadata nests the
    * interesting fields one level down ({"info": {...}}); the pipeline
    * promotes `info` to the root, computes a $cond bucket label and an
    * $ifNull fallback, filters and sorts on the promoted fields. */
  def mqlReplaceRoot(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      // ONLY the JSON column travels — every field must resolve through
      // the promoted root, not shadow real source columns
      t(s, dir, "documents")
        .select(to_json(struct(struct(col("doc_id"),
          col("lang"), col("n_chars")).as("info"))).as("meta")),
      col("meta"),
      """[
        |  {"$replaceRoot": {"newRoot": "$info"}},
        |  {"$match": {"lang": {"$in": ["en", "de"]}}},
        |  {"$project": {
        |    "did": {"$toLong": "$doc_id"},
        |    "lang": 1,
        |    "size_bucket": {"$cond": [
        |      {"$gte": [{"$toLong": "$n_chars"}, 800]}, "long", "short"]},
        |    "fallback": {"$ifNull": ["$missing_field", "none"]}}},
        |  {"$sort": {"did": 1}}
        |]""".stripMargin)

  /** MQL operator breadth through the JSON resolver in one registered
    * query: $in (string set), $regex (anchored), numeric $gte on a JSON
    * number — over a metadata document synthesized from `documents`
    * columns, exactly how collection metadata flows through the engine. */
  def mqlDocsMixed(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("meta", to_json(struct(col("lang"), col("source"),
        col("n_chars"))))
      .filter(MqlFilter.toColumn(
        """{"lang": {"$in": ["en", "fr"]},
          | "source": {"$regex": "^src1"},
          | "n_chars": {"$gte": 500}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** Mongo `$text` under the gate — the text-index predicate in its
    * OR-of-terms form composed with an ordinary metadata filter: docs
    * matching "vector" or "hash", in en/fr only. No $language, so the
    * english analyzer applies (r18 — Mongo's default index language):
    * both sides stem through the one Stemmer rule table. */
  def mqlTextFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("meta", to_json(struct(col("lang"))))
      .filter(MqlFilter.toColumn(
        """{"$text": {"$search": "vector hash"},
          | "lang": {"$in": ["en", "fr"]}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** `$text {"$language": "english"}` under the gate (r17 — lifts the
    * stemming refusal): the baked English analyzer — Lucene's classic
    * stop set + the table-driven Porter-style stemmer — applied to the
    * query terms on the driver and to the document tokens in Catalyst,
    * both generated from the ONE rule table
    * ([[graft.functions.Stemmer.Rules]]), with the oracle SQL rendered
    * from the SAME table as a nested regexp_replace chain (RE2-safe
    * patterns; the collation-key discipline). The search carries the
    * canonical inflections — "running" must reach documents that say
    * "run"/"runs", "hashes" must reach "hash"/"hashing" — and a stop
    * word that must be dropped. */
  def mqlTextStemmed(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("meta", to_json(struct(col("lang"))))
      .filter(MqlFilter.toColumn(
        """{"$text": {"$search": "running hashes the tables",
          |           "$language": "english"}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  // ---- baked non-English $text analyzers (r18) ----------------------
  // Planted per-language fixtures (the documents corpus is English
  // prose, so each gate replaces the text column with a deterministic
  // doc_id-keyed phrase carrying the language's canonical inflection
  // pairs, diacritics to fold, and stop-word-only rows) — the ONE
  // phrase list renders both the Spark fixture and the oracle's
  // DuckDB list literal, and the query terms analyze through the SAME
  // per-language rule table on both engines.

  private val esPlanted = Seq(
    "los libros rápidamente", "libro nuevo", "hablando claramente",
    "hablar fuerte", "pensamientos oscuros", "pensar bien",
    "veces contadas", "vez primera", "nada de eso", "casa grande")
  private val frPlanted = Seq(
    "les maisons rapidement", "maison grande", "parlant fort",
    "parler vite", "formation utile", "former encore",
    "chevaux rapides", "cheval blanc", "le la été de",
    "heureuse ensemble")
  private val dePlanted = Seq(
    "die zeitungen schnell", "zeitung lesen", "laufen weit",
    "lauf schnell", "häuser groß", "haus garten",
    "freundlich bleiben", "freunde treffen", "der die das und",
    "möglichkeiten viele")
  private val itPlanted = Seq(
    "i libri rapidamente", "libro nuovo", "parlando chiaramente",
    "parlare forte", "creazioni nuove", "creare bene",
    "molto di è tutto", "casa grande", "vita bella",
    "creazione utile")
  private val ptPlanted = Seq(
    "os livros rapidamente", "livro novo", "falando claramente",
    "falar alto", "corações grandes", "coração pequeno",
    "pensamentos claros", "pensar bem", "de a o que",
    "casa bonita")
  private val nlPlanted = Seq(
    "de boeken snel", "boekje lezen", "vriendelijk blijven",
    "vrienden ontmoeten", "mogelijkheden zoeken", "mogelijk maken",
    "grote huizen", "groten samen", "de het een en",
    "altijd iets meer")

  private def plantedText(phrases: Seq[String]) =
    element_at(typedLit(phrases),
      (col("doc_id") % phrases.length).cast("int") + 1)

  private def mqlTextStemmedLang(s: SparkSession, dir: String,
      phrases: Seq[String], search: String, lang: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("text", plantedText(phrases))
      .withColumn("meta", to_json(struct(col("lang"))))
      .filter(MqlFilter.toColumn(
        s"""{"$$text": {"$$search": "$search",
           |            "$$language": "$lang"}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** `$text {"$language": "es"}` (r18): the Spanish light-stemmer
    * cascade — libros→libr co-matching libro, rápidamente folding its
    * diacritic AND stemming to rapid, hablar/hablando→habl,
    * veces/vez→vez, with a stop-word-only row that must not match. */
  def mqlTextStemmedEs(s: SparkSession, dir: String): DataFrame =
    mqlTextStemmedLang(s, dir, esPlanted,
      "libros hablando pensar veces", "es")

  /** `$text {"$language": "fr"}` (r18): maisons→maison, the -aux
    * plural (chevaux↔cheval), parlant/parler→parl, formation/former→
    * form, heureux↔heureuse→heur; "été" folds to the stop word ete. */
  def mqlTextStemmedFr(s: SparkSession, dir: String): DataFrame =
    mqlTextStemmedLang(s, dir, frPlanted,
      "maisons parler formation cheval heureux", "fr")

  /** `$text {"$language": "de"}` (r18): zeitungen/zeitung→zeit,
    * laufen↔lauf, häuser/haus→hau (the declension chain over-strips
    * consistently on both sides), freundlich↔freunde→freund,
    * möglichkeit(en)→moglich through the umlaut fold. */
  def mqlTextStemmedDe(s: SparkSession, dir: String): DataFrame =
    mqlTextStemmedLang(s, dir, dePlanted,
      "zeitung laufen haus freundlich möglichkeit", "de")

  /** `$text {"$language": "it"}` (r18): libri/libro→libr,
    * parlando/parlare/parla→parl, the -zione cascade
    * (creazioni/creazione/creare→cre), a folded-è stop row. */
  def mqlTextStemmedIt(s: SparkSession, dir: String): DataFrame =
    mqlTextStemmedLang(s, dir, itPlanted,
      "libri parlare creazione", "it")

  /** `$text {"$language": "pt"}` (r18): livros/livro→livr,
    * falando/falar→fal, the nasal plural in folded space
    * (corações/coração→coraca), pensamentos/pensar→pens. */
  def mqlTextStemmedPt(s: SparkSession, dir: String): DataFrame =
    mqlTextStemmedLang(s, dir, ptPlanted,
      "livros falar coração pensamentos", "pt")

  /** `$text {"$language": "nl"}` (r18): boeken/boekje→boek,
    * vriendelijk/vrienden→vriend, mogelijkheden/mogelijk→mog,
    * grote/groten→grot, stop-only rows. */
  def mqlTextStemmedNl(s: SparkSession, dir: String): DataFrame =
    mqlTextStemmedLang(s, dir, nlPlanted,
      "boeken vriendelijk mogelijk grote", "nl")

  private def stemmedLangOracle(phrases: Seq[String], search: String,
      a: graft.functions.Stemmer.LangAnalyzer): String = {
    val lst = phrases.map(p => s"'$p'").mkString("[", ", ", "]")
    val terms = a.searchTerms(search).map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (SELECT doc_id,
       |  ($lst)[CAST(doc_id % ${phrases.length} AS INT) + 1] AS text
       |  FROM documents)
       |SELECT doc_id FROM d
       |WHERE len(list_filter(${a.sqlTokens("text")},
       |  t -> t IN ($terms))) > 0
       |ORDER BY doc_id""".stripMargin
  }

  /** MQL `$expr` under the gate — aggregation expressions inside a find
    * filter: a numeric comparison whose right side is computed
    * ($add/$multiply over field refs) AND a string equality, both
    * resolved per-position through the variant views. The whole
    * predicate is one Catalyst boolean over a single JSON parse. */
  def mqlExprFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("meta", to_json(struct(col("lang"), col("n_chars"),
        (col("doc_id") % 7).as("sev"))))
      .filter(MqlFilter.toColumn(
        """{"$expr": {"$and": [
          |  {"$gt": ["$n_chars",
          |    {"$add": [{"$multiply": ["$sev", 100]}, 300]}]},
          |  {"$eq": ["$lang", "en"]}]}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** Mongo aggregation PIPELINE under the gate: $match → $group
    * (count/sum/max accumulators over the numeric view) → post-group
    * $match (the HAVING shape) → $sort — four stages folding into one
    * Catalyst plan with partial aggregation, over the same synthesized
    * metadata document as the other MQL gates. */
  /** $text ranking surface — Mongo's
    * `find({$text: ...}, {score: {$meta: "textScore"}})
    *   .sort({score: {$meta: "textScore"}})`
    * as a pipeline: match on the text predicate, PROJECT the score,
    * sort best-match-first (the $meta sort is always descending —
    * Mongo contract), tie-break by doc_id, limit. The score is the
    * deterministic surrogate (total occurrences of the distinct search
    * terms among the document's tokens — exact integer; Mongo's own is
    * an index-internal tf weighting, so the SURFACE is the parity).
    * No $language → english analyzer (r18): the score counts in the
    * ANALYZED token space, the same space the $text matched in.
    * The membership probe plans through the array_position→InSet rule;
    * scoring is per-row scan work, the sort is top-k bounded. */
  def mqlTextScore(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftRules.register(s)
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang")))),
      col("meta"),
      """[
        | {"$match": {"$text": {"$search": "vector hash table"}}},
        | {"$addFields": {"score": {"$meta": "textScore"}}},
        | {"$sort": {"score": {"$meta": "textScore"}, "doc_id": 1}},
        | {"$limit": 15},
        | {"$project": {"doc_id": 1, "score": 1}}
        |]""".stripMargin)
  }

  def mqlPipeline(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("source"),
          col("n_chars")))),
      col("meta"),
      """[
        | {"$match": {"n_chars": {"$gte": 120}}},
        | {"$group": {"_id": "$lang",
        |   "n": {"$sum": 1},
        |   "total_chars": {"$sum": {"$toLong": "$n_chars"}},
        |   "max_chars": {"$max": {"$toLong": "$n_chars"}}}},
        | {"$match": {"n": {"$gte": 5}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)

  /** $project METADATA exclusion under the gate: the frame carries only
    * (doc_id, meta) so "info.source" exists solely inside the JSON
    * document; {"info.source": 0} rewrites the root via JsonRewrite
    * (the dotted path descends into the sub-document), observable both
    * through "$$ROOT" (the rewritten text) and through the now-null
    * "$info.source" resolution ($ifNull fallback fires). */
  def mqlProjectExclude(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"),
          struct(col("source"), col("n_chars")).as("info"))))
        .select(col("doc_id"), col("meta")),
      col("meta"),
      """[
        | {"$match": {"lang": {"$in": ["en", "de"]}}},
        | {"$project": {"info.source": 0}},
        | {"$addFields": {
        |   "doc": "$$ROOT",
        |   "src_after": {"$ifNull": ["$info.source", "gone"]}}},
        | {"$sort": {"doc_id": 1}}
        |]""".stripMargin)
      .select(col("doc_id").as("did"), col("doc"), col("src_after"))

  /** $replaceRoot DOCUMENT form under the gate: the new root is composed
    * from computed expressions ({newRoot: {k: expr}}), then later stages
    * resolve fields inside it — including a numeric $match that
    * round-trips a computed double through the JSON text (Jackson emits
    * shortest round-trippable reprs, so the re-parse is exact). */
  def mqlReplaceRootDoc(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("source"),
          col("n_chars"))))
        .select(col("doc_id"), col("meta")),
      col("meta"),
      """[
        | {"$replaceRoot": {"newRoot": {
        |   "label": {"$concat": [{"$toUpper": "$lang"}, "/", "$source"]},
        |   "kchars": {"$divide": [{"$toLong": "$n_chars"}, 1000]}}}},
        | {"$match": {"kchars": {"$gte": 0.5}}},
        | {"$project": {"doc_id": 1, "label": 1,
        |   "kchars": {"$toDouble": "$kchars"}}},
        | {"$sort": {"doc_id": 1}}
        |]""".stripMargin)

  /** The $group accumulator breadth gate — $count (Mongo 5 form),
    * $first/$last (min_by/max_by over the prior $sort key: the per-group
    * top-1 runs inside partial aggregation, no window, no extra
    * shuffle), $push (deterministic: per-group sort_array over the
    * $sort key), $addToSet (canonical sorted set). Arrays are joined to
    * strings ONLY for the oracle compare (pandas can't hash list
    * cells); the pipeline itself returns real ARRAY columns. */
  def mqlPipelineAccum(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("source"),
          col("n_chars")))),
      col("meta"),
      """[
        | {"$match": {"n_chars": {"$gte": 120}}},
        | {"$sort": {"doc_id": 1}},
        | {"$group": {"_id": "$lang",
        |   "n": {"$count": {}},
        |   "first_src": {"$first": "$source"},
        |   "last_src": {"$last": "$source"},
        |   "srcs": {"$addToSet": "$source"},
        |   "docs": {"$push": "$doc_id"}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)
      .select(col("_id"), col("n"), col("first_src"), col("last_src"),
        array_join(col("srcs"), ",").as("srcs"),
        array_join(transform(col("docs"), _.cast("string")), ",")
          .as("docs"))

  /** The Mongo 5.2 N-accumulator family under the gate: $topN/$bottomN
    * (own sortBy, independent of the pipeline $sort) and $firstN/$lastN
    * (pipeline document order) — all four against one oracle. The
    * sorted-struct tie-break is (sort key, output value) in the SORT
    * DIRECTION (a descending sortBy reverses both fields), which the
    * oracle replicates verbatim. */
  def mqlPipelineTopN(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("source"),
          col("n_chars")))),
      col("meta"),
      """[
        | {"$sort": {"doc_id": 1}},
        | {"$group": {"_id": "$lang",
        |   "big3": {"$topN": {"n": 3, "sortBy": {"n_chars": -1},
        |            "output": "$doc_id"}},
        |   "small3": {"$bottomN": {"n": 3, "sortBy": {"n_chars": -1},
        |            "output": "$doc_id"}},
        |   "first2": {"$firstN": {"n": 2, "input": "$source"}},
        |   "last2": {"$lastN": {"n": 2, "input": "$source"}}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)
      .select(col("_id"),
        array_join(transform(col("big3"), _.cast("string")), ",")
          .as("big3"),
        array_join(transform(col("small3"), _.cast("string")), ",")
          .as("small3"),
        array_join(col("first2"), ",").as("first2"),
        array_join(col("last2"), ",").as("last2"))

  /** $sortByCount under the gate: the Mongo frequency-table shorthand
    * ($group by value + $sort by count desc). Equal counts order by
    * _id ascending in both engines — the stage's documented
    * deterministic tie-break. */
  def mqlSortByCount(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("n_chars")))),
      col("meta"),
      """[
        | {"$match": {"n_chars": {"$gte": 100}}},
        | {"$sortByCount": "$lang"}
        |]""".stripMargin)

  /** $bucket under the gate: half-open numeric ranges labeled by lower
    * bound, out-of-range rows (both below 100 and above 500 exist in
    * the data) landing in the default bucket, and a non-default output
    * accumulator set — the Mongo histogram idiom as ONE grouped
    * aggregation (a when-chain bucket id, no joins, no second pass). */
  def mqlBucket(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("n_chars")))),
      col("meta"),
      """[
        | {"$bucket": {"groupBy": "$n_chars",
        |   "boundaries": [100, 200, 300, 400, 500],
        |   "default": -1,
        |   "output": {
        |     "n": {"$sum": 1},
        |     "total_chars": {"$sum": {"$toLong": "$n_chars"}},
        |     "max_chars": {"$max": {"$toLong": "$n_chars"}}}}}
        |]""".stripMargin)

  /** $unionWith under the gate: the live collection's English docs
    * concatenated with an "archive" collection (same canonical layout,
    * offset ids) pre-shaped by a sub-pipeline, then rolled up — the
    * Mongo multi-collection union. The union is a zero-shuffle
    * concatenation; only the $group moves data. */
  def mqlUnionWith(s: SparkSession, dir: String): DataFrame = {
    def shaped = t(s, dir, "documents")
      .withColumn("meta", to_json(struct(col("lang"), col("n_chars"))))
      .select(col("doc_id"), col("meta"))
    val resolver: String => (DataFrame, org.apache.spark.sql.Column) = {
      case "archive" =>
        (shaped.withColumn("doc_id", col("doc_id") + 10000), col("meta"))
      case other => throw new IllegalArgumentException(
        s"unknown collection: $other")
    }
    graft.filter.MqlPipeline.aggregate(
      shaped,
      col("meta"),
      """[
        | {"$match": {"lang": "en"}},
        | {"$unionWith": {"coll": "archive",
        |   "pipeline": [{"$match": {"n_chars": {"$gte": 300}}}]}},
        | {"$group": {"_id": "$lang", "n": {"$sum": 1}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin,
      resolver)
  }

  /** $setWindowFields under the gate: two window stages folding into the
    * one Catalyst plan — (1) sortBy the unique doc_id: document number,
    * running character total (documents [unbounded, current]), previous
    * doc's id ($shift by −1 with default), partition-total characters
    * (Mongo's default whole-partition window); (2) sortBy n_chars
    * descending — NON-unique, exercising $rank vs $denseRank tie
    * semantics (both are deterministic under ties; the order-sensitive
    * ops all live in stage 1 where the key is unique). Rank outputs
    * cast to long for the dtype-strict oracle compare. */
  def mqlWindowFields(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("n_chars"))))
        .select(col("doc_id"), col("meta")),
      col("meta"),
      """[
        | {"$match": {"n_chars": {"$gte": 120}}},
        | {"$setWindowFields": {
        |   "partitionBy": "$lang",
        |   "sortBy": {"doc_id": 1},
        |   "output": {
        |     "seq": {"$documentNumber": {}},
        |     "running_chars": {"$sum": {"$toLong": "$n_chars"},
        |       "window": {"documents": ["unbounded", "current"]}},
        |     "prev_id": {"$shift": {"output": "$doc_id", "by": -1,
        |       "default": -1}},
        |     "lang_chars": {"$sum": {"$toLong": "$n_chars"}}}}},
        | {"$setWindowFields": {
        |   "partitionBy": "$lang",
        |   "sortBy": {"n_chars": -1},
        |   "output": {
        |     "rnk": {"$rank": {}},
        |     "drnk": {"$denseRank": {}}}}},
        | {"$sort": {"lang": 1, "doc_id": 1}},
        | {"$project": {"doc_id": 1, "lang": "$lang", "seq": 1,
        |   "running_chars": 1, "prev_id": 1, "lang_chars": 1,
        |   "rnk": 1, "drnk": 1}}
        |]""".stripMargin)
      .select(col("doc_id"), col("lang"), col("seq").cast("long").as("seq"),
        col("running_chars"), col("prev_id"), col("lang_chars"),
        col("rnk").cast("long").as("rnk"),
        col("drnk").cast("long").as("drnk"))

  /** The Mongo 5.2/7.0 accumulator tail under the gate (r17; output
    * scalarized r18): $minN/$maxN (n extreme VALUES), $top/$bottom
    * (one output by the accumulator's own composite sortBy —
    * min_by/max_by on a struct key; the oracle orders by the same
    * struct, DuckDB row() lexicographic compare), and the GROUP forms
    * of $median/$percentile (exact interpolation, dyadic p so both
    * engines' (n−1)·p arithmetic is float-exact).
    *
    * Gate-shape discipline (r18, the one red CORRECTNESS_r17 row):
    * the driver's comparator lexsorts every output column, so a
    * registered query must emit only scalar columns — the array
    * accumulators are space-joined (the `encode_ids` device, SURVEY
    * §2.7) and the two-point $percentile unpacked to p25/p75 AFTER
    * the pipeline, leaving the accumulator semantics under the gate
    * unchanged. Verify now asserts this shape for every
    * oracle-backed query. */
  def mqlGroupNacc(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"),
          col("n_chars"), col("doc_id").as("did")))),
      col("meta"),
      """[
        | {"$group": {"_id": "$lang",
        |   "mn": {"$minN": {"input": {"$toLong": "$n_chars"},
        |     "n": 3}},
        |   "mx": {"$maxN": {"input": {"$toLong": "$n_chars"},
        |     "n": 3}},
        |   "tp": {"$top": {"sortBy": {"n_chars": 1, "did": 1},
        |     "output": {"$toLong": "$did"}}},
        |   "bt": {"$bottom": {"sortBy": {"n_chars": 1, "did": 1},
        |     "output": {"$toLong": "$did"}}},
        |   "med": {"$median": {"input": {"$toLong": "$n_chars"}}},
        |   "pcts": {"$percentile": {"input": {"$toLong": "$n_chars"},
        |     "p": [0.25, 0.75]}}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)
      .select(col("_id"),
        array_join(col("mn").cast("array<string>"), " ").as("mn"),
        array_join(col("mx").cast("array<string>"), " ").as("mx"),
        col("tp"), col("bt"), col("med"),
        element_at(col("pcts"), 1).as("p25"),
        element_at(col("pcts"), 2).as("p75"))

  /** $expMovingAvg under the gate (r17): Mongo's N-form EMA as the
    * exact integer-micro recurrence (s₁ = x₁·10⁶, sᵢ = ⌊(2xᵢ·10⁶ +
    * (N−1)sᵢ₋₁)/(N+1)⌋ — floor division, negatives planted), one
    * linear native scan per partition, the oracle replaying the
    * identical recurrence as a RECURSIVE CTE. The partition key is a
    * 128-way user bucket — the realistic per-entity EMA shape AND the
    * scale shape: an EMA is sequential WITHIN a partition by
    * definition (every value depends on the whole prefix), so
    * parallelism = partition count; a 5-event-type partitioning
    * measured 31.7 s at sf10 (five 400k-row sequential scans), the
    * 128-way key keeps per-task work flat as the corpus grows. */
  def mqlExpMovingAvg(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"),
          (col("user_id") % 128).as("uid"),
          (col("event_id") % 997 - 200).as("v")))),
      col("meta"),
      """[
        | {"$setWindowFields": {"partitionBy": "$uid",
        |   "sortBy": {"eid": 1},
        |   "output": {"ema": {"$expMovingAvg": {
        |     "input": {"$toLong": "$v"}, "N": 20}}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "uid": {"$toLong": "$uid"}, "ema": 1}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 400}
        |]""".stripMargin)

  /** $expMovingAvg ALPHA form under the gate (r18 — lifts the r17
    * refusal): alpha quantized to exact parts-per-million (0.25 →
    * A = 250000), the same native integer-micro partition scan with
    * weights (A, 10⁶−A, 10⁶), the oracle replaying the identical
    * recurrence as a recursive CTE. Same 128-way fixture as the
    * N-form gate. */
  def mqlExpMovingAvgAlpha(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .withColumn("meta", to_json(struct(
          col("event_id").cast("long").as("eid"),
          (col("user_id") % 128).as("uid"),
          (col("event_id") % 997 - 200).as("v")))),
      col("meta"),
      """[
        | {"$setWindowFields": {"partitionBy": "$uid",
        |   "sortBy": {"eid": 1},
        |   "output": {"ema": {"$expMovingAvg": {
        |     "input": {"$toLong": "$v"}, "alpha": 0.25}}}}},
        | {"$project": {"event_id": {"$toLong": "$eid"},
        |   "uid": {"$toLong": "$uid"}, "ema": 1}},
        | {"$sort": {"event_id": 1}},
        | {"$limit": 400}
        |]""".stripMargin)

  /** $covariancePop/$covarianceSamp window operators under the gate
    * (r17): covariance of (n_chars, a planted deterministic second
    * series) per language, whole-partition default window AND a
    * running documents frame, $round-ed to 6 decimals on both sides
    * (the float-aggregate stance — parallel covariance merges differ
    * from the oracle's serial pass by summation-order ulps). */
  def mqlWindowCov(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"),
          col("n_chars"),
          (col("doc_id") % 97).as("x2"))))
        .select(col("doc_id"), col("meta")),
      col("meta"),
      """[
        | {"$setWindowFields": {
        |   "partitionBy": "$lang",
        |   "sortBy": {"doc_id": 1},
        |   "output": {
        |     "cp": {"$covariancePop": [{"$toLong": "$n_chars"},
        |       {"$toLong": "$x2"}]},
        |     "cs": {"$covarianceSamp": [{"$toLong": "$n_chars"},
        |       {"$toLong": "$x2"}]},
        |     "run_cp": {"$covariancePop": [{"$toLong": "$n_chars"},
        |       {"$toLong": "$x2"}],
        |       "window": {"documents": ["unbounded", "current"]}}}}},
        | {"$sort": {"doc_id": 1}},
        | {"$project": {"doc_id": 1,
        |   "cp": {"$round": ["$cp", 6]},
        |   "cs": {"$round": ["$cs", 6]},
        |   "run_cp": {"$round": ["$run_cp", 6]}}}
        |]""".stripMargin)

  /** Window-scoped N-accumulators under the gate (r18 — Mongo 5.2
    * allows $minN/$maxN/$firstN/$lastN/$topN/$bottomN inside
    * $setWindowFields with documents bounds; the group twins shipped
    * r10/r17): sorted-collect over the FRAME + slice — a sliding
    * [-3, current] frame for the value accumulators and a running
    * [unbounded, current] $topN by its OWN descending composite
    * sortBy. Output arrays are space-joined AFTER the pipeline (the
    * r18 scalar-gate discipline).
    *
    * Partition shape (the EMA lesson, caught at sf10-at-birth): a
    * RUNNING collect frame costs O(p·log p) PER ROW in partition
    * size p (every row sorts its grown prefix — struct comparators
    * evaluate interpreted), so partition size must stay BOUNDED as
    * the corpus grows. The fixture partitions by doc_id DIV 50 —
    * the per-entity shape a real running-topN carries (per user /
    * session / thread: MORE entities with corpus growth, bounded
    * history per entity). The two rejected shapes both measured
    * superlinear at sf10-at-birth: the 5-value lang column (100k
    * rows/partition, killed mid-run) and a FIXED modulus bucket
    * (p grows linearly with the corpus — 409 s at sf10). */
  def mqlWindowNacc(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          (col("doc_id") / 50).cast("long").as("grp"),
          col("n_chars"), col("doc_id").as("did"))))
        .select(col("doc_id"), col("meta")),
      col("meta"),
      """[
        | {"$setWindowFields": {"partitionBy": "$grp",
        |   "sortBy": {"doc_id": 1},
        |   "output": {
        |     "mn": {"$minN": {"input": {"$toLong": "$n_chars"},
        |       "n": 2}, "window": {"documents": [-3, "current"]}},
        |     "mx": {"$maxN": {"input": {"$toLong": "$n_chars"},
        |       "n": 2}, "window": {"documents": [-3, "current"]}},
        |     "ln": {"$lastN": {"input": {"$toLong": "$n_chars"},
        |       "n": 2}, "window": {"documents": [-3, "current"]}},
        |     "tp": {"$topN": {"n": 2,
        |       "sortBy": {"n_chars": -1, "did": -1},
        |       "output": {"$toLong": "$did"}},
        |       "window": {"documents": ["unbounded", "current"]}}}}},
        | {"$sort": {"doc_id": 1}},
        | {"$project": {"doc_id": 1, "mn": 1, "mx": 1, "ln": 1,
        |   "tp": 1}}
        |]""".stripMargin)
      .select(col("doc_id"),
        array_join(col("mn").cast("array<string>"), " ").as("mn"),
        array_join(col("mx").cast("array<string>"), " ").as("mx"),
        array_join(col("ln").cast("array<string>"), " ").as("ln"),
        array_join(col("tp").cast("array<string>"), " ").as("tp"))

  /** The rest of Mongo 5.0's window-operator surface under the gate
    * (r18): $first/$last (frame's sortBy-order endpoints), $push
    * (frame values in frame order) and $addToSet (sorted distinct
    * set — the group twins' determinism stance) over a sliding
    * frame, $stdDevPop (whole-partition default window) and
    * $stdDevSamp (running frame — null on the one-row prefix, both
    * engines) in the covariance gate's explicit moment form. Same
    * bounded per-entity partition (doc_id DIV 50) and scalar-output
    * discipline (arrays space-joined) as mql_window_nacc. */
  def mqlWindowOps2(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          (col("doc_id") / 50).cast("long").as("grp"),
          col("n_chars"))))
        .select(col("doc_id"), col("meta")),
      col("meta"),
      """[
        | {"$setWindowFields": {"partitionBy": "$grp",
        |   "sortBy": {"doc_id": 1},
        |   "output": {
        |     "fs": {"$first": {"$toLong": "$n_chars"},
        |       "window": {"documents": [-3, "current"]}},
        |     "ls": {"$last": {"$toLong": "$n_chars"},
        |       "window": {"documents": [-3, "current"]}},
        |     "ps": {"$push": {"$toLong": "$n_chars"},
        |       "window": {"documents": [-3, "current"]}},
        |     "st": {"$addToSet": {"$toLong": "$n_chars"},
        |       "window": {"documents": [-3, "current"]}},
        |     "sd": {"$stdDevPop": {"$toLong": "$n_chars"}},
        |     "ss": {"$stdDevSamp": {"$toLong": "$n_chars"},
        |       "window": {"documents": ["unbounded", "current"]}}}}},
        | {"$sort": {"doc_id": 1}},
        | {"$project": {"doc_id": 1, "fs": 1, "ls": 1, "ps": 1,
        |   "st": 1, "sd": {"$round": ["$sd", 6]},
        |   "ss": {"$round": ["$ss", 6]}}}
        |]""".stripMargin)
      .select(col("doc_id"), col("fs"), col("ls"),
        array_join(col("ps").cast("array<string>"), " ").as("ps"),
        array_join(col("st").cast("array<string>"), " ").as("st"),
        col("sd"), col("ss"))

  /** $setWindowFields RANGE windows under the gate — Mongo's
    * value-keyed frames ({window: {range: [lo, hi]}} over one
    * ascending numeric sortBy) mapped to Spark's rangeBetween: each
    * doc aggregates over the docs of its language within 100 chars
    * below its own length. RANGE semantics include sort-value peers in
    * both engines, so ties are deterministic without a tiebreak
    * column. Same one-Window-node plan as the documents form. */
  def mqlWindowRange(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("n_chars"))))
        .select(col("doc_id"), col("n_chars"), col("meta")),
      col("meta"),
      """[
        | {"$setWindowFields": {
        |   "partitionBy": "$lang",
        |   "sortBy": {"n_chars": 1},
        |   "output": {
        |     "near_n": {"$count": {}, "window": {"range": [-100, 0]}},
        |     "near_chars": {"$sum": {"$toLong": "$n_chars"},
        |       "window": {"range": [-100, "current"]}}}}},
        | {"$sort": {"doc_id": 1}},
        | {"$project": {"doc_id": 1, "lang": "$lang",
        |   "near_n": 1, "near_chars": 1}}
        |]""".stripMargin)

  /** Time-UNIT range windows under the gate — the sliding-lookback
    * query every abuse/velocity check runs ("events by this user in
    * the last hour"): {range: [-1, 0], unit: "hour"} keys the frame
    * on the timestamp sortBy's epoch-micros, bounds scaled by the
    * unit. One Window node, no self-join — the naive formulation is
    * a time-range self-join that [[Bucketing]] exists to block. */
  def mqlWindowUnit(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      // user_id rides as a REAL column: "$user_id" would otherwise
      // resolve through the metadata STRING view, and a JSON number's
      // string view is null by MQL bracketing (one null partition)
      events(s, dir)
        .withColumn("meta", to_json(struct(col("event_type"))))
        .select(col("event_id"), col("ts"), col("user_id"), col("meta")),
      col("meta"),
      """[
        | {"$setWindowFields": {
        |   "partitionBy": "$user_id",
        |   "sortBy": {"ts": 1},
        |   "output": {
        |     "recent_n": {"$count": {},
        |       "window": {"range": [-1, 0], "unit": "hour"}}}}},
        | {"$sort": {"event_id": 1}},
        | {"$project": {"event_id": 1, "recent_n": 1}}
        |]""".stripMargin)

  /** $fill under the gate: nulls planted in a numeric column (every
    * n_chars divisible by 7) and a string column (source 'src1'), then
    * one $fill stage repairs both — locf (last observed carried forward
    * per language, doc_id order; leading nulls stay null) and a
    * constant value fill. The locf is ONE running-frame window — no
    * self-join, no driver pass; at 100 TB it shuffles once on the
    * partition key like any window. */
  def mqlFill(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"))))
        .select(col("doc_id"), col("meta"),
          when(col("n_chars") % 7 === 0, lit(null))
            .otherwise(col("n_chars")).cast("double").as("chars"),
          when(col("source") === "src1", lit(null))
            .otherwise(col("source")).as("src")),
      col("meta"),
      """[
        | {"$fill": {"partitionBy": "$lang", "sortBy": {"doc_id": 1},
        |   "output": {
        |     "chars": {"method": "locf"},
        |     "src": {"value": "unknown"}}}},
        | {"$sort": {"lang": 1, "doc_id": 1}},
        | {"$project": {"doc_id": 1, "lang": "$lang", "chars": 1,
        |   "src": 1}}
        |]""".stripMargin)

  /** $fill `method: "linear"` under the gate — the r11 verdict's gap:
    * a user hitting linear interpolation got a loud refusal where a
    * green gate was one composition away. Nulls planted on the n_chars
    * axis (every multiple of 7), then linearly interpolated per
    * language along doc_id with the resample_interp exact-integer
    * time-weighted device (two running-frame windows bracket each null
    * between its nearest observed neighbours; integer cross-multiply +
    * one truncating division — both engines' integer division
    * truncates). Leading/trailing nulls stay null (Mongo parity). One
    * partition-key shuffle at any scale, like every window. */
  def mqlFillLinear(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"))))
        .select(col("doc_id"), col("meta"),
          when(col("n_chars") % 7 === 0, lit(null))
            .otherwise(col("n_chars")).cast("long").as("chars")),
      col("meta"),
      """[
        | {"$fill": {"partitionBy": "$lang", "sortBy": {"doc_id": 1},
        |   "output": {"chars": {"method": "linear"}}}},
        | {"$sort": {"lang": 1, "doc_id": 1}},
        | {"$project": {"doc_id": 1, "lang": "$lang", "chars": 1}}
        |]""".stripMargin)

  /** $densify under the gate: documents coarsened to 10-char buckets,
    * then per-language missing buckets generated across each
    * partition's [min, max] grid — bounds agg (one row per lang) →
    * sequence explode → LEFT ANTI against existing (lang, bucket) →
    * null-filled union (generated rows carry null doc_id, Mongo's
    * generated-document shape). Within any (lang, bucket) the rows are
    * either all existing or one generated, so the doc_id tiebreak never
    * compares null against non-null and both engines' null-order
    * conventions agree. */
  def mqlDensify(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"))))
        .select(col("doc_id"), col("lang"),
          (floor(col("n_chars") / 10) * 10).cast("long").as("bucket")),
      col("meta"),
      """[
        | {"$densify": {"field": "bucket",
        |   "partitionByFields": ["lang"],
        |   "range": {"step": 10, "bounds": "partition"}}},
        | {"$sort": {"lang": 1, "bucket": 1, "doc_id": 1}},
        | {"$project": {"doc_id": 1, "lang": 1, "bucket": 1}}
        |]""".stripMargin)

  /** $graphLookup under the gate: documents shaped into a binary-tree
    * parent relation (parent = floor(doc_id/2); the root 0 is its own
    * parent — a genuine CYCLE the visited-set must terminate), then a
    * self-referential ancestor walk to depth 2. The traversal is
    * distributed BFS over distinct start values (iterative joins, the
    * dedup_clusters pattern); the oracle is DuckDB's WITH RECURSIVE
    * with min-depth dedup — BFS first-encounter depth ≡ the recursive
    * CTE's minimum depth per (src, ancestor). Output flattened via
    * $unwind for the row-compare. */
  def mqlGraphLookup(s: SparkSession, dir: String): DataFrame = {
    def shaped = t(s, dir, "documents")
      .withColumn("meta", to_json(struct(col("lang"))))
      .select(col("doc_id"),
        floor(col("doc_id") / 2).cast("long").as("parent_id"),
        col("meta"))
    val resolver: String => (DataFrame, org.apache.spark.sql.Column) = {
      case "docs" => (shaped.select("doc_id", "parent_id"), lit(null))
      case other => throw new IllegalArgumentException(
        s"unknown collection: $other")
    }
    graft.filter.MqlPipeline.aggregate(
      shaped, col("meta"),
      """[
        | {"$graphLookup": {"from": "docs",
        |   "startWith": "$parent_id",
        |   "connectFromField": "parent_id",
        |   "connectToField": "doc_id",
        |   "as": "ancestors", "maxDepth": 2, "depthField": "depth"}},
        | {"$unwind": "$ancestors"},
        | {"$sort": {"doc_id": 1}}
        |]""".stripMargin,
      resolver)
      .select(col("doc_id"),
        col("ancestors.doc_id").as("anc_id"),
        col("ancestors.depth").as("depth"))
      .orderBy("doc_id", "depth", "anc_id")
  }

  /** $facet under the gate: one pass fans into two sub-pipelines — a
    * per-language roll-up and a filtered $count — and the single facet
    * document is flattened for the row compare ($unwind one facet; the
    * scalar facet read by element_at). The $match BEFORE the $facet
    * prunes once for both facets (the checkpointed-shared-input shape). */
  def mqlFacet(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("n_chars")))),
      col("meta"),
      """[
        | {"$match": {"n_chars": {"$gte": 100}}},
        | {"$facet": {
        |   "by_lang": [
        |     {"$group": {"_id": "$lang", "n": {"$sum": 1}}},
        |     {"$sort": {"_id": 1}}],
        |   "big": [
        |     {"$match": {"n_chars": {"$gte": 400}}},
        |     {"$count": "n"}]}},
        | {"$unwind": "$by_lang"}
        |]""".stripMargin)
      .select(col("by_lang._id").as("lang"),
        col("by_lang.n").as("n"),
        element_at(col("big"), 1).getField("n").as("big_n"))
      .orderBy("lang")

  /** $bucketAuto under the gate: documents split into 4 approximately
    * equal-population buckets by n_chars — boundary values selected at
    * exact ranks floor(k·n/4) by the distributed rank device, rows
    * assigned by value (half-open at each boundary), _id = {min, max}
    * of the actual bucket values flattened for the compare. The oracle
    * recomputes the identical ranks/boundaries via row_number and the
    * identical assignment by counting boundaries ≤ v. */
  def mqlBucketAuto(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("n_chars")))),
      col("meta"),
      """[
        | {"$bucketAuto": {"groupBy": "$n_chars", "buckets": 4,
        |   "output": {
        |     "n": {"$sum": 1},
        |     "total_chars": {"$sum": {"$toLong": "$n_chars"}}}}}
        |]""".stripMargin)
      .select(col("_id.min").as("lo"), col("_id.max").as("hi"),
        col("n"), col("total_chars"))

  /** $derivative/$integral under the gate: per-user event series
    * (x = event-time SECONDS, y = floor(value)) through one
    * $setWindowFields — instantaneous rate over a [-1, 0] frame (the
    * discrete derivative) and running trapezoid area. The axes are
    * INTEGRAL by construction, so every trapezoid is an exact dyadic
    * value (k/2) and the running sums stay exactly representable —
    * necessary because Spark accumulates window sums in frame order
    * while DuckDB aggregates them in segment-tree order, and a
    * float-fractional series would diverge in the low bits (observed
    * before this shaping). The derivative stays a single double
    * division; tied timestamps (same second) yield null rates in both
    * engines via the zero-x-span guard. */
  def mqlWindowCalculus(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts) DIV 1000000").as("sec"),
          floor(col("value")).cast("double").as("yv")),
      to_json(struct(col("user_id"))),
      """[
        | {"$setWindowFields": {
        |   "partitionBy": "$user_id",
        |   "sortBy": {"sec": 1, "event_id": 1},
        |   "output": {
        |     "vel": {"$derivative": {"input": "$yv"},
        |       "window": {"documents": [-1, 0]}},
        |     "area": {"$integral": {"input": "$yv"},
        |       "window": {"documents": ["unbounded", "current"]}}}}},
        | {"$sort": {"user_id": 1, "sec": 1, "event_id": 1}},
        | {"$project": {"user_id": 1, "event_id": 1, "vel": 1,
        |   "area": 1}}
        |]""".stripMargin)

  /** $median/$percentile window ops under the gate: per-language exact
    * interpolated quantiles of n_chars through $setWindowFields
    * (whole-partition frames), flattened to one row per language. The
    * values are integral, so the linear interpolation (lo + frac·(hi−lo)
    * with dyadic frac) is exact in both engines — Spark's percentile()
    * and DuckDB's quantile_cont share the (n−1)·p rank convention. */
  def mqlWindowPercentile(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("double").as("chars")),
      to_json(struct(col("lang"))),
      """[
        | {"$setWindowFields": {
        |   "partitionBy": "$lang",
        |   "sortBy": {"doc_id": 1},
        |   "output": {
        |     "med": {"$median": {"input": "$chars",
        |       "method": "approximate"}},
        |     "pcts": {"$percentile": {"input": "$chars",
        |       "p": [0.25, 0.75], "method": "approximate"}}}}}
        |]""".stripMargin)
      .select(col("lang"), col("med"),
        element_at(col("pcts"), 1).as("p25"),
        element_at(col("pcts"), 2).as("p75"))
      .distinct()
      .orderBy("lang")

  /** Pipeline $unwind: array fan-out then per-element roll-up — the
    * Mongo unwind → group idiom over the same tags-array metadata as
    * mql_docs_array. */
  def mqlUnwind(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          array(col("lang"), col("source")).as("tags"), col("n_chars")))),
      col("meta"),
      """[
        | {"$match": {"n_chars": {"$gte": 120}}},
        | {"$unwind": "$tags"},
        | {"$group": {"_id": "$tags", "n": {"$sum": 1}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)

  /** $stdDevPop/$stdDevSamp accumulators under the gate: per-language
    * dispersion of document lengths, $round-ed to 6 decimals on BOTH
    * sides — parallel stddev merges differ from the oracle's by ~1 ulp
    * of summation order, and the rounding absorbs exactly that (the
    * float-aggregate stance; integer-exact aggregates use cents
    * instead). */
  def mqlStddev(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang"), col("n_chars")))),
      col("meta"),
      """[
        | {"$group": {"_id": "$lang",
        |   "sd_pop": {"$stdDevPop": {"$toLong": "$n_chars"}},
        |   "sd_samp": {"$stdDevSamp": {"$toLong": "$n_chars"}},
        |   "n": {"$sum": 1}}},
        | {"$project": {"_id": 1,
        |   "sd_pop": {"$round": ["$sd_pop", 6]},
        |   "sd_samp": {"$round": ["$sd_samp", 6]},
        |   "n": 1}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)

  /** $lookup under the oracle gate: left outer equi-match against a
    * sibling collection (Mongo's cross-collection join,
    * /root/reference delegated-pipeline surface), matches re-nested as an
    * array then $unwind-flattened — the join fan-out makes the re-nest
    * observable (each doc matches one foreign row per distinct source of
    * its language; docs whose language has no foreign row drop at
    * $unwind, the Mongo default). The oracle replays the same join+count
    * in SQL. */
  def mqlLookup(s: SparkSession, dir: String): DataFrame = {
    val local = t(s, dir, "documents")
      .select(col("doc_id"), to_json(struct(col("lang"))).as("meta"))
    val foreign = t(s, dir, "documents")
      .filter(col("lang").isin("en", "fr", "de"))
      .select(col("lang"), col("source")).distinct()
      .select(to_json(struct(col("lang"), col("source"))).as("fmeta"))
    graft.filter.MqlPipeline.aggregate(
      local, col("meta"),
      """[
        | {"$lookup": {"from": "langsrc", "localField": "lang",
        |   "foreignField": "lang", "as": "matches"}},
        | {"$unwind": "$matches"},
        | {"$group": {"_id": "$lang", "n": {"$sum": 1}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin,
      name => {
        require(name == "langsrc", s"unknown collection: $name")
        (foreign, col("fmeta"))
      })
  }

  /** The CORRELATED $lookup form under the gate ({let, pipeline} —
    * Mongo's general lookup): the correlated `$expr` equality becomes
    * the type-tagged equi-join key (hashable — a general correlated
    * predicate would nested-loop), and the uncorrelated $match in the
    * sub-pipeline pre-filters the foreign side before the join (it
    * commutes — the oracle proves the factoring). */
  def mqlLookupLet(s: SparkSession, dir: String): DataFrame = {
    val local = t(s, dir, "documents")
      .select(col("doc_id"), to_json(struct(col("lang"))).as("meta"))
    val foreign = t(s, dir, "documents")
      .filter(col("lang").isin("en", "fr", "de"))
      .select(col("lang"), col("source")).distinct()
      .select(to_json(struct(col("lang"), col("source"))).as("fmeta"))
    graft.filter.MqlPipeline.aggregate(
      local, col("meta"),
      """[
        | {"$lookup": {"from": "langsrc",
        |   "let": {"l": "$lang"},
        |   "pipeline": [
        |     {"$match": {"source": {"$gte": "src12"}}},
        |     {"$match": {"$expr": {"$eq": ["$$l", "$lang"]}}}],
        |   "as": "matches"}},
        | {"$unwind": "$matches"},
        | {"$group": {"_id": "$lang", "n": {"$sum": 1}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin,
      name => {
        require(name == "langsrc", s"unknown collection: $name")
        (foreign, col("fmeta"))
      })
  }

  /** Array expression operators under the gate ($size/$arrayElemAt over
    * a variable-length metadata array): long docs carry a third tag, so
    * the count and the negative-index (last-element) access genuinely
    * vary per row; the oracle replays the synthesis as CASE logic. */
  def mqlArrayExpr(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          when(col("n_chars") > 500,
            array(col("lang"), col("source"), lit("long")))
            .otherwise(array(col("lang"), col("source"))).as("tags")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "ntags": {"$size": "$tags"},
        |   "first": {"$arrayElemAt": ["$tags", 0]},
        |   "last": {"$arrayElemAt": ["$tags", -1]}}},
        | {"$sort": {"doc_id": 1}},
        | {"$project": {"doc_id": 1, "ntags": 1, "first": 1, "last": 1}}
        |]""".stripMargin)

  /** Array lambda battery under the gate: $map / $filter / $reduce
    * (with `"$$var"` variables and nested composition) over a JSON
    * numeric-array metadata field. Every lambda compiles to a Spark
    * higher-order function (transform/filter/aggregate) — per-row
    * codegen'd, zero shuffle; VARIANT elements cast to double at their
    * use sites (MQL numeric bracketing). */
  def mqlArrayLambda(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(array(
          col("n_chars") % 7, col("n_chars") % 11,
          col("n_chars") % 13, col("doc_id") % 5).as("vals")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "big": {"$size": {"$filter": {"input": "$vals", "as": "x",
        |     "cond": {"$gte": ["$$x", 5]}}}},
        |   "total": {"$toLong": {"$reduce": {"input": "$vals",
        |     "initialValue": 0, "in": {"$add": ["$$value", "$$this"]}}}},
        |   "scaled": {"$toLong": {"$reduce": {"input":
        |     {"$map": {"input": "$vals", "as": "x",
        |       "in": {"$multiply": ["$$x", 2]}}},
        |     "initialValue": 0, "in": {"$add": ["$$value", "$$this"]}}}}
        | }},
        | {"$sort": {"doc_id": 1}},
        | {"$project": {"doc_id": 1, "big": 1, "total": 1, "scaled": 1}}
        |]""".stripMargin)

  /** String operator battery under the gate: $split/$toUpper/$substrCP/
    * $indexOfCP/$trim/$regexMatch/$replaceAll — over real columns AND
    * the padded-string metadata view (the $trim input). All per-row
    * codegen'd string expressions at scan speed. */
  def mqlStringExpr(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          concat(lit("  "), col("lang"), lit("  ")).as("padded")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "n_toks": {"$size": {"$split": ["$text", " "]}},
        |   "up": {"$toUpper": "$lang"},
        |   "pre": {"$substrCP": ["$source", 0, 3]},
        |   "pos1": {"$indexOfCP": ["$source", "1"]},
        |   "clean": {"$trim": {"input": "$padded"}},
        |   "isnum": {"$toLong": {"$cond": [
        |     {"$regexMatch": {"input": "$source", "regex": "^src[0-9]$"}},
        |     1, 0]}},
        |   "repl": {"$replaceAll": {"input": "$source",
        |     "find": "src", "replacement": "S"}}
        | }},
        | {"$sort": {"doc_id": 1}},
        | {"$project": {"doc_id": 1, "n_toks": 1, "up": 1, "pre": 1,
        |   "pos1": 1, "clean": 1, "isnum": 1, "repl": 1}}
        |]""".stripMargin)

  /** Array set-algebra + $let battery under the gate: $setUnion /
    * $setIntersection / $setDifference (canonically sorted — Mongo
    * sets are unordered, so a deterministic order is the only
    * hashable contract), $sortArray / $indexOfArray, and $let-bound
    * named subexpressions. Integral-valued results re-emitted as
    * space-joined LONG strings (the encode_ids scalar-columns-only
    * convention). */
  def mqlArraySets(s: SparkSession, dir: String): DataFrame = {
    val piped = graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(
          array(col("n_chars") % 7, col("n_chars") % 11,
            col("doc_id") % 5).as("vals1"),
          array(col("n_chars") % 7, col("doc_id") % 3, lit(2L))
            .as("vals2")))),
      col("meta"),
      """[
        | {"$addFields": {
        |   "u": {"$setUnion": ["$vals1", "$vals2"]},
        |   "i": {"$setIntersection": ["$vals1", "$vals2"]},
        |   "d": {"$setDifference": ["$vals1", "$vals2"]},
        |   "rev": {"$sortArray": {"input": "$vals1", "sortBy": -1}},
        |   "pos3": {"$indexOfArray": ["$vals1", 3]},
        |   "score": {"$let": {
        |     "vars": {"t": {"$reduce": {"input": "$vals1",
        |       "initialValue": 0,
        |       "in": {"$add": ["$$value", "$$this"]}}}},
        |     "in": {"$toLong": {"$multiply": ["$$t", 10]}}}}}},
        | {"$sort": {"doc_id": 1}},
        | {"$project": {"doc_id": 1, "u": 1, "i": 1, "d": 1,
        |   "rev": 1, "pos3": 1, "score": 1}}
        |]""".stripMargin)
    // integral-valued double arrays → space-joined LONG strings (the
    // encode_ids scalar-columns-only convention for the oracle compare)
    def joined(c: String) = array_join(
      transform(col(c), x => x.cast("long").cast("string")), " ").as(c)
    piped.select(col("doc_id"), joined("u"), joined("i"), joined("d"),
      joined("rev"), col("pos3"), col("score"))
  }

  /** $densify with a TIME UNIT under the gate (Mongo 5.1's calendar
    * form): per-event-type day grids over the real timestamp column —
    * grid arithmetic in exact epoch-µs (both engines), generated rows
    * null-padded and flagged. The small user slice keeps the generated
    * volume proportional to span/step, the operator's own contract. */
  def mqlDensifyUnit(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("user_id") < 3)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("meta", to_json(struct(col("event_id"))))
    graft.filter.MqlPipeline.aggregate(ev, col("meta"),
      """[
        | {"$densify": {"field": "ts",
        |   "partitionByFields": ["event_type"],
        |   "range": {"step": 1, "unit": "day",
        |     "bounds": "partition"}}}
        |]""".stripMargin)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"),
        when(col("event_id").isNull, 1L).otherwise(0L).as("generated"))
      .orderBy("event_type", "tus", "generated")
  }

  /** CALENDAR-unit $densify under the gate (r16 — the r15 verdict's
    * #6 item): month-step grids over a planted month-end fixture
    * (Jan 31 + k months) so the day-of-month CLAMP decides grid
    * points — Feb 28 / Apr 30 / Jun 30 land off the naive 31st, and
    * both engines clamp identically (Spark add_months ≡ DuckDB
    * + INTERVAL MONTH, the bracket mql_date_add_cal pins). Rows exist
    * only at months {0,3,7,8}, so the stage must GENERATE the five
    * clamped gap points per partition; sub-day time-of-day (10:30:45)
    * rides every generated point unchanged. */
  def mqlDensifyDate(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .withColumn("m", (col("event_id") % 9).cast("int"))
      .filter(col("m").isin(0, 3, 7, 8))
      .withColumn("ts", timestamp_seconds(
        unix_date(add_months(to_date(lit("2023-01-31")), col("m")))
          .cast("long") * 86400L + 37845L))
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("meta", to_json(struct(col("event_id"))))
    graft.filter.MqlPipeline.aggregate(ev, col("meta"),
      """[
        | {"$densify": {"field": "ts",
        |   "partitionByFields": ["event_type"],
        |   "range": {"step": 1, "unit": "month",
        |     "bounds": "partition"}}}
        |]""".stripMargin)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"),
        when(col("event_id").isNull, 1L).otherwise(0L).as("generated"))
      .orderBy("event_type", "tus", "generated")
  }

  /** Explicit DATE-literal $densify bounds under the gate (r16 — the
    * last loud $densify bracket): [lo, hi) ISO bounds with a MONTH
    * unit — the grid anchors at the literal lo (Jan 31, so every
    * point clamps from the 31st) for EVERY partition regardless of
    * its own rows, and hi (exactly the k=8 grid point) is excluded by
    * the half-open contract. Rows exist only at months {1, 4}, both
    * landing exactly ON grid points (the planted add_months equals the
    * grid's), so six points generate per partition. */
  def mqlDensifyBounds(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .withColumn("m", (col("event_id") % 9).cast("int"))
      .filter(col("m").isin(1, 4))
      .withColumn("ts", timestamp_seconds(
        unix_date(add_months(to_date(lit("2023-01-31")), col("m")))
          .cast("long") * 86400L + 37845L))
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("meta", to_json(struct(col("event_id"))))
    graft.filter.MqlPipeline.aggregate(ev, col("meta"),
      """[
        | {"$densify": {"field": "ts",
        |   "partitionByFields": ["event_type"],
        |   "range": {"step": 1, "unit": "month",
        |     "bounds": ["2023-01-31T10:30:45",
        |                "2023-09-30T10:30:45"]}}}
        |]""".stripMargin)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"),
        when(col("event_id").isNull, 1L).otherwise(0L).as("generated"))
      .orderBy("event_type", "tus", "generated")
  }

  /** The $documents literal-source stage (r11, Mongo 5.1): the operand
    * array replaces the input stream, each document flowing through
    * the normal metadata-resolution path — here into $match + $group
    * accumulators. The input frame is ignored by contract (the stage
    * is a SOURCE); dir participates only through the signature. */
  def mqlDocuments(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .select(to_json(struct(col("doc_id"))).as("meta")),
      col("meta"),
      """[
        | {"$documents": [
        |   {"k": 5, "grp": "b", "w": 10},
        |   {"k": 1, "grp": "a", "w": 40},
        |   {"k": 3, "grp": "a", "w": 20},
        |   {"k": 9, "grp": "b", "w": 30}]},
        | {"$match": {"k": {"$gte": 2}}},
        | {"$group": {"_id": "$grp", "n": {"$sum": 1},
        |   "wsum": {"$sum": {"$toLong": "$w"}}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)

  /** $sample under the gate — the reproducible hash-rank form: the 50
    * "random" documents are a deterministic function of the documents
    * themselves, so the very sample membership sits under the oracle
    * hash (rand() could never). */
  def mqlSample(s: SparkSession, dir: String): DataFrame =
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("meta", to_json(struct(col("doc_id")))),
      col("meta"),
      """[
        | {"$sample": {"size": 50}},
        | {"$sort": {"doc_id": 1}},
        | {"$project": {"doc_id": 1, "lang": 1, "n_chars": 1}}
        |]""".stripMargin)

  /** Pipeline $out under the gate: Mongo's replace-the-collection
    * terminal stage in its library-over-parquet form — the shaped
    * pipeline result is materialized to the conf-rooted scratch
    * collection and the census that follows reads ENTIRELY from the
    * readback, so the $out sink and source both sit under the oracle
    * hash. */
  def mqlOut(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("graft.mql.out_dir",
      graft.core.Scratch.dir("mqlout", dir))
    graft.filter.MqlPipeline.aggregate(
      t(s, dir, "documents")
        .withColumn("meta", to_json(struct(col("lang")))),
      col("meta"),
      """[
        | {"$match": {"lang": {"$in": ["en", "fr"]}}},
        | {"$project": {"doc_id": 1, "lang": 1, "n_chars": 1}},
        | {"$out": "docs_enfr"},
        | {"$group": {"_id": "$lang", "n": {"$sum": 1},
        |   "total_chars": {"$sum": {"$toLong": "$n_chars"}}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)
  }

  /** Pipeline $merge under the gate: a shaped update slice ($match +
    * $addFields bump) merged into the base collection frame by doc_id
    * (replace + insert through ONE full-outer join), then a census so
    * the output stays compact. Mongo's pipeline-output upsert surface
    * over the engine's Upsert machinery. */
  def mqlMerge(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val src = t(s, dir, "documents")
      .filter(col("doc_id") >= 200 && col("doc_id") < 400)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("meta", to_json(struct(col("doc_id"))))
    graft.filter.MqlPipeline.aggregate(src, col("meta"),
      """[
        | {"$addFields": {"n_chars": {"$toLong":
        |     {"$add": ["$n_chars", 1000]}}}},
        | {"$project": {"doc_id": 1, "lang": 1, "n_chars": 1}},
        | {"$merge": {"into": "base", "on": "doc_id",
        |   "whenMatched": "replace", "whenNotMatched": "insert"}},
        | {"$sort": {"doc_id": 1}}
        |]""".stripMargin,
      name => {
        require(name == "base", s"unknown collection: $name")
        (base, col("doc_id").cast("string"))
      })
  }

  /** $regex with Mongo $options (inline (?i) flags) + $not composition,
    * under the oracle gate — the flags travel inside the pattern so any
    * regex engine (Java here, RE2 in the oracle) evaluates identically. */
  def mqlDocsRegexCi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("meta", to_json(struct(col("lang"), col("source"))))
      .filter(MqlFilter.toColumn(
        """{"source": {"$regex": "^SRC1$", "$options": "i"},
          | "lang": {"$not": {"$regex": "^E", "$options": "i"}}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** The MQL ARRAY operator family ($all, $size, $elemMatch) plus $type
    * under the oracle gate: metadata carries a real JSON array (the two
    * tag strings), and the filter requires all of {the doc's lang}, a
    * 2-element tag array, an element matching ^src, and n_chars typed as
    * an integral number. */
  def mqlDocsArray(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("meta", to_json(struct(
        array(col("lang"), col("source")).as("tags"),
        col("lang"), col("n_chars"))))
      .filter(MqlFilter.toColumn(
        """{"tags": {"$all": ["en"], "$size": 2,
          |          "$elemMatch": {"$regex": "^src"}},
          | "n_chars": {"$type": "long"}}""".stripMargin,
        MqlFilter.JsonResolver(col("meta"))))
      .select(col("doc_id"))
      .orderBy("doc_id")

  protected def mqlOracle: Map[String, String] = Map(
    "mql_documents" ->
      """SELECT * FROM (VALUES
        |  ('a', CAST(1 AS BIGINT), CAST(20 AS BIGINT)),
        |  ('b', CAST(2 AS BIGINT), CAST(40 AS BIGINT)))
        |  AS t(_id, n, wsum)
        |ORDER BY _id""".stripMargin,
    "mql_densify_unit" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id
        |  FROM events WHERE user_id < 3),
        |b AS (SELECT event_type, min(us) AS lo, max(us) AS hi
        |  FROM e GROUP BY 1),
        |g AS (SELECT event_type,
        |    unnest(generate_series(lo, hi, 86400000000)) AS us FROM b),
        |miss AS (SELECT g.event_type, g.us FROM g
        |  WHERE NOT EXISTS (SELECT 1 FROM e
        |    WHERE e.event_type = g.event_type AND e.us = g.us))
        |SELECT event_type, us AS tus, CAST(0 AS BIGINT) AS generated
        |FROM e
        |UNION ALL
        |SELECT event_type, us, CAST(1 AS BIGINT) FROM miss
        |ORDER BY event_type, tus, generated""".stripMargin,
    "mql_densify_date" ->
      """WITH e AS (SELECT event_type,
        |    epoch_us((DATE '2023-01-31' +
        |      INTERVAL ((event_id % 9)::INT) MONTH)::TIMESTAMP)
        |      + 37845000000 AS us
        |  FROM events WHERE (event_id % 9) IN (0, 3, 7, 8)),
        |b AS (SELECT event_type, min(us) AS lo, max(us) AS hi
        |  FROM e GROUP BY 1),
        |g AS (SELECT event_type, lo, hi,
        |    unnest(generate_series(0, date_diff('month',
        |      make_timestamp(lo), make_timestamp(hi)))) AS k FROM b),
        |g2 AS (SELECT event_type,
        |    epoch_us(make_timestamp(lo) + to_months(CAST(k AS INT)))
        |      AS us, hi FROM g),
        |miss AS (SELECT g2.event_type, g2.us FROM g2
        |  WHERE g2.us <= g2.hi AND NOT EXISTS (SELECT 1 FROM e
        |    WHERE e.event_type = g2.event_type AND e.us = g2.us))
        |SELECT event_type, us AS tus, CAST(0 AS BIGINT) AS generated
        |FROM e
        |UNION ALL
        |SELECT event_type, us, CAST(1 AS BIGINT) FROM miss
        |ORDER BY event_type, tus, generated""".stripMargin,
    "mql_densify_bounds" ->
      """WITH e AS (SELECT event_type,
        |    epoch_us((DATE '2023-01-31' +
        |      INTERVAL ((event_id % 9)::INT) MONTH)::TIMESTAMP)
        |      + 37845000000 AS us
        |  FROM events WHERE (event_id % 9) IN (1, 4)),
        |b AS (SELECT DISTINCT event_type,
        |    epoch_us(TIMESTAMP '2023-01-31 10:30:45') AS lo,
        |    epoch_us(TIMESTAMP '2023-09-30 10:30:45') AS hi FROM e),
        |g AS (SELECT event_type, lo, hi,
        |    unnest(generate_series(0, date_diff('month',
        |      make_timestamp(lo), make_timestamp(hi)))) AS k FROM b),
        |g2 AS (SELECT event_type,
        |    epoch_us(make_timestamp(lo) + to_months(CAST(k AS INT)))
        |      AS us, hi FROM g),
        |miss AS (SELECT g2.event_type, g2.us FROM g2
        |  WHERE g2.us < g2.hi AND NOT EXISTS (SELECT 1 FROM e
        |    WHERE e.event_type = g2.event_type AND e.us = g2.us))
        |SELECT event_type, us AS tus, CAST(0 AS BIGINT) AS generated
        |FROM e
        |UNION ALL
        |SELECT event_type, us, CAST(1 AS BIGINT) FROM miss
        |ORDER BY event_type, tus, generated""".stripMargin,
    // VERBATIM shared SQL — both engines parse the same recursive form,
    "mql_pipeline_topn" ->
      // list(... ORDER BY) replicates the sorted-struct tie-break:
      // a DESC sortBy reverses BOTH the key and the output value
      """WITH d AS (SELECT lang, source, n_chars, doc_id
        |  FROM documents),
        |g AS (SELECT lang AS _id,
        |    (list(doc_id ORDER BY n_chars DESC, doc_id DESC)) AS ord_d,
        |    (list(source ORDER BY doc_id ASC)) AS ord_s
        |  FROM d GROUP BY 1)
        |SELECT _id,
        |  array_to_string(ord_d[1:3], ',') AS big3,
        |  array_to_string(
        |    ord_d[greatest(len(ord_d) - 2, 1):len(ord_d)], ',')
        |    AS small3,
        |  array_to_string(ord_s[1:2], ',') AS first2,
        |  array_to_string(
        |    ord_s[greatest(len(ord_s) - 1, 1):len(ord_s)], ',')
        |    AS last2
        |FROM g ORDER BY _id""".stripMargin,
    // the aggregate-expression form answers the SAME query — shared text,
    "mql_elem_match" ->
      """SELECT doc_id FROM documents
        |WHERE (lang IN ('en','src2') AND n_chars % 10 >= 5)
        |   OR (source IN ('en','src2') AND n_chars % 7 >= 5)
        |ORDER BY doc_id""".stripMargin,
    "mql_replace_root" ->
      """SELECT CAST(doc_id AS BIGINT) AS did, lang,
        |  CASE WHEN n_chars >= 800 THEN 'long' ELSE 'short' END
        |    AS size_bucket,
        |  'none' AS fallback
        |FROM documents
        |WHERE lang IN ('en', 'de')
        |ORDER BY did""".stripMargin,
    "mql_pipeline_compute" ->
      """SELECT CAST(doc_id AS BIGINT) AS did,
        |  upper(lang) || ':' || source AS label,
        |  n_chars / 100.0 AS kc,
        |  (n_chars / 100.0) * 2 - 1.5 AS score
        |FROM documents
        |WHERE n_chars / 100.0 > 9
        |ORDER BY did""".stripMargin,
    "mql_docs_array" ->
      """SELECT doc_id FROM documents
        |WHERE list_contains([lang, source], 'en')
        |  AND len([lang, source]) = 2
        |  AND len(list_filter([lang, source],
        |        t -> regexp_matches(t, '^src'))) > 0
        |ORDER BY doc_id""".stripMargin,
    "mql_unwind" ->
      """SELECT tag AS _id, count(*) AS n
        |FROM (SELECT unnest([lang, source]) AS tag
        |      FROM documents WHERE n_chars >= 120)
        |GROUP BY 1 ORDER BY _id""".stripMargin,
    "mql_project_exclude" ->
      """SELECT doc_id AS did,
        |  '{"lang":"' || lang || '","info":{"n_chars":' || n_chars || '}}'
        |    AS doc,
        |  'gone' AS src_after
        |FROM documents WHERE lang IN ('en', 'de')
        |ORDER BY did""".stripMargin,
    "mql_replace_root_doc" ->
      """SELECT doc_id, upper(lang) || '/' || source AS label,
        |  n_chars / 1000.0 AS kchars
        |FROM documents WHERE n_chars / 1000.0 >= 0.5
        |ORDER BY doc_id""".stripMargin,
    "mql_pipeline_accum" ->
      """SELECT lang AS _id,
        |  count(*) AS n,
        |  arg_min(source, doc_id) AS first_src,
        |  arg_max(source, doc_id) AS last_src,
        |  array_to_string(list_sort(list(DISTINCT source)), ',') AS srcs,
        |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS docs
        |FROM documents WHERE n_chars >= 120
        |GROUP BY lang ORDER BY _id""".stripMargin,
    "mql_union_with" ->
      """WITH u AS (
        |  SELECT lang FROM documents WHERE lang = 'en'
        |  UNION ALL
        |  SELECT lang FROM documents WHERE n_chars >= 300)
        |SELECT lang AS _id, count(*) AS n
        |FROM u GROUP BY 1 ORDER BY _id""".stripMargin,
    "mql_sort_by_count" ->
      """SELECT lang AS _id, count(*) AS count
        |FROM documents WHERE n_chars >= 100
        |GROUP BY lang ORDER BY count DESC, _id""".stripMargin,
    "mql_bucket" ->
      """SELECT CAST(CASE
        |    WHEN n_chars >= 100 AND n_chars < 200 THEN 100
        |    WHEN n_chars >= 200 AND n_chars < 300 THEN 200
        |    WHEN n_chars >= 300 AND n_chars < 400 THEN 300
        |    WHEN n_chars >= 400 AND n_chars < 500 THEN 400
        |    ELSE -1 END AS BIGINT) AS _id,
        |  count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  max(n_chars) AS max_chars
        |FROM documents
        |GROUP BY 1 ORDER BY _id""".stripMargin,
    "mql_array_sets" ->
      """WITH v AS (SELECT doc_id,
        |    [CAST(n_chars % 7 AS DOUBLE), CAST(n_chars % 11 AS DOUBLE),
        |     CAST(doc_id % 5 AS DOUBLE)] AS v1,
        |    [CAST(n_chars % 7 AS DOUBLE), CAST(doc_id % 3 AS DOUBLE),
        |     CAST(2 AS DOUBLE)] AS v2
        |  FROM documents)
        |SELECT doc_id,
        |  COALESCE(array_to_string([CAST(x AS BIGINT)::VARCHAR
        |    for x in list_sort(list_distinct(list_concat(v1, v2)))], ' '),
        |    '') AS u,
        |  COALESCE(array_to_string([CAST(x AS BIGINT)::VARCHAR
        |    for x in list_sort(list_distinct(
        |      list_filter(v1, x -> list_contains(v2, x))))], ' '), '')
        |    AS i,
        |  COALESCE(array_to_string([CAST(x AS BIGINT)::VARCHAR
        |    for x in list_sort(list_distinct(
        |      list_filter(v1, x -> NOT list_contains(v2, x))))], ' '),
        |    '') AS d,
        |  COALESCE(array_to_string([CAST(x AS BIGINT)::VARCHAR
        |    for x in list_reverse_sort(v1)], ' '), '') AS rev,
        |  CAST(COALESCE(list_position(v1, 3.0) - 1, -1) AS BIGINT)
        |    AS pos3,
        |  CAST((v1[1] + v1[2] + v1[3]) * 10 AS BIGINT) AS score
        |FROM v ORDER BY doc_id""".stripMargin,
    "mql_sample" ->
      """WITH h AS (SELECT doc_id, lang, n_chars,
        |    ('0x' || substr(md5(doc_id || '|' || lang || '|' ||
        |      n_chars || '|' || '{"doc_id":' || doc_id || '}'),
        |      1, 15))::BIGINT AS sh
        |  FROM documents),
        |sm AS (SELECT doc_id, lang, n_chars FROM h
        |  ORDER BY sh LIMIT 50)
        |SELECT doc_id, lang, n_chars FROM sm
        |ORDER BY doc_id""".stripMargin,
    "mql_out" ->
      """SELECT lang AS _id, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang IN ('en', 'fr')
        |GROUP BY 1 ORDER BY _id""".stripMargin,
    "mql_pipeline" ->
      """SELECT lang AS _id, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  max(n_chars) AS max_chars
        |FROM documents WHERE n_chars >= 120
        |GROUP BY lang HAVING count(*) >= 5
        |ORDER BY _id""".stripMargin,
    "mql_bucket_auto" ->
      """WITH v AS (SELECT CAST(n_chars AS DOUBLE) AS v, n_chars
        |           FROM documents),
        |n AS (SELECT count(*) AS c FROM v),
        |ranked AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS rk
        |           FROM v),
        |bounds AS (
        |  SELECT v AS bv FROM ranked, n
        |  WHERE rk IN (1*c//4, 2*c//4, 3*c//4) AND rk > 0),
        |assigned AS (
        |  SELECT v.v, v.n_chars,
        |    (SELECT count(*) FROM bounds WHERE bv <= v.v) AS bucket
        |  FROM v)
        |SELECT min(v) AS lo, max(v) AS hi, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM assigned GROUP BY bucket
        |ORDER BY lo""".stripMargin,
    "mql_facet" ->
      """WITH f AS (SELECT lang, n_chars FROM documents
        |           WHERE n_chars >= 100),
        |by_lang AS (SELECT lang, count(*) AS n FROM f GROUP BY lang),
        |big AS (SELECT count(*) AS n FROM f WHERE n_chars >= 400)
        |SELECT b.lang, b.n, big.n AS big_n FROM by_lang b, big
        |ORDER BY lang""".stripMargin,
    "mql_graph_lookup" ->
      """WITH RECURSIVE t0 AS (
        |  SELECT doc_id, CAST(floor(doc_id / 2) AS BIGINT) AS parent_id
        |  FROM documents),
        |anc AS (
        |  SELECT c.doc_id AS src, p.doc_id AS anc_id,
        |    p.parent_id AS anc_parent, 0 AS depth
        |  FROM t0 c JOIN t0 p ON p.doc_id = c.parent_id
        |  UNION
        |  SELECT a.src, p2.doc_id, p2.parent_id, a.depth + 1
        |  FROM anc a JOIN t0 p2 ON p2.doc_id = a.anc_parent
        |  WHERE a.depth < 2)
        |SELECT src AS doc_id, anc_id,
        |  CAST(min(depth) AS BIGINT) AS depth
        |FROM anc GROUP BY src, anc_id
        |ORDER BY doc_id, depth, anc_id""".stripMargin,
    "mql_densify" ->
      """WITH t0 AS (SELECT doc_id, lang,
        |  CAST(floor(n_chars / 10) * 10 AS BIGINT) AS bucket
        |  FROM documents),
        |b AS (SELECT lang, min(bucket) AS lo, max(bucket) AS hi
        |      FROM t0 GROUP BY lang),
        |g AS (SELECT lang,
        |        unnest(generate_series(lo, hi, 10)) AS bucket FROM b),
        |miss AS (SELECT g.lang, g.bucket FROM g
        |  WHERE NOT EXISTS (SELECT 1 FROM t0
        |    WHERE t0.lang = g.lang AND t0.bucket = g.bucket))
        |SELECT doc_id, lang, bucket FROM t0
        |UNION ALL
        |SELECT NULL AS doc_id, lang, bucket FROM miss
        |ORDER BY lang, bucket, doc_id""".stripMargin,
    "mql_fill" ->
      """WITH f AS (SELECT doc_id, lang,
        |  CAST(CASE WHEN n_chars % 7 = 0 THEN NULL ELSE n_chars END
        |    AS DOUBLE) AS chars,
        |  CASE WHEN source = 'src1' THEN NULL ELSE source END AS src
        |FROM documents)
        |SELECT doc_id, lang,
        |  last_value(chars IGNORE NULLS) OVER (PARTITION BY lang
        |    ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chars,
        |  coalesce(src, 'unknown') AS src
        |FROM f ORDER BY lang, doc_id""".stripMargin,
    "mql_fill_linear" ->
      """WITH f AS (SELECT doc_id, lang,
        |  CASE WHEN n_chars % 7 = 0 THEN NULL
        |       ELSE CAST(n_chars AS BIGINT) END AS chars
        |FROM documents),
        |b AS (SELECT doc_id, lang, chars,
        |  last_value(CASE WHEN chars IS NOT NULL THEN
        |      struct_pack(x := doc_id, y := chars) END IGNORE NULLS)
        |    OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  first_value(CASE WHEN chars IS NOT NULL THEN
        |      struct_pack(x := doc_id, y := chars) END IGNORE NULLS)
        |    OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        |  FROM f)
        |SELECT doc_id, lang,
        |  CASE WHEN chars IS NOT NULL THEN chars
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         CASE WHEN nv.x = pv.x THEN pv.y
        |              ELSE (pv.y * (nv.x - doc_id) +
        |                    nv.y * (doc_id - pv.x)) // (nv.x - pv.x)
        |         END
        |       ELSE NULL END AS chars
        |FROM b ORDER BY lang, doc_id""".stripMargin,
    "mql_window_pct" ->
      """SELECT lang,
        |  quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med,
        |  quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS p25,
        |  quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS p75
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "mql_window_calculus" ->
      """WITH ev AS (SELECT user_id, event_id,
        |  CAST(floor(value) AS DOUBLE) AS yv,
        |  epoch_ns(ts) // 1000 // 1000000 AS sec FROM events),
        |w AS (SELECT user_id, event_id, sec, yv,
        |  first_value(yv) OVER fr AS fv,
        |  last_value(yv) OVER fr AS lv,
        |  first_value(sec) OVER fr AS fs,
        |  last_value(sec) OVER fr AS ls,
        |  lag(yv) OVER wo AS pv,
        |  lag(sec) OVER wo AS ps
        |  FROM ev
        |  WINDOW fr AS (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW),
        |  wo AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |t AS (SELECT user_id, event_id, sec,
        |  CASE WHEN ls - fs <> 0 THEN (lv - fv) / (ls - fs) END AS vel,
        |  CASE WHEN ps IS NULL THEN 0.0
        |       ELSE (yv + pv) / 2 * (sec - ps) END AS trap
        |  FROM w)
        |SELECT user_id, event_id, vel,
        |  sum(trap) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS area
        |FROM t ORDER BY user_id, sec, event_id""".stripMargin,
    "mql_window_unit" ->
      """SELECT event_id, count(*) OVER (PARTITION BY user_id
        |  ORDER BY epoch_ns(ts) // 1000
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |  AS recent_n
        |FROM events ORDER BY event_id""".stripMargin,
    "mql_window_range" ->
      """SELECT doc_id, lang,
        |  count(*) OVER w AS near_n,
        |  CAST(sum(n_chars) OVER w AS BIGINT) AS near_chars
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars
        |  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        |ORDER BY doc_id""".stripMargin,
    // r18: scalar output columns only (the driver's comparator lexsorts
    // every column and cannot hash arrays — the one red r17 row); the
    // $top/$bottom key is ordered-list-first on the REAL composite
    // (n_chars, doc_id) — the r17 BIGINT packing aliased once
    // doc_id >= 100000 (a larger verify SF).
    "mql_group_nacc" ->
      """SELECT lang AS _id,
        |  array_to_string((list(n_chars::BIGINT ORDER BY n_chars))[1:3],
        |    ' ') AS mn,
        |  array_to_string(
        |    (list(n_chars::BIGINT ORDER BY n_chars DESC))[1:3], ' ') AS mx,
        |  (list(doc_id::BIGINT ORDER BY n_chars, doc_id))[1] AS tp,
        |  (list(doc_id::BIGINT ORDER BY n_chars DESC, doc_id DESC))[1]
        |    AS bt,
        |  quantile_cont(n_chars::DOUBLE, 0.5) AS med,
        |  quantile_cont(n_chars::DOUBLE, 0.25) AS p25,
        |  quantile_cont(n_chars::DOUBLE, 0.75) AS p75
        |FROM documents GROUP BY lang ORDER BY _id""".stripMargin,
    "mql_exp_moving_avg" -> {
      // the identical integer recurrence as a recursive CTE; the
      // floor-division spelling handles negative numerators exactly
      // like Math.floorDiv (DuckDB // truncates toward zero, so the
      // non-negative-mod rebase runs first)
      val num = "(2 * o.v * 1000000 + 19 * e.s)"
      s"""WITH RECURSIVE b AS (SELECT event_id,
         |    user_id % 128 AS uid, event_id % 997 - 200 AS v
         |  FROM events),
         |o AS (SELECT event_id, uid, v,
         |    row_number() OVER (PARTITION BY uid ORDER BY event_id)
         |      AS i FROM b),
         |ema AS (
         |  SELECT uid, i, event_id, v * 1000000::BIGINT AS s
         |  FROM o WHERE i = 1
         |  UNION ALL
         |  SELECT o.uid, o.i, o.event_id,
         |    ($num - ((($num % 21) + 21) % 21)) // 21
         |  FROM ema e JOIN o ON o.uid = e.uid AND o.i = e.i + 1)
         |SELECT event_id, CAST(uid AS BIGINT) AS uid,
         |  CAST(s AS BIGINT) AS ema
         |FROM ema ORDER BY event_id LIMIT 400""".stripMargin
    },
    "mql_exp_moving_avg_alpha" -> {
      // the alpha-ppm recurrence (A = 250000): s = floor((A*x*1e6 +
      // (1e6-A)*s) / 1e6), the same non-negative-mod floor-division
      // spelling as the N-form oracle
      val num = "(250000 * o.v * 1000000 + 750000 * e.s)"
      s"""WITH RECURSIVE b AS (SELECT event_id,
         |    user_id % 128 AS uid, event_id % 997 - 200 AS v
         |  FROM events),
         |o AS (SELECT event_id, uid, v,
         |    row_number() OVER (PARTITION BY uid ORDER BY event_id)
         |      AS i FROM b),
         |ema AS (
         |  SELECT uid, i, event_id, v * 1000000::BIGINT AS s
         |  FROM o WHERE i = 1
         |  UNION ALL
         |  SELECT o.uid, o.i, o.event_id,
         |    ($num - ((($num % 1000000) + 1000000) % 1000000)) // 1000000
         |  FROM ema e JOIN o ON o.uid = e.uid AND o.i = e.i + 1)
         |SELECT event_id, CAST(uid AS BIGINT) AS uid,
         |  CAST(s AS BIGINT) AS ema
         |FROM ema ORDER BY event_id LIMIT 400""".stripMargin
    },
    // r18 window N-accumulators: the same sorted-collect semantics
    // replayed with DuckDB's windowed list() — list_sort slices for
    // minN/maxN, the frame-order tail slice for lastN, struct-DESC
    // sort for the composite-key topN; everything space-joined to
    // scalar columns
    "mql_window_nacc" ->
      """SELECT doc_id,
        |  array_to_string(
        |    list_sort(list(n_chars::BIGINT) OVER w)[1:2], ' ') AS mn,
        |  array_to_string(
        |    list_sort(list(n_chars::BIGINT) OVER w, 'DESC')[1:2],
        |    ' ') AS mx,
        |  array_to_string((list(n_chars::BIGINT) OVER w)[-2:], ' ')
        |    AS ln,
        |  array_to_string(list_transform(
        |    list_sort(list(row(n_chars::BIGINT, doc_id::BIGINT))
        |      OVER wu, 'DESC')[1:2], r -> r[2]), ' ') AS tp
        |FROM documents
        |WINDOW w AS (PARTITION BY doc_id // 50 ORDER BY doc_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        |  wu AS (PARTITION BY doc_id // 50 ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY doc_id""".stripMargin,
    // r18 window-operator completion: endpoints/push/addToSet replay
    // as windowed first_value/last_value/list()/sorted distinct list;
    // stddev replays the engine's moment form VERBATIM (the cov
    // gate's bit-determinism device)
    "mql_window_ops2" ->
      """WITH b AS (SELECT doc_id, doc_id // 50 AS grp,
        |    n_chars::BIGINT AS v FROM documents),
        |w AS (SELECT doc_id,
        |  first_value(v) OVER ws AS fs,
        |  last_value(v) OVER ws AS ls,
        |  array_to_string(list(v) OVER ws, ' ') AS ps,
        |  array_to_string(list_sort(list_distinct(list(v) OVER ws)),
        |    ' ') AS st,
        |  count(*) OVER wp AS n,
        |  CAST(sum(v) OVER wp AS BIGINT) AS sa,
        |  CAST(sum(v * v) OVER wp AS BIGINT) AS saa,
        |  count(*) OVER wr AS rn,
        |  CAST(sum(v) OVER wr AS BIGINT) AS rsa,
        |  CAST(sum(v * v) OVER wr AS BIGINT) AS rsaa
        |  FROM b
        |  WINDOW ws AS (PARTITION BY grp ORDER BY doc_id
        |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        |    wp AS (PARTITION BY grp),
        |    wr AS (PARTITION BY grp ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT doc_id, fs, ls, ps, st,
        |  CASE WHEN n >= 1 THEN round(sqrt(greatest(
        |    (saa::DOUBLE - sa::DOUBLE * sa::DOUBLE / n::DOUBLE)
        |      / n::DOUBLE, 0)), 6) END AS sd,
        |  CASE WHEN rn >= 2 THEN round(sqrt(greatest(
        |    (rsaa::DOUBLE - rsa::DOUBLE * rsa::DOUBLE / rn::DOUBLE)
        |      / (rn - 1)::DOUBLE, 0)), 6) END AS ss
        |FROM w ORDER BY doc_id""".stripMargin,
    "mql_window_cov" -> {
      // the engine's moment form replayed VERBATIM: exact integer
      // window sums, then the identical double expression — the same
      // operation order makes the result bit-deterministic, so no
      // rounding is needed (and round(6) stays only as the gate's
      // output convention)
      def mom(frame: String, samp: Boolean) = {
        val d = if (samp) "(n - 1)::DOUBLE" else "n::DOUBLE"
        val minN = if (samp) 2 else 1
        s"""CASE WHEN n >= $minN THEN round(
           |  (sab::DOUBLE - sa::DOUBLE * sb::DOUBLE / n::DOUBLE)
           |    / $d, 6) END"""
          .stripMargin.replace("\n", " ")
      }
      s"""WITH b AS (SELECT doc_id, lang, n_chars::BIGINT AS x1,
         |    (doc_id % 97)::BIGINT AS x2 FROM documents),
         |w AS (SELECT doc_id,
         |  count(*) OVER p AS n,
         |  CAST(sum(x1) OVER p AS BIGINT) AS sa,
         |  CAST(sum(x2) OVER p AS BIGINT) AS sb,
         |  CAST(sum(x1 * x2) OVER p AS BIGINT) AS sab,
         |  count(*) OVER r AS rn,
         |  CAST(sum(x1) OVER r AS BIGINT) AS rsa,
         |  CAST(sum(x2) OVER r AS BIGINT) AS rsb,
         |  CAST(sum(x1 * x2) OVER r AS BIGINT) AS rsab
         |  FROM b
         |  WINDOW p AS (PARTITION BY lang),
         |    r AS (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT doc_id,
         |  ${mom("p", samp = false)} AS cp,
         |  CASE WHEN n >= 2 THEN round(
         |    (sab::DOUBLE - sa::DOUBLE * sb::DOUBLE / n::DOUBLE)
         |      / (n - 1)::DOUBLE, 6) END AS cs,
         |  CASE WHEN rn >= 1 THEN round(
         |    (rsab::DOUBLE - rsa::DOUBLE * rsb::DOUBLE / rn::DOUBLE)
         |      / rn::DOUBLE, 6) END AS run_cp
         |FROM w ORDER BY doc_id""".stripMargin
    },
    "mql_window_fields" ->
"""SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS seq,
        |  CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS running_chars,
        |  lag(doc_id, 1, -1) OVER (PARTITION BY lang ORDER BY doc_id)
        |    AS prev_id,
        |  CAST(sum(n_chars) OVER (PARTITION BY lang) AS BIGINT)
        |    AS lang_chars,
        |  rank() OVER (PARTITION BY lang ORDER BY n_chars DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY lang ORDER BY n_chars DESC)
        |    AS drnk
        |FROM documents WHERE n_chars >= 120
        |ORDER BY lang, doc_id""".stripMargin,
    "mql_docs_regex_ci" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(source, '(?i)^SRC1$')
        |  AND NOT regexp_matches(lang, '(?i)^E')
        |ORDER BY doc_id""".stripMargin,
    "mql_lookup_let" ->
      """WITH f AS (SELECT DISTINCT lang, source FROM documents
        |  WHERE lang IN ('en', 'fr', 'de')),
        |f2 AS (SELECT * FROM f WHERE source >= 'src12')
        |SELECT d.lang AS _id, CAST(count(*) AS BIGINT) AS n
        |FROM documents d JOIN f2 ON f2.lang = d.lang
        |GROUP BY 1 ORDER BY _id""".stripMargin,
    "mql_lookup" ->
      """SELECT d.lang AS _id, count(*) AS n
        |FROM documents d
        |JOIN (SELECT DISTINCT lang, source FROM documents
        |      WHERE lang IN ('en', 'fr', 'de')) f
        |  ON d.lang = f.lang
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "mql_stddev" ->
      """SELECT lang AS _id, round(stddev_pop(n_chars), 6) AS sd_pop,
        |  round(stddev_samp(n_chars), 6) AS sd_samp, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "mql_array_expr" ->
      """SELECT doc_id,
        |  CASE WHEN n_chars > 500 THEN 3 ELSE 2 END::BIGINT AS ntags,
        |  lang AS first,
        |  CASE WHEN n_chars > 500 THEN 'long' ELSE source END AS last
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mql_array_lambda" ->
      """WITH v AS (SELECT doc_id,
        |  n_chars % 7 AS v1, n_chars % 11 AS v2,
        |  n_chars % 13 AS v3, doc_id % 5 AS v4
        |FROM documents)
        |SELECT doc_id,
        |  CAST((CASE WHEN v1 >= 5 THEN 1 ELSE 0 END) +
        |       (CASE WHEN v2 >= 5 THEN 1 ELSE 0 END) +
        |       (CASE WHEN v3 >= 5 THEN 1 ELSE 0 END) +
        |       (CASE WHEN v4 >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS big,
        |  CAST(v1 + v2 + v3 + v4 AS BIGINT) AS total,
        |  CAST(2 * (v1 + v2 + v3 + v4) AS BIGINT) AS scaled
        |FROM v ORDER BY doc_id""".stripMargin,
    "mql_string_expr" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |  upper(lang) AS up,
        |  substring(source, 1, 3) AS pre,
        |  CAST(strpos(source, '1') - 1 AS BIGINT) AS pos1,
        |  lang AS clean,
        |  CAST(CASE WHEN regexp_matches(source, '^src[0-9]$')
        |    THEN 1 ELSE 0 END AS BIGINT) AS isnum,
        |  replace(source, 'src', 'S') AS repl
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mql_merge" ->
      """WITH t AS (SELECT doc_id, lang, n_chars FROM documents
        |           WHERE doc_id < 300),
        |s AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars
        |      FROM documents WHERE doc_id >= 200 AND doc_id < 400)
        |SELECT doc_id, lang, n_chars FROM s
        |UNION ALL
        |SELECT doc_id, lang, n_chars FROM t
        |WHERE doc_id NOT IN (SELECT doc_id FROM s)
        |ORDER BY doc_id""".stripMargin,
    "mql_geo_within" -> geoWithinSql,
    "mql_redact" ->
      """SELECT doc_id FROM documents
        |WHERE n_chars >= 300 AND n_chars < 800
        |ORDER BY doc_id""".stripMargin,
    "mql_redact_descend" ->
      """SELECT doc_id AS did,
        |  CAST(CASE WHEN doc_id % 7 >= 3 THEN n_chars ELSE -1 END
        |    AS BIGINT) AS sec_v,
        |  CAST(CASE WHEN doc_id % 7 >= 3 AND doc_id % 4 = 3
        |    THEN doc_id * 2 ELSE -1 END AS BIGINT) AS inner_w,
        |  CAST(CASE WHEN doc_id % 7 >= 3 AND doc_id % 4 = 3
        |    AND doc_id % 6 >= 3
        |    THEN doc_id + 7 ELSE -1 END AS BIGINT) AS deep_z,
        |  CAST(-1 AS BIGINT) AS aux_v,
        |  CAST(CASE WHEN doc_id % 2 = 1 THEN 2 ELSE 1 END
        |    AS BIGINT) AS na
        |FROM documents WHERE doc_id % 5 >= 3
        |ORDER BY did""".stripMargin,
    "mql_rank_fusion" ->
      """WITH d AS (SELECT doc_id AS _id, lang, n_chars AS nc
        |    FROM documents),
        |la AS (SELECT _id, CAST(row_number()
        |      OVER (ORDER BY nc DESC, _id ASC) AS BIGINT) AS long_rank
        |  FROM (SELECT _id, nc FROM d WHERE lang = 'en'
        |        ORDER BY nc DESC, _id ASC LIMIT 20)),
        |sb AS (SELECT _id, CAST(row_number()
        |      OVER (ORDER BY nc ASC, _id ASC) AS BIGINT) AS short_rank
        |  FROM (SELECT _id, nc FROM d WHERE lang IN ('en', 'fr')
        |        ORDER BY nc ASC, _id ASC LIMIT 25))
        |SELECT COALESCE(la._id, sb._id) AS _id,
        |  CAST(COALESCE(2 * (1000000000000 // (60 + long_rank)), 0)
        |    + COALESCE(1000000000000 // (60 + short_rank), 0)
        |    AS BIGINT) AS score,
        |  long_rank, short_rank
        |FROM la FULL OUTER JOIN sb ON la._id = sb._id
        |ORDER BY score DESC, _id ASC LIMIT 15""".stripMargin,
    "mql_score_fusion" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS _id, lang,
        |    CAST(n_chars AS BIGINT) AS nc FROM documents),
        |la0 AS (SELECT _id, nc AS s FROM d WHERE lang = 'en'
        |        ORDER BY s DESC, _id ASC LIMIT 20),
        |la AS (SELECT _id, CAST(CASE
        |    WHEN max(s) OVER () = min(s) OVER () THEN 1000000
        |    ELSE ((s - min(s) OVER ()) * 1000000)
        |      // (max(s) OVER () - min(s) OVER ()) END
        |  AS BIGINT) AS long_norm FROM la0),
        |sb0 AS (SELECT _id, 100000 - nc AS s FROM d
        |        WHERE lang IN ('en', 'fr')
        |        ORDER BY s DESC, _id ASC LIMIT 25),
        |sb AS (SELECT _id, CAST(CASE
        |    WHEN max(s) OVER () = min(s) OVER () THEN 1000000
        |    ELSE ((s - min(s) OVER ()) * 1000000)
        |      // (max(s) OVER () - min(s) OVER ()) END
        |  AS BIGINT) AS short_norm FROM sb0)
        |SELECT COALESCE(la._id, sb._id) AS _id,
        |  CAST((COALESCE(2 * long_norm, 0) + COALESCE(short_norm, 0))
        |    // 3 AS BIGINT) AS score,
        |  long_norm, short_norm
        |FROM la FULL OUTER JOIN sb ON la._id = sb._id
        |ORDER BY score DESC, _id ASC LIMIT 15""".stripMargin,
    // the oracle reads the IDENTICAL baked sigmoid table the engine
    // embeds (sigmoidTableSql) — one literal source, no float math
    "mql_scorefusion_sigmoid" -> {
      val tb = graft.filter.MqlPipeline.sigmoidTableSql
      s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS _id, lang,
         |    CAST(n_chars % 21 - 10 AS BIGINT) AS sp,
         |    CAST(n_chars % 15 - 7 AS BIGINT) AS sq FROM documents),
         |ha0 AS (SELECT _id, sp AS s FROM d WHERE lang = 'en'
         |        ORDER BY s DESC, _id ASC LIMIT 30),
         |ha AS (SELECT _id, ($tb)[
         |    CAST(GREATEST(-20, LEAST(20, s)) + 21 AS INT)]::BIGINT
         |  AS hot_norm FROM ha0),
         |ca0 AS (SELECT _id, sq AS s FROM d
         |        WHERE lang IN ('en', 'de')
         |        ORDER BY s DESC, _id ASC LIMIT 40),
         |ca AS (SELECT _id, ($tb)[
         |    CAST(GREATEST(-20, LEAST(20, s)) + 21 AS INT)]::BIGINT
         |  AS cold_norm FROM ca0)
         |SELECT COALESCE(ha._id, ca._id) AS _id,
         |  CAST((COALESCE(3 * hot_norm, 0) + COALESCE(2 * cold_norm, 0))
         |    // 5 AS BIGINT) AS score,
         |  hot_norm, cold_norm
         |FROM ha FULL OUTER JOIN ca ON ha._id = ca._id
         |ORDER BY score DESC, _id ASC LIMIT 25""".stripMargin
    },
    "mql_date_add" ->
      """SELECT event_id,
        |  strftime(date_trunc('second', ts) + INTERVAL 3 DAY,
        |    '%Y-%m-%d %H:%M:%S') AS due,
        |  strftime(date_trunc('second', ts) + INTERVAL 3 DAY
        |    - INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS warn
        |FROM events ORDER BY event_id LIMIT 200""".stripMargin,
    "mql_date_add_cal" ->
      """WITH b AS (SELECT event_id,
        |  TIMESTAMP '2023-01-01 00:00:00'
        |    + to_seconds(CAST((event_id % 730) * 86400
        |        + event_id % 86399 AS BIGINT)) AS base
        |  FROM events)
        |SELECT event_id,
        |  strftime(base + to_months(1), '%Y-%m-%d %H:%M:%S') AS plus_m,
        |  strftime(base - to_months(3), '%Y-%m-%d %H:%M:%S') AS minus_q,
        |  strftime(base + to_months(12), '%Y-%m-%d %H:%M:%S') AS plus_y
        |FROM b ORDER BY event_id LIMIT 250""".stripMargin,
    "mql_date_add_tz" ->
      """WITH b AS (SELECT event_id,
        |  TIMESTAMP '2023-01-01 00:00:00'
        |    + to_seconds(CAST((event_id % 730) * 86400
        |        + event_id % 86399 AS BIGINT)) AS base
        |  FROM events)
        |SELECT event_id,
        |  strftime(base + to_seconds(19800) + to_months(1)
        |    - to_seconds(19800), '%Y-%m-%d %H:%M:%S') AS m_tz,
        |  strftime(base - to_seconds(28800) - to_months(3)
        |    + to_seconds(28800), '%Y-%m-%d %H:%M:%S') AS q_tz,
        |  strftime(date_trunc('day', base + to_seconds(19800))
        |    - to_seconds(19800), '%Y-%m-%d %H:%M:%S') AS tr_tz,
        |  strftime(base - to_seconds(28800), '%Y-%m-%d %H:%M') AS lbl_tz,
        |  CAST(date_part('day', base + to_seconds(19800)) AS BIGINT)
        |    AS dom_tz,
        |  CAST(date_diff('day',
        |    CAST(TIMESTAMP '2023-01-01 00:00:00'
        |      - to_seconds(28800) AS DATE),
        |    CAST(base - to_seconds(28800) AS DATE)) AS BIGINT)
        |    AS diff_d_tz,
        |  strftime(base - to_seconds(19800), '%Y-%m-%d %H:%M:%S')
        |    AS from_tz
        |FROM b ORDER BY event_id LIMIT 250""".stripMargin,
    "mql_date_tz_named" -> nyReplaySql,
    "mql_date_diff_tz" -> ddTzReplaySql,
    "mql_vector_search" -> {
      def dot(a: String, b: String) =
        s"list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE " +
          "for i in generate_series(1,64)])"
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings
         |  WHERE vec_id = 77),
         |c AS (SELECT vec_id AS vid, embedding AS ev FROM embeddings
         |  WHERE vec_id <> 77),
         |s AS (SELECT vid,
         |    (1000000 + CAST(coalesce(round(
         |      ${dot("ev", "qv")} /
         |        nullif(sqrt(${dot("ev", "ev")})
         |          * sqrt(${dot("qv", "qv")}), 0)
         |      * 1000000), 0) AS BIGINT)) // 2 AS score
         |  FROM c, q)
         |SELECT vid, score FROM s
         |ORDER BY score DESC, vid ASC LIMIT 12""".stripMargin
    },
    "mql_convert_epoch" ->
      """WITH b AS (SELECT event_id,
        |  (CASE WHEN event_id % 5 = 1 THEN NULL
        |        ELSE 1672531200000 + (event_id % 730) * 86400017
        |          + event_id % 1000 END)::BIGINT AS ms
        |  FROM events),
        |c AS (SELECT event_id, COALESCE(ms, 0) AS m FROM b)
        |SELECT event_id,
        |  strftime(make_timestamp(m * 1000), '%Y-%m-%d %H:%M:%S') AS s,
        |  m % 1000 AS msec
        |FROM c ORDER BY event_id LIMIT 300""".stripMargin,
    "mql_date_from_str" ->
      """WITH w AS (SELECT event_id,
        |  CASE WHEN event_id % 7 = 1 THEN NULL
        |       WHEN event_id % 5 = 0 THEN 'not a date'
        |       ELSE lpad(CAST(event_id % 12 + 1 AS VARCHAR), 2, '0')
        |         || '/' || lpad(CAST(event_id % 27 + 1 AS VARCHAR), 2, '0')
        |         || '/2024 '
        |         || lpad(CAST(event_id % 24 AS VARCHAR), 2, '0')
        |         || ':' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')
        |  END AS raw FROM events),
        |p AS (SELECT event_id, raw,
        |    try_strptime(raw, '%m/%d/%Y %H:%M') AS ts FROM w),
        |r AS (SELECT event_id,
        |  CASE WHEN raw IS NULL THEN TIMESTAMP '1970-01-01 00:00:00'
        |       WHEN ts IS NULL THEN TIMESTAMP '1999-12-31 23:59:59'
        |       ELSE ts END AS d,
        |  CASE WHEN raw IS NULL THEN TIMESTAMP '1970-01-01 00:00:00'
        |       WHEN ts IS NULL THEN TIMESTAMP '1999-12-31 23:59:59'
        |       ELSE ts - to_seconds(19800) END AS dtz
        |  FROM p)
        |SELECT event_id,
        |  strftime(d, '%Y-%m-%d %H:%M:%S') AS parsed,
        |  strftime(dtz, '%Y-%m-%d %H:%M:%S') AS parsed_tz
        |FROM r ORDER BY event_id LIMIT 400""".stripMargin,
    "mql_date_parts_ext" ->
      """WITH b AS (SELECT event_id,
        |  TIMESTAMP '2023-01-01 00:00:00'
        |    + to_seconds(CAST((event_id % 730) * 86400
        |        + event_id % 86399 AS BIGINT)) AS base
        |  FROM events)
        |SELECT event_id,
        |  CAST(dayofweek(base) + 1 AS BIGINT) AS dow,
        |  CAST(dayofyear(base) AS BIGINT) AS doy,
        |  CAST(isodow(base) AS BIGINT) AS idow,
        |  CAST(weekofyear(base) AS BIGINT) AS iwk,
        |  CAST(isoyear(base) AS BIGINT) AS iwy,
        |  CAST((dayofyear(base) - dayofweek(base) + 6) // 7 AS BIGINT)
        |    AS wk,
        |  CAST(dayofweek(base + to_seconds(19800)) + 1 AS BIGINT)
        |    AS dow_ist,
        |  CAST(event_id % 1000 AS BIGINT) AS ms,
        |  CAST((date_diff('day', DATE '1970-01-01', CAST(base AS DATE))
        |      + 4 + 35000000) // 7
        |    - (19358 + 4 + 35000000) // 7 AS BIGINT) AS dd_w,
        |  CAST((date_diff('day', DATE '1970-01-01', CAST(base AS DATE))
        |      + 3 + 35000000) // 7
        |    - (19358 + 3 + 35000000) // 7 AS BIGINT) AS dd_wm,
        |  CAST((date_part('year', base) * 12 + date_part('month', base))
        |    - (2023 * 12 + 1) AS BIGINT) AS dd_m,
        |  CAST((date_part('year', base) * 4 + quarter(base))
        |    - (2023 * 4 + 1) AS BIGINT) AS dd_q,
        |  CAST(date_part('year', base) - 2023 AS BIGINT) AS dd_y
        |FROM b ORDER BY event_id LIMIT 400""".stripMargin,
    "mql_convert" ->
      """WITH w AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 1 THEN NULL
        |         WHEN doc_id % 5 = 0 THEN 'oops'
        |         ELSE CAST(n_chars AS VARCHAR) END AS raw
        |  FROM documents)
        |SELECT doc_id AS did,
        |  CAST(COALESCE(CASE WHEN raw IS NULL THEN 0
        |    ELSE TRY_CAST(raw AS BIGINT) END, -1) AS BIGINT) AS v
        |FROM w ORDER BY did""".stripMargin,
    "mql_convert_double_str" ->
      """SELECT doc_id AS did,
        |  CASE WHEN doc_id % 7 = 1 THEN 'absent'
        |       ELSE CAST(CAST(n_chars AS BIGINT) AS VARCHAR) END AS s,
        |  CASE WHEN doc_id % 7 = 1 THEN '-'
        |       ELSE CAST(CAST(-n_chars AS BIGINT) AS VARCHAR) END
        |    AS neg
        |FROM documents ORDER BY did""".stripMargin,
    "mql_convert_date" ->
      """WITH w AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 1 THEN NULL
        |         WHEN doc_id % 5 = 0 THEN 'not-a-date'
        |         ELSE '2024-'
        |           || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
        |           || '-'
        |           || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
        |           || 'T'
        |           || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
        |           || ':30:00' END AS raw
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CASE WHEN raw IS NULL THEN TIMESTAMP '1970-01-01 00:00:00'
        |         ELSE COALESCE(TRY_CAST(raw AS TIMESTAMP),
        |                       TIMESTAMP '1999-12-31 23:59:59') END AS d
        |  FROM w)
        |SELECT doc_id AS did, strftime(d, '%Y-%m-%d %H:%M:%S') AS lbl
        |FROM c ORDER BY did""".stripMargin,
    "mql_convert_str" ->
      """WITH w AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 1 THEN NULL
        |         WHEN doc_id % 5 = 0 THEN 'oops'
        |         ELSE CAST(n_chars AS VARCHAR) END AS raw,
        |    n_chars FROM documents),
        |v AS (SELECT doc_id, raw, n_chars,
        |    CASE WHEN raw IS NULL THEN NULL
        |         ELSE COALESCE(TRY_CAST(raw AS BIGINT), -1) END AS vl
        |  FROM w)
        |SELECT doc_id AS did,
        |  COALESCE(CAST(vl AS VARCHAR), 'none') AS sl,
        |  CAST(n_chars > 300 AS VARCHAR) AS sb,
        |  COALESCE(raw, 'missing') AS ss
        |FROM v ORDER BY did""".stripMargin,
    "mql_json_schema" ->
      """SELECT doc_id FROM documents
        |WHERE doc_id % 7 <> 0
        |  AND doc_id % 5 <> 0
        |  AND n_chars BETWEEN 100 AND 500
        |ORDER BY doc_id""".stripMargin,
    "mql_collation_numeric" ->
      """WITH w AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'ITEM' ELSE 'item' END ||
        |    CASE WHEN doc_id % 7 = 0
        |         THEN lpad(CAST(doc_id % 120 AS VARCHAR), 4, '0')
        |         ELSE CAST(doc_id % 120 AS VARCHAR) END AS tag,
        |    doc_id % 120 AS n
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE n >= 10 AND n < 100
        |ORDER BY n, doc_id""".stripMargin,
    // expected es ranks: nido(0) < nino(1) < NIÑO 2(2) < niño 10(3)
    // < nominal(4) < nz(5) < ñandu(6) < Ñu(7); $gt "nino 2" drops
    // ranks 0-1, $ne "ñu 3" drops rank 7 (ñ ≡ Ñ case-insensitively)
    "mql_collation_tailored" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 8
        |      WHEN 0 THEN 'nido 2' WHEN 1 THEN 'NIÑO 2'
        |      WHEN 2 THEN 'niño 10' WHEN 3 THEN 'nino 2'
        |      WHEN 4 THEN 'nominal 2' WHEN 5 THEN 'ñandu 5'
        |      WHEN 6 THEN 'nz 5' ELSE 'Ñu 3' END AS tag,
        |    CASE doc_id % 8 WHEN 0 THEN 0 WHEN 3 THEN 1 WHEN 1 THEN 2
        |      WHEN 2 THEN 3 WHEN 4 THEN 4 WHEN 6 THEN 5 WHEN 5 THEN 6
        |      ELSE 7 END AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk > 1 AND rnk <> 7
        |ORDER BY rnk, doc_id""".stripMargin,
    // sv@2+numeric expected ranks: yta(8)=0 üta(9)=1 zebra(0)=2
    // zon 10(1)=3 år(2)=4 ÄRA(3)=5 æra(4)=6 öra(5)=7 øra(6)=8 ôra(7)=9;
    // $gt "zebra 2" drops 0-2, $ne "ØRA 2" drops 8 (case+class fold)
    "mql_collation_sv" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 10
        |      WHEN 0 THEN 'zebra 2' WHEN 1 THEN 'zon 10'
        |      WHEN 2 THEN 'år 2' WHEN 3 THEN 'ÄRA 2'
        |      WHEN 4 THEN 'æra 2' WHEN 5 THEN 'öra 2'
        |      WHEN 6 THEN 'øra 2' WHEN 7 THEN 'ôra 2'
        |      WHEN 8 THEN 'yta 2' ELSE 'üta 2' END AS tag,
        |    CASE doc_id % 10 WHEN 8 THEN 0 WHEN 9 THEN 1 WHEN 0 THEN 2
        |      WHEN 1 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 WHEN 4 THEN 6
        |      WHEN 5 THEN 7 WHEN 6 THEN 8 ELSE 9 END AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk > 2 AND rnk <> 8
        |ORDER BY rnk, doc_id""".stripMargin,
    // da@1 expected ranks: zut(0)=0 æble(2)=1 ära(1)=2 øre(3)=3
    // östers(4)=4 aalborg(5)=5 århus(6)=aarhus(7)=6 (the contraction:
    // primary-EQUAL, did tiebreak); $gte "æble" drops rank 0 and $ne
    // "AARHUS" drops BOTH rank-6 spellings
    "mql_collation_da" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 8
        |      WHEN 0 THEN 'zut' WHEN 1 THEN 'ära'
        |      WHEN 2 THEN 'æble' WHEN 3 THEN 'øre'
        |      WHEN 4 THEN 'östers' WHEN 5 THEN 'aalborg'
        |      WHEN 6 THEN 'århus' ELSE 'aarhus' END AS tag,
        |    CASE doc_id % 8 WHEN 0 THEN 0 WHEN 2 THEN 1 WHEN 1 THEN 2
        |      WHEN 3 THEN 3 WHEN 4 THEN 4 WHEN 5 THEN 5
        |      ELSE 6 END AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk >= 1 AND rnk <= 5
        |ORDER BY rnk, doc_id""".stripMargin,
    // tr@1 expected ranks: cam(6)=0 çay(5)=1 hal(0)=2 ılık(1)=ILIK(2)=3
    // (I ≡ ı) ilik(3)=İLİK(4)=4 (İ ≡ i) sal(8)=5 şal(7)=6; $gt "hal"
    // drops ranks 0-2, $ne "ilik" drops BOTH rank-4 spellings
    "mql_collation_tr" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 9
        |      WHEN 0 THEN 'hal' WHEN 1 THEN 'ılık'
        |      WHEN 2 THEN 'ILIK' WHEN 3 THEN 'ilik'
        |      WHEN 4 THEN 'İLİK' WHEN 5 THEN 'çay'
        |      WHEN 6 THEN 'cam' WHEN 7 THEN 'şal'
        |      ELSE 'sal' END AS tag,
        |    CASE doc_id % 9 WHEN 6 THEN 0 WHEN 5 THEN 1 WHEN 0 THEN 2
        |      WHEN 1 THEN 3 WHEN 2 THEN 3 WHEN 3 THEN 4 WHEN 4 THEN 4
        |      WHEN 8 THEN 5 ELSE 6 END AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk = 3 OR rnk >= 5
        |ORDER BY rnk, doc_id""".stripMargin,
    // es@3+numeric: icu-measured tertiary ranks are the PLANT order
    // (rnk = doc_id % 12); $gt 'cotE 7' keeps rank >= 2, $ne 'Niño 02'
    // drops exactly the planted 'Niño 2' (numeric 02 ≡ 2 through the
    // tertiary level; 'NIÑO 02' differs by case and stays)
    "mql_collation_tertiary" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 12
        |      WHEN 0 THEN 'cote 7' WHEN 1 THEN 'cotE 7'
        |      WHEN 2 THEN 'coté 7' WHEN 3 THEN 'nino 2'
        |      WHEN 4 THEN 'Nino 2' WHEN 5 THEN 'NINO 2'
        |      WHEN 6 THEN 'niño 2' WHEN 7 THEN 'niñO 2'
        |      WHEN 8 THEN 'Niño 2' WHEN 9 THEN 'NIÑO 02'
        |      WHEN 10 THEN 'nz 1' ELSE 'ñandu 3' END AS tag,
        |    doc_id % 12 AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk >= 2 AND rnk <> 8
        |ORDER BY rnk, doc_id""".stripMargin,
    // sv@3: measured ranks = plant order; $gte 'üta' keeps >= 2,
    // $ne 'Öra' drops exactly rank 9 (öra/ÖRA stay — tertiary)
    "mql_collation_ter_sv" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 14
        |      WHEN 0 THEN 'yta' WHEN 1 THEN 'Yta' WHEN 2 THEN 'üta'
        |      WHEN 3 THEN 'år' WHEN 4 THEN 'År' WHEN 5 THEN 'ära'
        |      WHEN 6 THEN 'æra' WHEN 7 THEN 'Æra' WHEN 8 THEN 'öra'
        |      WHEN 9 THEN 'Öra' WHEN 10 THEN 'ÖRA' WHEN 11 THEN 'øra'
        |      WHEN 12 THEN 'Øra' ELSE 'ôra' END AS tag,
        |    doc_id % 14 AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk >= 2 AND rnk <> 9
        |ORDER BY rnk, doc_id""".stripMargin,
    // da@3 measured (UPPER-first, å-class ladder Å < AA < Aa < å < aa,
    // 'aA' does NOT contract so aAlborg sorts first at primary a-a):
    // aAlborg(8)=0 zut(0)=1 Æble(2)=2 æble(1)=3 Øre(4)=4 øre(3)=5
    // AAlborg(7)=6 Aalborg(6)=7 aalborg(5)=8 Århus(10)=9 AARHUS(13)=10
    // Aarhus(12)=11 århus(9)=12 aarhus(11)=13; $ne 'Aarhus' drops 11
    "mql_collation_ter_da" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 14
        |      WHEN 0 THEN 'zut' WHEN 1 THEN 'æble' WHEN 2 THEN 'Æble'
        |      WHEN 3 THEN 'øre' WHEN 4 THEN 'Øre'
        |      WHEN 5 THEN 'aalborg' WHEN 6 THEN 'Aalborg'
        |      WHEN 7 THEN 'AAlborg' WHEN 8 THEN 'aAlborg'
        |      WHEN 9 THEN 'århus' WHEN 10 THEN 'Århus'
        |      WHEN 11 THEN 'aarhus' WHEN 12 THEN 'Aarhus'
        |      ELSE 'AARHUS' END AS tag,
        |    CASE doc_id % 14 WHEN 8 THEN 0 WHEN 0 THEN 1 WHEN 2 THEN 2
        |      WHEN 1 THEN 3 WHEN 4 THEN 4 WHEN 3 THEN 5 WHEN 7 THEN 6
        |      WHEN 6 THEN 7 WHEN 5 THEN 8 WHEN 10 THEN 9
        |      WHEN 13 THEN 10 WHEN 12 THEN 11 WHEN 9 THEN 12
        |      ELSE 13 END AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk <> 11
        |ORDER BY rnk, doc_id""".stripMargin,
    // tr@3: measured ranks = plant order; $gt 'Çay' keeps >= 3,
    // $ne 'İLİK' drops exactly rank 9 (ilik/iLİK stay — the dotless-ı
    // case pairs are significant at tertiary)
    "mql_collation_ter_tr" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 13
        |      WHEN 0 THEN 'cam' WHEN 1 THEN 'çay' WHEN 2 THEN 'Çay'
        |      WHEN 3 THEN 'hal' WHEN 4 THEN 'ılık' WHEN 5 THEN 'Ilık'
        |      WHEN 6 THEN 'ILIK' WHEN 7 THEN 'ilik' WHEN 8 THEN 'iLİK'
        |      WHEN 9 THEN 'İLİK' WHEN 10 THEN 'sal' WHEN 11 THEN 'şal'
        |      ELSE 'Şal' END AS tag,
        |    doc_id % 13 AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk >= 3 AND rnk <> 9
        |ORDER BY rnk, doc_id""".stripMargin,
    // fr@3+numeric: icu-measured tertiary ranks = plant order;
    // $gt 'cotE 2' keeps rank >= 2, $ne 'COTE 2' drops exactly the
    // planted 'COTE 02' (02 ≡ 2 through tertiary, case significant)
    "mql_collation_ter_root" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 12
        |      WHEN 0 THEN 'cote 2' WHEN 1 THEN 'cotE 2'
        |      WHEN 2 THEN 'Cote 2' WHEN 3 THEN 'COTE 02'
        |      WHEN 4 THEN 'coté 2' WHEN 5 THEN 'Coté 2'
        |      WHEN 6 THEN 'côte 2' WHEN 7 THEN 'CÔTÉ 2'
        |      WHEN 8 THEN 'item2 a' WHEN 9 THEN 'ITEM002 a'
        |      WHEN 10 THEN 'naïve 1' ELSE 'Naïve 1' END AS tag,
        |    doc_id % 12 AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk >= 2 AND rnk <> 3
        |ORDER BY rnk, doc_id""".stripMargin,
    "mql_collation_accent" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 9
        |      WHEN 0 THEN 'item2 cote' WHEN 1 THEN 'ITEM002 cote'
        |      WHEN 2 THEN 'item2 coté' WHEN 3 THEN 'item2 côte'
        |      WHEN 4 THEN 'item2 côté' WHEN 5 THEN 'item10 cote'
        |      WHEN 6 THEN 'ITEM10 CÔTÉ' WHEN 7 THEN 'item10 såte'
        |      ELSE 'item10 säte' END AS tag,
        |    CASE doc_id % 9 WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 1
        |      WHEN 3 THEN 2 WHEN 4 THEN 3 WHEN 5 THEN 4 WHEN 6 THEN 5
        |      WHEN 7 THEN 6 ELSE 7 END AS rnk
        |  FROM documents)
        |SELECT doc_id, tag FROM w
        |WHERE rnk > 0 AND rnk <> 5
        |ORDER BY rnk, doc_id""".stripMargin,
    "mql_collation_diacritic" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN 'café'
        |       WHEN doc_id % 5 = 1 THEN 'CAFE'
        |       WHEN doc_id % 5 = 2 THEN 'naïve'
        |       WHEN doc_id % 5 = 3 THEN 'NAÏVE'
        |       ELSE 'résumé' END AS word
        |FROM documents),
        |f AS (SELECT doc_id, word,
        |  translate(lower(word), 'àáâãäåçèéêëìíîïñòóôõöùúûüýÿ',
        |    'aaaaaaceeeeiiiinooooouuuuyy') AS k
        |FROM d)
        |SELECT doc_id, word FROM f
        |WHERE k IN ('cafe', 'naive')
        |ORDER BY k, doc_id""".stripMargin,
    "mql_collation" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN upper(lang) ELSE lang END
        |    AS langx
        |FROM documents)
        |SELECT doc_id, langx FROM d
        |WHERE lower(langx) IN ('en', 'fr')
        |ORDER BY lower(langx), doc_id""".stripMargin,
    "mql_docs_bits" ->
      """SELECT doc_id FROM documents
        |WHERE (n_chars & 5) = 5
        |  AND (n_chars & 48) <> 0
        |  AND (n_chars & 48) <> 48
        |ORDER BY doc_id""".stripMargin,
    "mql_docs_mixed" ->
      """SELECT doc_id FROM documents
        |WHERE lang IN ('en', 'fr')
        |  AND regexp_matches(source, '^src1')
        |  AND n_chars >= 500
        |ORDER BY doc_id""".stripMargin,
    // r18: absent $language defaults to the english analyzer (Mongo's
    // default index language) — both plain-$text oracles now render
    // the analyzed token space from the one Stemmer rule table,
    // exactly like mql_text_stemmed's
    "mql_text_score" -> {
      val toks = graft.functions.Stemmer.analyzeSqlTokens("text")
      val terms = graft.functions.Stemmer.analyzeTerms(
          graft.filter.MqlFilter.textSearchTerms("vector hash table"))
        .map(t => s"'$t'").mkString(", ")
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter($toks,
         |      t -> t IN ($terms))) AS BIGINT)
         |      AS score
         |  FROM documents)
         |SELECT doc_id, score FROM m WHERE score > 0
         |ORDER BY score DESC, doc_id ASC LIMIT 15""".stripMargin
    },
    "mql_text_filter" -> {
      val toks = graft.functions.Stemmer.analyzeSqlTokens("text")
      val terms = graft.functions.Stemmer.analyzeTerms(
          graft.filter.MqlFilter.textSearchTerms("vector hash"))
        .map(t => s"'$t'").mkString(", ")
      s"""SELECT doc_id FROM documents
         |WHERE lang IN ('en', 'fr')
         |  AND len(list_filter($toks, t -> t IN ($terms))) > 0
         |ORDER BY doc_id""".stripMargin
    },
    "mql_text_stemmed" -> {
      // oracle rendered FROM the one Stemmer rule table: analyzed doc
      // tokens overlap the driver-stemmed query terms
      val toks = graft.functions.Stemmer.analyzeSqlTokens("text")
      val terms = graft.functions.Stemmer.analyzeTerms(
          graft.filter.MqlFilter.textSearchTerms(
            "running hashes the tables"))
        .map(t => s"'$t'").mkString(", ")
      s"""SELECT doc_id FROM documents
         |WHERE len(list_filter($toks, t -> t IN ($terms))) > 0
         |ORDER BY doc_id""".stripMargin
    },
    "mql_text_stemmed_es" -> stemmedLangOracle(esPlanted,
      "libros hablando pensar veces",
      graft.functions.Stemmer.Spanish),
    "mql_text_stemmed_fr" -> stemmedLangOracle(frPlanted,
      "maisons parler formation cheval heureux",
      graft.functions.Stemmer.French),
    "mql_text_stemmed_de" -> stemmedLangOracle(dePlanted,
      "zeitung laufen haus freundlich möglichkeit",
      graft.functions.Stemmer.German),
    "mql_text_stemmed_it" -> stemmedLangOracle(itPlanted,
      "libri parlare creazione",
      graft.functions.Stemmer.Italian),
    "mql_text_stemmed_pt" -> stemmedLangOracle(ptPlanted,
      "livros falar coração pensamentos",
      graft.functions.Stemmer.Portuguese),
    "mql_text_stemmed_nl" -> stemmedLangOracle(nlPlanted,
      "boeken vriendelijk mogelijk grote",
      graft.functions.Stemmer.Dutch),
    "mql_expr_filter" ->
      """SELECT doc_id FROM documents
        |WHERE CAST(n_chars AS DOUBLE) >
        |    CAST(doc_id % 7 AS DOUBLE) * 100 + 300
        |  AND lang = 'en'
        |ORDER BY doc_id""".stripMargin,
    "mql_events_range" ->
      """SELECT event_id FROM events
        |WHERE (props->>'k')::DOUBLE >= 20.0 AND (props->>'k')::DOUBLE < 60.0
        |  AND json_extract(props, '$.missing') IS NULL
        |ORDER BY event_id""".stripMargin,
    "mql_events_nor" ->
      """SELECT event_id FROM events
        |WHERE NOT ((props->>'k')::DOUBLE < 30.0 OR (props->>'k')::DOUBLE >= 70.0)
        |  AND NOT ((props->>'k')::DOUBLE = 42.0)
        |ORDER BY event_id""".stripMargin,
    "mql_events_mod" ->
      """SELECT event_id FROM events
        |WHERE (props->>'k')::DOUBLE % 7 = 3
        |ORDER BY event_id""".stripMargin,
    "mql_events_date" ->
      """SELECT event_id FROM events
        |WHERE date_trunc('second', ts) >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND date_trunc('second', ts) < TIMESTAMP '2024-01-20 12:00:00'
        |  AND event_type IN ('click', 'view')
        |ORDER BY event_id""".stripMargin,
    "mql_switch_trunc" ->
      """SELECT strftime(CAST(ts AS DATE)
        |    - to_days(CAST(dayofweek(ts) AS INTEGER)), '%Y-%m-%d')
        |  || '/' ||
        |  CASE WHEN value >= 300 THEN 'high'
        |       WHEN value >= 50 THEN 'mid' ELSE 'low' END AS _id,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "mql_dates_pipeline" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS _id, count(*) AS n,
        |  max(date_diff('day', DATE '2024-01-01', ts::DATE)) AS idx
        |FROM events
        |WHERE day(ts) >= 10 AND day(ts) < 20
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )

  protected def mqlQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mql_documents" -> (mqlDocuments _),
    "mql_events_range" -> (mqlEventsRange _),
    "mql_events_nor" -> (mqlEventsNor _),
    "mql_events_mod" -> (mqlEventsMod _),
    "mql_events_date" -> (mqlEventsDate _),
    "mql_dates_pipeline" -> (mqlDatesPipeline _),
    "mql_switch_trunc" -> (mqlSwitchTrunc _),
    "mql_densify_unit" -> (mqlDensifyUnit _),
    "mql_densify_date" -> (mqlDensifyDate _),
    "mql_densify_bounds" -> (mqlDensifyBounds _),
    "mql_docs_mixed" -> (mqlDocsMixed _),
    "mql_docs_bits" -> (mqlDocsBits _),
    "mql_geo_within" -> (mqlGeoWithin _),
    "mql_rank_fusion" -> (mqlRankFusion _),
    "mql_score_fusion" -> (mqlScoreFusion _),
    "mql_scorefusion_sigmoid" -> (mqlScoreFusionSigmoid _),
    "mql_date_add" -> (mqlDateAdd _),
    "mql_date_add_cal" -> (mqlDateAddCal _),
    "mql_date_add_tz" -> (mqlDateAddTz _),
    "mql_date_tz_named" -> (mqlDateTzNamed _),
    "mql_date_diff_tz" -> (mqlDateDiffTz _),
    "mql_convert_epoch" -> (mqlConvertEpoch _),
    "mql_vector_search" -> (mqlVectorSearch _),
    "mql_date_parts_ext" -> (mqlDatePartsExt _),
    "mql_date_from_str" -> (mqlDateFromStr _),
    "mql_convert" -> (mqlConvert _),
    "mql_convert_str" -> (mqlConvertStr _),
    "mql_convert_date" -> (mqlConvertDate _),
    "mql_convert_double_str" -> (mqlConvertDoubleStr _),
    "mql_redact" -> (mqlRedact _),
    "mql_redact_descend" -> (mqlRedactDescend _),
    "mql_collation" -> (mqlCollation _),
    "mql_collation_diacritic" -> (mqlCollationDiacritic _),
    "mql_collation_numeric" -> (mqlCollationNumeric _),
    "mql_collation_accent" -> (mqlCollationAccent _),
    "mql_collation_tailored" -> (mqlCollationTailored _),
    "mql_collation_sv" -> (mqlCollationSv _),
    "mql_collation_da" -> (mqlCollationDa _),
    "mql_collation_tr" -> (mqlCollationTr _),
    "mql_collation_tertiary" -> (mqlCollationTertiary _),
    "mql_collation_ter_sv" -> (mqlCollationTerSv _),
    "mql_collation_ter_da" -> (mqlCollationTerDa _),
    "mql_collation_ter_tr" -> (mqlCollationTerTr _),
    "mql_collation_ter_root" -> (mqlCollationTerRoot _),
    "mql_json_schema" -> (mqlJsonSchema _),
    "mql_expr_filter" -> (mqlExprFilter _),
    "mql_text_filter" -> (mqlTextFilter _),
    "mql_text_stemmed" -> (mqlTextStemmed _),
    "mql_text_stemmed_es" -> (mqlTextStemmedEs _),
    "mql_text_stemmed_fr" -> (mqlTextStemmedFr _),
    "mql_text_stemmed_de" -> (mqlTextStemmedDe _),
    "mql_text_stemmed_it" -> (mqlTextStemmedIt _),
    "mql_text_stemmed_pt" -> (mqlTextStemmedPt _),
    "mql_text_stemmed_nl" -> (mqlTextStemmedNl _),
    "mql_text_score" -> (mqlTextScore _),
    "mql_docs_regex_ci" -> (mqlDocsRegexCi _),
    "mql_lookup" -> (mqlLookup _),
    "mql_lookup_let" -> (mqlLookupLet _),
    "mql_stddev" -> (mqlStddev _),
    "mql_merge" -> (mqlMerge _),
    "mql_array_expr" -> (mqlArrayExpr _),
    "mql_array_lambda" -> (mqlArrayLambda _),
    "mql_string_expr" -> (mqlStringExpr _),
    "mql_pipeline" -> (mqlPipeline _),
    "mql_out" -> (mqlOut _),
    "mql_sample" -> (mqlSample _),
    "mql_array_sets" -> (mqlArraySets _),
    "mql_window_fields" -> (mqlWindowFields _),
    "mql_window_cov" -> (mqlWindowCov _),
    "mql_window_nacc" -> (mqlWindowNacc _),
    "mql_window_ops2" -> (mqlWindowOps2 _),
    "mql_exp_moving_avg" -> (mqlExpMovingAvg _),
    "mql_exp_moving_avg_alpha" -> (mqlExpMovingAvgAlpha _),
    "mql_group_nacc" -> (mqlGroupNacc _),
    "mql_window_range" -> (mqlWindowRange _),
    "mql_window_unit" -> (mqlWindowUnit _),
    "mql_window_calculus" -> (mqlWindowCalculus _),
    "mql_window_pct" -> (mqlWindowPercentile _),
    "mql_fill" -> (mqlFill _),
    "mql_fill_linear" -> (mqlFillLinear _),
    "mql_densify" -> (mqlDensify _),
    "mql_graph_lookup" -> (mqlGraphLookup _),
    "mql_facet" -> (mqlFacet _),
    "mql_bucket_auto" -> (mqlBucketAuto _),
    "mql_pipeline_accum" -> (mqlPipelineAccum _),
    "mql_project_exclude" -> (mqlProjectExclude _),
    "mql_replace_root_doc" -> (mqlReplaceRootDoc _),
    "mql_unwind" -> (mqlUnwind _),
    "mql_sort_by_count" -> (mqlSortByCount _),
    "mql_bucket" -> (mqlBucket _),
    "mql_union_with" -> (mqlUnionWith _),
    "mql_docs_array" -> (mqlDocsArray _),
    "mql_pipeline_topn" -> (mqlPipelineTopN _),
    "mql_elem_match" -> (mqlElemMatch _),
    "mql_pipeline_compute" -> (mqlPipelineCompute _),
    "mql_replace_root" -> (mqlReplaceRoot _)
  )
}
