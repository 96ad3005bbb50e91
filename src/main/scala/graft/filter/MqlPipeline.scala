package graft.filter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Mongo aggregation-pipeline → Catalyst translator — the second half of
  * the reference stack's delegated query surface. The reference itself
  * issues a pipeline internally (`[{$sort: {_m_id: 1}}, {$limit: 1}]`,
  * /root/reference/db/db.go:146-148), and FerretDB exposes the pipeline
  * to users; here each stage folds into the DataFrame plan, so the whole
  * pipeline is ONE Catalyst plan (pushdown/pruning/partial-agg all apply;
  * nothing is evaluated document-at-a-time).
  *
  * Supported stages: $match (pre-group via [[MqlFilter]] on metadata,
  * post-group on the real output columns — the HAVING shape), $group
  * (accumulators $sum/$avg/$min/$max/$count/$push/$addToSet/$first/
  * $last, `$sum: 1` counting; $first/$last require a prior $sort — see
  * [[accumulator]]), $sort (real
  * columns first — covers the reference's `_m_id` sort — else the
  * numeric metadata view), $limit, $skip, $project (inclusion /
  * exclusion — real columns AND metadata fields, incl. dotted paths /
  * computed fields, "$$ROOT" for the whole document), $addFields,
  * $replaceRoot (path and document forms), $count, $setWindowFields
  * (rank/denseRank/documentNumber, windowed accumulators with documents
  * bounds, $shift, $derivative/$integral over the primary sortBy axis —
  * mapped 1:1 onto Spark's Window API).
  *
  * Value expressions: `"$field"` is the STRING view of a metadata field;
  * `{"$toLong"|"$toDouble": "$field"}` the numeric view (MQL's
  * cross-numeric bracketing, explicit output type for engine parity).
  */
object MqlPipeline {

  private val mapper = new ObjectMapper()

  /** Reciprocal-rank-fusion constants, shared by the `$rankFusion`
    * stage here and the library-level hybrid search
    * ([[graft.operators.Similarity]] rag_hybrid_rrf): the standard
    * k=60 smoothing, and an integer surrogate for 1/(k+r) —
    * `SCALE div (k+r)` with both engines' truncating integer division,
    * so fused scores are exact 64-bit integers under the oracle hash
    * (float 1/(k+r) sums differ across engines in the last ulp).
    * SCALE=10¹² keeps every rank ≤ ~10⁶ a distinct contribution. */
  private[graft] val RrfK = 60L
  private[graft] val RrfScale = 1000000000000L

  /** $redact $$DESCEND bounds (r14): the recursive rewrite is unrolled
    * at plan time, so both the OBJECT nesting depth (DESCEND levels)
    * and the ARRAY nesting depth are fixed caps; beyond either the
    * verdict raises per row. 2 rewrite levels (root + subdocument +
    * leaf-DESCEND≡KEEP at the third) covers Mongo's own $redact
    * examples; the caps are PLAN-SIZE dials — the unrolled tree grows
    * ~3.5× per extra level (measured: depth 3 ≈ 13 s of pure
    * plan/codegen time per query at ANY row count, depth 2 ≈ 4 s),
    * so widening them trades fixed driver latency, not correctness. */
  private[graft] val RedactMaxDepth = 2
  private[graft] val RedactMaxArrayDepth = 1

  /** `$scoreFusion`'s fixed-point "1.0": minMaxScaler normalization
    * maps each leg's scores onto [0, ScoreNormScale] in exact integer
    * arithmetic — `(s − min)·ScoreNormScale DIV (max − min)` (both
    * engines truncate; operands nonnegative so DuckDB `//` agrees).
    * 10⁶ keeps a leg with up to ~10⁶ distinct score values
    * distinguishable after normalization. */
  private[graft] val ScoreNormScale = 1000000L

  /** `$scoreFusion` sigmoid normalization as a BAKED TABLE (r16 — the
    * ZoneRules device applied to a transcendental): scores are
    * integral by the stage contract, and at the [[ScoreNormScale]]
    * fixed-point scale sigmoid SATURATES outside |s| ≤ 20
    * (floor(10⁶·σ(s)) is 999999 for every s ≥ 14 and 0 for every
    * s ≤ −14), so the whole function is these 41 values. They are
    * computed ONCE here and embedded as literals on BOTH engines
    * ([[sigmoidTableSql]] for the oracle) — no cross-engine float
    * arithmetic ever runs, which is what kept sigmoid loud through
    * r15. */
  private[graft] lazy val SigmoidTable: IndexedSeq[Long] =
    (-20 to 20).map(s =>
      math.floor(ScoreNormScale / (1.0 + math.exp(-s))).toLong)

  /** The identical table as a DuckDB list literal, for gate oracles. */
  def sigmoidTableSql: String = SigmoidTable.mkString("[", ",", "]")

  /** Internal rank column a `rank=true` sub-pipeline run appends. */
  private val RankCol = "__graft_rank"

  /** Run `pipelineJson` (a JSON array of stages) over `df`, resolving
    * metadata field paths through `metaCol` (a JSON document column).
    * `lookup` resolves a $lookup stage's `from` name to (frame, its
    * metadata column); the default rejects $lookup. */
  def aggregate(df: DataFrame, metaCol: Column, pipelineJson: String,
      lookup: String => (DataFrame, Column) = name =>
        throw new IllegalArgumentException(
          s"$$lookup unsupported here (no collection resolver): $name")): DataFrame =
    aggregateImpl(df, metaCol, pipelineJson, lookup, None)

  /** [[aggregate]] under a Mongo collation document (the find/aggregate
    * `collation` option). Strength 3 is the identity; strength 1–2
    * makes $match string compares and $sort string keys
    * case-insensitive (both sides fold through lower() — the
    * [[MqlFilter.toColumn]] collated form). Under a case-insensitive
    * collation the pipeline is restricted to the FIND shape
    * ($match/$sort/$project/$limit/$skip/$count): $group equality,
    * accumulator compares and lookups are NOT collated on this engine,
    * so they refuse loudly rather than silently running
    * case-sensitively. Unsupported locales/strengths are loud in
    * [[MqlFilter.parseCollation]]. */
  def aggregateCollated(df: DataFrame, metaCol: Column,
      pipelineJson: String, collationJson: String,
      lookup: String => (DataFrame, Column) = name =>
        throw new IllegalArgumentException(
          s"$$lookup unsupported here (no collection resolver): $name"))
      : DataFrame =
    aggregateImpl(df, metaCol, pipelineJson, lookup,
      Some(MqlFilter.parseCollation(collationJson)))

  private def aggregateImpl(df: DataFrame, metaCol: Column,
      pipelineJson: String, lookup: String => (DataFrame, Column),
      collation: Option[MqlFilter.Collation],
      rankMode: Boolean = false): DataFrame = {
    val ci = collation.exists(_.active)
    val ciStages = Set("$match", "$sort", "$project", "$limit",
      "$skip", "$count")
    val stages = mapper.readTree(pipelineJson)
    require(stages.isArray, s"pipeline must be a JSON array: $pipelineJson")
    var cur = df
    // the metadata ROOT is rebindable: $replaceRoot points it at an
    // embedded sub-document for all later stages
    var meta = metaCol
    var grouped = false
    // an explicit $limit has bounded the stream (rank-mode precondition)
    var limited = false
    // search terms of the last top-level $text $match — the basis of
    // {$meta: "textScore"} in later $project/$addFields/$sort stages
    // (Mongo requires the $text to precede any $meta use; same here).
    // Terms are recorded POST-analysis and the analyzer says which
    // tokenizer scores the document side — the score must count in
    // the same token space the $text matched in (r18: absent
    // $language defaults to the english analyzer, Mongo's default
    // index language; baked es/fr/de dispatch the same way).
    var textTerms: Option[Seq[String]] = None
    var textAnalyzer: Option[graft.functions.Stemmer.TextAnalyzer] =
      Some(graft.functions.Stemmer.EnglishAnalyzer)
    // the integer-micro score column of the last $vectorSearch — the
    // basis of {$meta: "vectorSearchScore"} in later stages
    var vsScore: Option[String] = None
    // the last pre-group $sort, as (key column, desc?) pairs — the
    // defined order that $first/$last/$push accumulators translate to
    // (a pre-group orderBy does not survive the aggregation exchange,
    // so order-sensitive accumulators re-derive it per group)
    var sortKeys: Seq[(Column, Boolean)] = Nil
    // internal columns materializing a rebound metadata root (see the
    // $project exclusion stage); dropped from the final frame
    val helperCols = scala.collection.mutable.ArrayBuffer.empty[String]
    // Materialize non-trivial SORT / PARTITION key expressions as real
    // columns before handing them to orderBy / Window: Sort, range-
    // partitioning sampling and Window evaluate key expressions
    // WITHOUT codegen subexpression elimination, so a JSON-resolved
    // type-bracketing key re-parses the document dozens of times per
    // row (the r11 sf1 audit measured mql_window_fields at 14.6 s for
    // 50k rows). One codegen'd Project evaluates each key once; the
    // helper columns drop from the final frame. Plain column
    // references pass through untouched.
    def materializeKeys(cs: Seq[Column]): Seq[Column] = cs.map { c =>
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.expressions.Attribute
      val e = org.apache.spark.sql.graft.ColumnBridge.expression(c)
      if (e.isInstanceOf[UnresolvedAttribute] || e.isInstanceOf[Attribute])
        c
      else {
        val tmp = s"__graft_key_${helperCols.size}"
        helperCols += tmp
        cur = cur.withColumn(tmp, c)
        col(tmp)
      }
    }
    // PARTITION keys resolve "$field" refs through the TYPE-BRACKETED
    // views (sortBases — num AND str), NOT valueExpr's bare-ref string
    // view: a numeric metadata field reads null on the string view and
    // would silently collapse every document into one partition
    // (r17 — caught by the $expMovingAvg gate's numeric user bucket).
    def partitionKeyCols(pn: JsonNode,
        shared: Option[MqlFilter.JsonResolver] = None): Seq[Column] =
      if (pn.isTextual && pn.asText().startsWith("$") &&
          !pn.asText().startsWith("$$"))
        sortBases(pn.asText().drop(1), cur, meta, shared = shared)
      else Seq(valueExprWith(pn, meta, cur, shared))
    // ONE materialized document parse shared by every resolution point
    // of a window-family stage (r18 — the r16 stage-prelude device
    // extended to $setWindowFields/$fill/$expMovingAvg): partition
    // keys, sort keys and operator inputs each built a fresh
    // JsonResolver, so the materialized-key Project of mql_window_nacc
    // carried 124 try_parse_json + 107 schema_of_variant evaluations
    // PER ROW (5.45 s steady for 5000 rows). With the shared parse the
    // Project evaluates try_parse_json once per row and every view is
    // a codegen-able variant_get on it; when nothing touches the
    // document the helper column is column-pruned away for free.
    def stageDocResolver(): MqlFilter.JsonResolver = {
      val pcol = s"__graft_doc_${helperCols.size}"
      helperCols += pcol
      cur = cur.withColumn(pcol, try_parse_json(meta))
      val r = MqlFilter.JsonResolver(meta)
      r.parsed = col(pcol)
      // each typed view materializes as its OWN small helper column on
      // first use (probe-less pre-resolution): inlining the views into
      // window keys built CASE trees past the JIT method-size ceiling
      // (mql_window_nacc ran interpreted, erratic 3.2-12 s); try_-based
      // views are safe to evaluate unconditionally, and an unused one
      // is column-pruned away
      r.materializer = Some { (kind, f, built) =>
        val hcol = s"__graft_view_${helperCols.size}"
        helperCols += hcol
        cur = cur.withColumn(hcol, built)
        col(hcol)
      }
      r
    }

    // {$meta: "textScore"}: the deterministic score surrogate — total
    // occurrences of the (distinct) search terms among the document's
    // tokens, an exact integer (Mongo's own textScore is an
    // index-internal tf weighting; the SURFACE — score projection and
    // $meta sort after a $text match — is the parity being provided,
    // and this engine's score is reproducible under the oracle). The
    // membership probe plans through the array_position→InSet rule.
    def isMetaTextScore(n: JsonNode): Boolean =
      n.isObject && n.properties().size() == 1 &&
        n.get("$meta") != null
    def metaScoreCol(n: JsonNode): Column =
      n.get("$meta").asText() match {
        case "textScore" =>
          val terms = textTerms.getOrElse(
            throw new IllegalArgumentException(
              "{$meta: \"textScore\"} requires a preceding top-level " +
                "$text $match stage (Mongo contract)"))
          val toks = textAnalyzer.map(_.docTokens(col("text")))
            .getOrElse(graft.functions.TextFunctions.tokens(col("text")))
          size(filter(toks,
            t => array_position(typedLit(terms), t) > 0)).cast("long")
        case "vectorSearchScore" =>
          // the engine's score is integer MICROS of Atlas's
          // documented normalization (the cosµ stance) — exposed as
          // LONG, reproducible under the oracle
          col(vsScore.getOrElse(throw new IllegalArgumentException(
            "{$meta: \"vectorSearchScore\"} requires a preceding " +
              "$vectorSearch stage (Atlas contract)")))
        case other => throw new IllegalArgumentException(
          s"""only {"$$meta": "textScore"} and {"$$meta": """ +
            s""""vectorSearchScore"} are supported, got: $other""")
      }
    // Parse-once prelude (r16): a multi-entry $addFields/$project/
    // $group stage previously paid one FULL-DOCUMENT JSON parse per
    // metadata-touching entry per row — computeExpr binds its parse
    // per EXPRESSION ([[bindOnce]]), and entries are separate
    // expressions, so a 13-op date stage re-parsed the same document
    // 13 times (the r15 sf10 audit: mql_date_parts_ext 22.8 s, the
    // suite's most expensive gate, ~all of it redundant parsing; the
    // lambda-binding wrapper also keeps every entry out of whole-stage
    // codegen — HOFs evaluate interpreted). When ANY entry touches the
    // document, materialize try_parse_json(meta) ONCE as a helper
    // column and resolve every entry against it directly: one parse
    // per row per stage, and the entries become plain codegen-able
    // variant_gets. (With a SINGLE consumer the multi-consumer
    // CollapseProject argument below doesn't apply — but then the
    // non-cheap alias has exactly one reference, so CollapseProject
    // inlines it and the plan is identical to not materializing;
    // keeping the ≥1 threshold buys the codegen-able variant_get shape
    // for free rather than leaving the lone entry on the interpreted
    // bindOnce path.) No optimizer fence is needed — CollapseProject
    // keeps a non-cheap alias with >1 consumer in its own Project
    // (verified on Spark 4.1: exactly one parseJson in the optimized
    // plan) and the alias stays deterministic, so later $match
    // predicates still push past it to the scan (unlike the
    // non-deterministic removeFieldsOnce fence, which only guards the
    // root-REBIND case where the rewrite must also pin).
    // `extra`: metadata-touching entries the caller already knows about
    // that don't go through computeExprRes (a $project's bare {f: 1}
    // inclusion flags resolving through the document).
    def stageResolver(nodes: Seq[JsonNode], extra: Int = 0)
        : Option[MqlFilter.JsonResolver] = {
      // PROBE pass: build every entry once against a recording
      // resolver to learn which (view, field) pairs the stage
      // resolves through the document. Try: a probe node outside the
      // compute language ($count's {}, an accumulator literal) simply
      // doesn't touch the document — the REAL build still raises on
      // genuinely bad expressions.
      val wanted =
        scala.collection.mutable.LinkedHashSet.empty[(String, String)]
      var touching = extra
      nodes.foreach { n =>
        val probe = MqlFilter.JsonResolver(meta)
        probe.recordTo = Some(wanted)
        scala.util.Try(computeExprRes(n, meta, cur, probe))
        if (probe.touched) touching += 1
      }
      if (touching < 1 && wanted.isEmpty) None
      else {
        // ONE materialized document parse, plus one materialized REAL
        // column per recorded typed view: per-op re-derivation sits
        // inside per-op CASE branches, which codegen subexpression
        // elimination deliberately skips, so a 13-op date stage paid
        // 13 timestamp re-parses of the same field — a helper column
        // evaluates each view exactly once per row (try_-based views
        // are safe to evaluate unconditionally). Also keeps bindOnce's
        // ArrayTransform out of the stage: one CodegenFallback
        // expression would exclude the whole collapsed projection from
        // whole-stage codegen.
        val pcol = s"__graft_doc_${helperCols.size}"
        helperCols += pcol
        cur = cur.withColumn(pcol, try_parse_json(meta))
        val base = MqlFilter.JsonResolver(meta)
        base.parsed = col(pcol)
        val resolvedViews = wanted.toSeq.map { case (kind, f) =>
          val hcol = s"__graft_view_${helperCols.size}"
          helperCols += hcol
          cur = cur.withColumn(hcol, base.viewOf(kind, f))
          (kind, f) -> col(hcol)
        }.toMap
        val r = MqlFilter.JsonResolver(meta)
        r.parsed = col(pcol)
        r.preResolved = resolvedViews
        Some(r)
      }
    }
    for (stage <- stages.elements().asScala) {
      val fields = stage.properties().asScala.toSeq
      require(fields.length == 1, s"one operator per stage, got: $stage")
      val (op, spec) = (fields.head.getKey, fields.head.getValue)
      if (ci) require(ciStages.contains(op),
        s"$op under a collation is unsupported " +
          s"(only ${ciStages.toSeq.sorted.mkString("/")} are collated " +
          "on this engine — loud, never silently case-sensitive)")
      op match {
        case "$match" =>
          // a top-level $text records its search terms for later
          // {$meta: "textScore"} stages (the filter itself translates
          // through MqlFilter unchanged)
          if (spec.isObject && spec.get("$text") != null) {
            val tn = spec.get("$text")
            val search = tn.get("$search").asText()
            // same language resolution as the $text predicate itself
            // (MqlFilter validates the full option surface when the
            // stage's filter translates right below)
            textAnalyzer = graft.functions.Stemmer.analyzerFor(
              Option(tn.get("$language")).map(_.asText())
                .getOrElse("english"))
            textTerms = Some(textAnalyzer match {
              case Some(a) => a.searchTerms(search)
              case None => search.toLowerCase
                .split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq
            })
          }
          // real columns win (post-$group output, post-$unwind element);
          // everything else resolves through the metadata document
          val typed = MqlFilter.TypedResolver(
            cur.schema.fields.map(f => f.name -> col(f.name)).toMap,
            cur.schema.fields.map(f => f.name -> f.dataType).toMap)
          val r =
            if (grouped) typed
            else new HybridResolver(cur.columns.toSet, typed,
              MqlFilter.JsonResolver(meta))
          cur = cur.filter(MqlFilter.toColumn(spec.toString, r, collation))

        case "$group" =>
          require(!grouped, "nested $group unsupported")
          val idNode = spec.get("_id")
          require(idNode != null, "$group requires _id")
          val aggEntries = spec.properties().asScala.toSeq
            .filterNot(_.getKey == "_id")
          // multi-accumulator stages share ONE document parse: the
          // probe sees each accumulator's OPERAND (plus the _id
          // expression) — the helper Project sits under the aggregate,
          // so operands evaluate as variant_gets map-side
          val gShared = stageResolver(
            aggEntries.flatMap(e =>
              e.getValue.properties().asScala.headOption.map(_.getValue))
            ++ Option(idNode).filterNot(_.isNull).toSeq)
          val aggs = aggEntries.map { e =>
            accumulator(e.getValue, meta, cur, sortKeys, gShared)
              .as(e.getKey) }
          require(aggs.nonEmpty, "$group needs at least one accumulator")
          cur =
            if (idNode.isNull)
              // hidden row count + filter: Mongo's $group over an empty
              // stream emits NO document, Spark's global agg emits one
              cur.groupBy().agg(aggs.head,
                  aggs.tail :+ count(lit(1)).as("_nrows"): _*)
                .filter(col("_nrows") > 0)
                .select(lit(null).cast("string").as("_id") +:
                  aggEntries.map(e => col(e.getKey)): _*)
            else cur.groupBy(valueExprWith(idNode, meta, cur, gShared)
                .as("_id"))
              .agg(aggs.head, aggs.tail: _*)
          grouped = true

        case "$sort" =>
          val keyPairs = spec.properties().asScala.toSeq.flatMap { e =>
            if (isMetaTextScore(e.getValue))
              // Mongo's $meta sort is best-match-first: descending
              Seq((metaScoreCol(e.getValue), true))
            else {
              val desc = e.getValue.asInt() < 0
              sortBases(e.getKey, cur, meta, collation)
                .map(b => (b, desc))
            }
          }
          val mat = materializeKeys(keyPairs.map(_._1))
            .zip(keyPairs.map(_._2))
          if (!grouped) sortKeys = mat
          cur = cur.orderBy(mat.map { case (b, desc) =>
            if (desc) b.desc else b.asc }: _*)

        case "$limit" => cur = cur.limit(spec.asInt()); limited = true
        case "$skip" => cur = cur.offset(spec.asInt())

        case "$unwind" =>
          // array fan-out: one row per element, surfaced as a REAL column
          // named after the field — later $group/$sort/$project on
          // "$field" resolve that column (Mongo's post-unwind document
          // shape, for the common unwind → group roll-up)
          require(spec.isTextual && spec.asText().startsWith("$"),
            s"$$unwind operand must be a \"$$field\" path, got: $spec")
          val f = spec.asText().stripPrefix("$")
          // post-$group/$facet the metadata view is gone, but unwinding
          // a REAL output column (a $facet array, a $push result) is
          // well-defined — only the JSON-resolver path needs pre-group
          require(!grouped || cur.columns.contains(f),
            "$unwind after $group/$facet only supports real output " +
              s"columns, got: $f")
          val arrCol =
            if (cur.columns.contains(f)) col(f)
            else MqlFilter.JsonResolver(meta).arr(f)
          cur = cur.withColumn(f, explode(arrCol))

        case "$project" =>
          val entries = spec.properties().asScala.toSeq
          def isFlag(n: JsonNode) = n.isInt || n.isBoolean
          val exc = entries.filter(e =>
            isFlag(e.getValue) && e.getValue.asInt(1) == 0)
          // Mongo allows mixing inclusion with COMPUTED fields; only
          // inclusion+exclusion is invalid
          require(exc.isEmpty || exc.size == entries.size,
            s"$$project cannot mix inclusion and exclusion: $spec")
          cur =
            if (exc.nonEmpty) {
              // exclusion form: REAL columns drop from the frame;
              // metadata fields (incl. dotted paths into sub-documents)
              // rewrite the JSON root via [[JsonRewrite.removeFields]],
              // so later stages — and a "$$ROOT" projection — see the
              // document without them
              val (realExc, metaExc) = exc.map(_.getKey)
                .partition(cur.columns.contains)
              val dropped =
                if (realExc.nonEmpty) cur.drop(realExc: _*) else cur
              if (metaExc.nonEmpty) {
                // materialize the rewritten document ONCE as a real
                // column and rebind the root to it — without this,
                // every later stage referencing a metadata field would
                // re-embed (and re-run) the parse+rewrite per consuming
                // leaf (no Catalyst global CSE). The UDF is marked
                // non-deterministic ONLY to pin that single evaluation:
                // CollapseProject/PushDownPredicates inline cheap-or-
                // deterministic aliases into every consumer, which is
                // the exact duplication this column exists to prevent.
                // (Rewriting is pure; the marker is an optimizer fence,
                // not a semantic claim.)
                val tmp = s"__graft_root_${helperCols.size}"
                helperCols += tmp
                val once = dropped.withColumn(tmp,
                  JsonRewrite.removeFieldsOnce(meta, metaExc))
                meta = col(tmp)
                once
              } else dropped
            } else {
              // entry order preserved: {f: 1} includes, anything else is
              // a computed expression aliased to the key. Multi-entry
              // stages share ONE document parse (stageResolver above) —
              // bare inclusion flags resolving through the document
              // count toward the threshold and resolve through the
              // shared parse too.
              val metaFlags = entries.count(e => isFlag(e.getValue) &&
                !cur.columns.contains(e.getKey))
              val shared = stageResolver(
                entries.filterNot(e => isFlag(e.getValue) ||
                  isMetaTextScore(e.getValue)).map(_.getValue),
                extra = metaFlags)
              val cols = entries.map { e =>
                val f = e.getKey
                if (isFlag(e.getValue)) {
                  if (cur.columns.contains(f)) col(f)
                  else shared.getOrElse(MqlFilter.JsonResolver(meta))
                    .str(f).as(f)
                } else if (isMetaTextScore(e.getValue))
                  metaScoreCol(e.getValue).as(f)
                else (shared match {
                  case Some(r) => computeExprRes(e.getValue, meta, cur, r)
                  case None => computeExpr(e.getValue, meta, cur)
                }).as(f)
              }
              cur.select(cols: _*)
            }

        case "$addFields" =>
          // each entry becomes (or replaces) a REAL column computed from
          // the expression language below — later $match/$sort/$group
          // stages then resolve it through the typed path, which is
          // Mongo's post-$addFields document shape. Multi-entry stages
          // share ONE document parse (stageResolver above).
          val afEntries = spec.properties().asScala.toSeq
          val afShared = stageResolver(
            afEntries.filterNot(e => isMetaTextScore(e.getValue))
              .map(_.getValue))
          for (e <- afEntries)
            cur = cur.withColumn(e.getKey,
              if (isMetaTextScore(e.getValue)) metaScoreCol(e.getValue)
              else afShared match {
                case Some(r) => computeExprRes(e.getValue, meta, cur, r)
                case None => computeExpr(e.getValue, meta, cur)
              })

        case op @ ("$replaceRoot" | "$replaceWith") =>
          // {newRoot: "$f"}: promote an embedded sub-document to the
          // metadata root — later stages resolve fields inside it. The
          // JSON-text extraction keeps the root a plain JSON column, so
          // every resolver path (VARIANT views, arr, $lookup) works
          // unchanged. Documents without the field get a null root:
          // positive predicates go false, Mongo errors instead — the
          // lenient choice is documented, not accidental.
          //
          // {newRoot: {k: expr, ...}} (the document form): COMPOSE a new
          // root from computed-expression entries — to_json(struct(...))
          // keeps it a plain JSON column like the path form. Null entry
          // values are omitted from the document (Spark's to_json
          // default), which is exactly Mongo's missing-field shape.
          // $replaceWith (r17) is Mongo 4.2's alias: the stage VALUE is
          // the new root expression itself — normalize and share the
          // one implementation so the spellings cannot diverge
          val nr =
            if (op == "$replaceWith") spec
            else {
              require(spec.isObject && spec.get("newRoot") != null,
                s"$$replaceRoot needs a newRoot, got: $spec")
              spec.get("newRoot")
            }
          if (nr.isTextual && nr.asText().startsWith("$"))
            meta = get_json_object(meta, s"$$.${nr.asText().drop(1)}")
          else if (nr.isObject && nr.properties().size() > 0)
            meta = to_json(struct(nr.properties().asScala.toSeq.map(e =>
              computeExpr(e.getValue, meta, cur).as(e.getKey)): _*))
          else throw new IllegalArgumentException(
            s"$op needs a \"$$field\" path or a non-empty " +
              s"document, got: $spec")

        case "$lookup" =>
          // {from, localField, foreignField, as}: left outer equi-match,
          // matches re-nested as an ARRAY of the foreign documents'
          // metadata (Mongo's embedded-docs shape; [] when none). The
          // equality respects MQL bracketing — numeric matches numeric,
          // string matches string — expressed as ONE equi-join on a
          // type-tagged key ("n:"+double / "s:"+string) instead of an
          // OR of typed comparisons: an OR condition degrades to a
          // nested-loop join (no hashable key), which is quadratic
          // against a large foreign collection; the tagged key hashes,
          // shuffles and broadcasts like any equi-join. A missing field
          // yields a null key on either side and null never equi-matches
          // (missing does NOT match missing — documented divergence from
          // Mongo's null-eq-null lookup, same stance as $match).
          // Re-nesting groups by ALL current columns — callers need a
          // unique key column in the frame (collections carry _m_id).
          require(!grouped, "$lookup after $group unsupported")
          require(spec.has("from") && spec.has("as"),
            s"$$lookup needs from + as: $spec")
          val from = spec.get("from").asText()
          val as = spec.get("as").asText()
          val (fdf, fmeta) = lookup(from)
          def bracketKey(r: MqlFilter.JsonResolver, f: String): Column =
            coalesce(
              concat(lit("n:"), r.num(f).cast("string")),
              concat(lit("s:"), r.str(f)))
          val fres = MqlFilter.JsonResolver(fmeta)
          val lres = MqlFilter.JsonResolver(meta)
          val leftCols = cur.columns.map(col)
          // the correlated form: {from, let: {v: "$localPath"},
          // pipeline: [{$match: {$expr: ...}} | {$match: <plain MQL>}],
          // as}. Scope (loud otherwise): the $expr is an equality (or
          // $and of equalities) between a `$$let-var` and a foreign
          // `$field` — each becomes a type-tagged equi-join key (the
          // same hashable bracket as the classic form — a general
          // correlated predicate would nested-loop); plain $match
          // stages are UNcorrelated and commute with the join, so they
          // pre-filter the foreign side.
          val keyPairs: Seq[(String, String)] =
            if (spec.has("let") || spec.has("pipeline")) {
              require(spec.has("let") && spec.has("pipeline"),
                s"$$lookup let/pipeline travel together: $spec")
              val lets = spec.get("let").properties().asScala.map { e =>
                val v = e.getValue
                require(v.isTextual && v.asText().startsWith("$") &&
                  !v.asText().startsWith("$$"),
                  s"$$lookup let value must be a '$$localField' path: $v")
                e.getKey -> v.asText().drop(1)
              }.toMap
              val pairs = scala.collection.mutable.Buffer
                .empty[(String, String)]
              spec.get("pipeline").elements().asScala.foreach { st =>
                require(st.isObject && st.properties().size() == 1 &&
                  st.has("$match"),
                  s"$$lookup sub-pipeline supports $$match stages only: " +
                    st)
                val mm = st.get("$match")
                if (mm.has("$expr")) {
                  require(mm.properties().size() == 1,
                    s"correlated $$match must be {$$expr: ...}: $mm")
                  val ex = mm.get("$expr")
                  def eqPair(eq: JsonNode): Unit = {
                    require(eq.isObject && eq.has("$eq"),
                      s"$$lookup $$expr supports $$eq (or $$and of " +
                        s"them): $eq")
                    val Seq(a, b) = eq.get("$eq").elements().asScala.toSeq
                    def varOf(n: JsonNode): Option[String] =
                      if (n.isTextual && n.asText().startsWith("$$"))
                        Some(n.asText().drop(2)) else None
                    def fieldOf(n: JsonNode): Option[String] =
                      if (n.isTextual && n.asText().startsWith("$") &&
                        !n.asText().startsWith("$$"))
                        Some(n.asText().drop(1)) else None
                    (varOf(a), fieldOf(b), varOf(b), fieldOf(a)) match {
                      case (Some(v), Some(f), _, _) =>
                        pairs += ((lets.getOrElse(v, sys.error(
                          s"unknown $$lookup let variable: $v")), f))
                      case (_, _, Some(v), Some(f)) =>
                        pairs += ((lets.getOrElse(v, sys.error(
                          s"unknown $$lookup let variable: $v")), f))
                      case _ => throw new IllegalArgumentException(
                        s"$$lookup $$eq must pair a $$$$let-var with a " +
                          s"foreign $$field: $eq")
                    }
                  }
                  if (ex.isObject && ex.has("$and"))
                    ex.get("$and").elements().asScala.foreach(eqPair)
                  else eqPair(ex)
                } else () // plain MQL $match — applied below
              }
              require(pairs.nonEmpty,
                "$lookup pipeline needs a correlated {$match: {$expr}}")
              pairs.toSeq
            } else {
              val req = Seq("localField", "foreignField")
              require(req.forall(spec.has),
                s"$$lookup needs {localField, foreignField} (or " +
                  s"let/pipeline): $spec")
              Seq((spec.get("localField").asText(),
                spec.get("foreignField").asText()))
            }
          // uncorrelated sub-pipeline $match stages pre-filter fdf
          val fdf2 =
            if (spec.has("pipeline"))
              spec.get("pipeline").elements().asScala
                .filter(st => !st.get("$match").has("$expr"))
                .foldLeft(fdf) { (d, st) =>
                  d.filter(coalesce(MqlFilter.toColumn(
                    st.get("$match").toString, fres), lit(false)))
                }
            else fdf
          val fKeyCols = keyPairs.zipWithIndex.map { case ((_, ff), i) =>
            bracketKey(fres, ff).as(s"__f_key$i")
          }
          val f2 = fdf2.select((fmeta.as("__f_meta") +: fKeyCols): _*)
          val joinCond = keyPairs.zipWithIndex.map { case ((lf, _), i) =>
            bracketKey(lres, lf) === col(s"__f_key$i")
          }.reduce(_ && _)
          cur = cur.join(f2, joinCond, "left")
            .groupBy(leftCols: _*)
            .agg(collect_list(col("__f_meta")).as(as))

        case "$merge" =>
          // Mongo's terminal output stage: {into, on, whenMatched,
          // whenNotMatched} — the pipeline result keyed-merged into a
          // sibling collection. Mongo's whenMatched/whenNotMatched modes
          // map 1:1 onto [[graft.operators.Upsert]]'s (replace /
          // keepExisting / merge / fail × insert / discard / fail): ONE
          // full-outer shuffle join, the 100 TB shape. Divergence: the
          // merged frame is RETURNED (the engine is a library over
          // immutable parquet — the caller owns persistence; a
          // collection write-back is the kaer_delete_update machinery).
          require(spec.isObject && spec.get("into") != null,
            s"$$merge needs {into, on?, whenMatched?, whenNotMatched?}: " +
              spec)
          val mInto = spec.get("into").asText()
          val mOn = Option(spec.get("on")).map(_.asText())
            .getOrElse("_id")
          val wm = Option(spec.get("whenMatched")).map(_.asText())
            .getOrElse("merge") // Mongo's default
          val wnm = Option(spec.get("whenNotMatched")).map(_.asText())
            .getOrElse("insert")
          val (mdf, _) = lookup(mInto)
          require(cur.columns.contains(mOn),
            s"$$merge on-field must be a real column of the pipeline " +
              s"output: $mOn (have ${cur.columns.mkString(", ")})")
          require(mdf.columns.toSet == cur.columns.toSet,
            s"$$merge schemas must match by name: target " +
              s"${mdf.columns.mkString(",")} vs ${cur.columns.mkString(",")}")
          cur = graft.operators.Upsert.upsert(
            mdf.select(cur.columns.map(col): _*), cur, Seq(mOn),
            whenMatched = wm, whenNotMatched = wnm)
          grouped = true // $merge is terminal for metadata resolution

        case "$sample" =>
          // {"size": k} — Mongo's random sample in this engine's
          // REPRODUCIBLE form (the split_corpus/sample_stratified
          // stance: sampling is a property of the DOCUMENT, never
          // rand()): rank by the md5-60 hash of the canonically
          // pipe-serialized real columns and keep the k smallest.
          // Stable under re-runs, reshards, and engine — which also
          // puts the sample itself under the oracle hash. Only
          // integral/string columns serialize (doubles/timestamps
          // have engine-dependent string forms — loud).
          require(spec.isObject && spec.get("size") != null &&
            spec.get("size").isIntegralNumber &&
            spec.get("size").asLong() > 0,
            s"$$sample needs {size: k > 0}: $spec")
          val sk = spec.get("size").asInt()
          import org.apache.spark.sql.types.{IntegerType, LongType,
            StringType}
          cur.schema.fields.foreach(f => require(
            f.dataType == LongType || f.dataType == IntegerType ||
              f.dataType == StringType,
            s"$$sample serializes integral/string columns only; " +
              s"'${f.name}' is ${f.dataType} (cast or project it away)"))
          val ser = concat_ws("|", cur.columns.map(col): _*)
          cur = cur
            .withColumn("_sh",
              graft.functions.TextFunctions.md5Hash60(ser))
            .orderBy(col("_sh").asc).limit(sk).drop("_sh")

        case "$documents" =>
          // Mongo 5.1's literal-documents pipeline source: replaces
          // the input stream with the operand array's documents (the
          // unit-composition / seed-data device). First stage only
          // (Mongo). Each document becomes a row whose JSON text is
          // the new metadata root — every later stage resolves fields
          // through the normal document path; the carrier column drops
          // from the final frame.
          require(cur eq df,
            "$documents must be the first pipeline stage (Mongo)")
          require(spec.isArray && spec.size() > 0,
            s"$$documents needs a non-empty array of documents: $spec")
          spec.elements().asScala.foreach(d => require(d.isObject,
            s"$$documents entries must be objects, got: $d"))
          val docRows = spec.elements().asScala.map(_.toString).toSeq
          val sess = cur.sparkSession
          val tmp = s"__graft_root_${helperCols.size}"
          helperCols += tmp
          cur = sess.createDataset(docRows)(
            org.apache.spark.sql.Encoders.STRING).toDF(tmp)
          meta = col(tmp)

        case "$rankFusion" =>
          // Mongo 8.1's hybrid-search stage: named input pipelines each
          // rank the SAME collection independently, and documents fuse
          // by weighted reciprocal rank — here the integer-exact
          // surrogate Σ w·([[RrfScale]] div ([[RrfK]] + rank)), 0 for a
          // leg that did not rank the document (float 1/(k+r) sums
          // differ across engines in the last ulp — same stance as the
          // library-level rag_hybrid_rrf). Engine contract (documented
          // divergences): must be the first stage; every input pipeline
          // must project a real `_id` column BEFORE its final
          // total-order $sort + mandatory $limit (rank-mode
          // preconditions — see the rank tail); `_id` must be unique
          // per leg output (duplicate ids would fan the fusion join
          // out); output documents are {_id, score} ordered by
          // (score desc, _id asc), plus flat `<name>_rank` columns when
          // scoreDetails is true (Mongo nests details under metadata).
          // Weights are POSITIVE INTEGERS (exact fusion scores; Mongo's
          // fractional weights would reintroduce float sums), default 1.
          // Scale: each leg is its own bounded pipeline ending in a
          // top-k; the fusion full-outer joins k-sized lists — cost
          // independent of corpus size.
          require(cur eq df,
            "$rankFusion must be the first pipeline stage (Mongo)")
          val rfAllowed = Set("input", "combination", "scoreDetails")
          spec.properties().asScala.foreach(e => require(
            rfAllowed(e.getKey),
            s"unsupported $$rankFusion option (scope: " +
              s"${rfAllowed.toSeq.sorted.mkString("/")}): ${e.getKey}"))
          val pipesN = Option(spec.get("input"))
            .map(_.get("pipelines")).orNull
          require(pipesN != null && pipesN.isObject &&
            pipesN.properties().size() >= 2,
            s"$$rankFusion needs input.pipelines with >= 2 named " +
              s"pipelines: $spec")
          Option(spec.get("combination")).foreach(c =>
            c.properties().asScala.foreach(e => require(
              e.getKey == "weights",
              s"unsupported $$rankFusion combination option " +
                s"(weights only): ${e.getKey}")))
          val weightsN = Option(spec.get("combination"))
            .flatMap(c => Option(c.get("weights"))).orNull
          val rfDetails =
            Option(spec.get("scoreDetails")).exists(_.asBoolean())
          val legs = pipesN.properties().asScala.toSeq.map { e =>
            val name = e.getKey
            require(name.matches("[A-Za-z0-9_]+"),
              s"$$rankFusion pipeline names must be [A-Za-z0-9_]+: $name")
            val w = Option(weightsN).flatMap(wn => Option(wn.get(name)))
              .map { n =>
                require(n.isIntegralNumber && n.asLong() > 0,
                  "$rankFusion weights must be positive integers " +
                    s"(exact fusion scores): $name -> $n")
                n.asLong()
              }.getOrElse(1L)
            val ranked = aggregateImpl(df, metaCol, e.getValue.toString,
              lookup, collation, rankMode = true)
            require(ranked.columns.contains("_id"),
              s"$$rankFusion input pipeline '$name' must $$project a " +
                "real _id column (ranked outputs fuse by _id)")
            (name, w,
              ranked.select(col("_id"), col(RankCol).as(s"__rf_$name")))
          }
          val fusedBase = legs.map(_._3)
            .reduce((a, b) => a.join(b, Seq("_id"), "full_outer"))
          val score = legs.map { case (name, w, _) =>
            coalesce(
              expr(s"$w * ($RrfScale DIV ($RrfK + __rf_$name))"),
              lit(0L))
          }.reduce(_ + _)
          cur = legs.foldLeft(fusedBase.withColumn("score", score)) {
            case (c, (name, _, _)) =>
              if (rfDetails)
                c.withColumnRenamed(s"__rf_$name", s"${name}_rank")
              else c.drop(s"__rf_$name")
          }.orderBy(col("score").desc, col("_id").asc)
          grouped = true

        case "$scoreFusion" =>
          // Mongo 8.2's score-based hybrid-search stage — the sibling
          // of $rankFusion: named input pipelines each SCORE the same
          // collection, per-leg scores normalize onto a shared range,
          // and documents fuse by the weighted AVERAGE of the
          // normalized scores. Engine contract (documented
          // divergences): Mongo feeds legs from scored search stages
          // and reads the score METADATA; this flat surface has no
          // $search metadata, so each input pipeline must $project a
          // real integral `_score` column (its leg score) alongside
          // `_id`, then END with a total-order $sort + mandatory
          // $limit (the same rank-mode bounding contract as
          // $rankFusion — legs are top-k lists, fusion full-outer
          // joins k-sized frames, cost independent of corpus size).
          // input.normalization (required, as in Mongo):
          // "minMaxScaler" = the integer surrogate
          // (s − min)·[[ScoreNormScale]] DIV (max − min) over the
          // leg's bounded list, max = min collapsing to the scaled 1.0
          // (Mongo's single-point minmax); "none" = raw scores pass
          // through; "sigmoid" (r16) = the baked [[SigmoidTable]]
          // (integral scores saturate the fixed-point scale beyond
          // |s| = 20, so 41 driver-computed literals ARE the function
          // — no cross-engine float math). Combination is
          // method "avg" only (the Mongo default):
          // score = floor(Σ w·norm / Σ w) with POSITIVE INTEGER
          // weights, computed as (num − pmod(num, W)) DIV W so the
          // floor stays exact even for negative raw "none" scores
          // (DuckDB // floors, Spark DIV truncates — pmod realigns
          // them; W > 0 always). A leg that did not score a document
          // contributes 0 with its weight still in the denominator
          // (Mongo's treatment of missing documents). Output
          // {_id, score} ordered by (score desc, _id asc);
          // scoreDetails adds flat <name>_norm columns (null when the
          // leg did not score the document; Mongo nests these under
          // scoreDetails metadata).
          require(cur eq df,
            "$scoreFusion must be the first pipeline stage (Mongo)")
          val sfAllowed = Set("input", "combination", "scoreDetails")
          spec.properties().asScala.foreach(e => require(
            sfAllowed(e.getKey),
            s"unsupported $$scoreFusion option (scope: " +
              s"${sfAllowed.toSeq.sorted.mkString("/")}): ${e.getKey}"))
          val sfInput = spec.get("input")
          require(sfInput != null && sfInput.isObject,
            s"$$scoreFusion needs input {pipelines, normalization}: " +
              s"$spec")
          sfInput.properties().asScala.foreach(e => require(
            e.getKey == "pipelines" || e.getKey == "normalization",
            s"unsupported $$scoreFusion input option: ${e.getKey}"))
          val sfPipes = sfInput.get("pipelines")
          require(sfPipes != null && sfPipes.isObject &&
            sfPipes.properties().size() >= 2,
            s"$$scoreFusion needs input.pipelines with >= 2 named " +
              s"pipelines: $spec")
          val sfNorm = Option(sfInput.get("normalization"))
            .map(_.asText()).getOrElse(throw new
              IllegalArgumentException("$scoreFusion requires " +
                "input.normalization (minMaxScaler | sigmoid | none)"))
          require(sfNorm == "minMaxScaler" || sfNorm == "none" ||
            sfNorm == "sigmoid",
            s"unsupported $$scoreFusion normalization '$sfNorm' " +
              "(minMaxScaler | sigmoid | none)")
          Option(spec.get("combination")).foreach { c =>
            c.properties().asScala.foreach(e => require(
              e.getKey == "weights" || e.getKey == "method",
              s"unsupported $$scoreFusion combination option " +
                s"(weights/method): ${e.getKey}"))
            Option(c.get("method")).foreach(m => require(
              m.asText() == "avg",
              s"unsupported $$scoreFusion combination.method " +
                s"'${m.asText()}' (avg only; 'expression' would " +
                "evaluate float arithmetic outside the oracle hash)"))
          }
          val sfWeightsN = Option(spec.get("combination"))
            .flatMap(c => Option(c.get("weights"))).orNull
          val sfDetails =
            Option(spec.get("scoreDetails")).exists(_.asBoolean())
          val sfLegs = sfPipes.properties().asScala.toSeq.map { e =>
            val name = e.getKey
            require(name.matches("[A-Za-z0-9_]+"),
              s"$$scoreFusion pipeline names must be " +
                s"[A-Za-z0-9_]+: $name")
            val w = Option(sfWeightsN)
              .flatMap(wn => Option(wn.get(name)))
              .map { n =>
                require(n.isIntegralNumber && n.asLong() > 0,
                  "$scoreFusion weights must be positive integers " +
                    s"(exact fusion scores): $name -> $n")
                n.asLong()
              }.getOrElse(1L)
            val scored = aggregateImpl(df, metaCol, e.getValue.toString,
              lookup, collation, rankMode = true)
            require(scored.columns.contains("_id"),
              s"$$scoreFusion input pipeline '$name' must $$project " +
                "a real _id column (scored outputs fuse by _id)")
            require(scored.columns.contains("_score"),
              s"$$scoreFusion input pipeline '$name' must $$project " +
                "a real integral _score column (this engine's scored-" +
                "pipeline analogue — no $search score metadata here)")
            require(Seq(org.apache.spark.sql.types.LongType,
              org.apache.spark.sql.types.IntegerType)
                .contains(scored.schema("_score").dataType),
              s"$$scoreFusion _score in pipeline '$name' must be " +
                s"integral (exact fusion scores), got " +
                s"${scored.schema("_score").dataType.simpleString}")
            // normalize over the leg's $limit-bounded list: the
            // min/max window is one partition over k rows by
            // construction, never corpus-sized
            val normed = scored
              .select(col("_id"), col("_score").cast("long").as("__s"))
              .withColumn("__mn",
                min(col("__s")).over(Window.partitionBy()))
              .withColumn("__mx",
                max(col("__s")).over(Window.partitionBy()))
              .select(col("_id"), (sfNorm match {
                case "minMaxScaler" => expr(
                  s"CASE WHEN __mx = __mn THEN CAST($ScoreNormScale " +
                    "AS BIGINT) ELSE ((__s - __mn) * " +
                    s"$ScoreNormScale) DIV (__mx - __mn) END")
                // sigmoid (r16): the baked 41-value table — integral
                // scores, saturation beyond ±20 exact at this scale,
                // identical literals on both engines
                case "sigmoid" => element_at(
                  typedLit(SigmoidTable),
                  (greatest(lit(-20L), least(lit(20L), col("__s")))
                    + lit(21L)).cast("int"))
                case _ => col("__s")
              }).as(s"__sf_$name"))
            (name, w, normed)
          }
          val sfFused = sfLegs.map(_._3)
            .reduce((a, b) => a.join(b, Seq("_id"), "full_outer"))
          val sfWSum = sfLegs.map(_._2).sum
          val sfNum = sfLegs.map { case (name, w, _) =>
            coalesce(col(s"__sf_$name") * w, lit(0L))
          }.reduce(_ + _)
          cur = sfLegs.foldLeft(sfFused
            .withColumn("__sf_num", sfNum)
            .withColumn("score", expr(
              s"(__sf_num - pmod(__sf_num, $sfWSum)) DIV $sfWSum"))
            .drop("__sf_num")) {
            case (c, (name, _, _)) =>
              if (sfDetails)
                c.withColumnRenamed(s"__sf_$name", s"${name}_norm")
              else c.drop(s"__sf_$name")
          }.orderBy(col("score").desc, col("_id").asc)
          grouped = true

        case "$geoNear" =>
          // Mongo's $geoNear, on this engine's PLANAR INTEGER grid (the
          // graft.operators.Geo contract): the metadata `key` field is
          // an integer [x, y] point, `near` is [qx, qy] (legacy pair or
          // GeoJSON Point), and `distanceField` receives the EXACT
          // integer dist² (no floating trig under the hash — a
          // production swap to projected meters/haversine changes only
          // this expression). maxDistance (meters) filters as a
          // bounding box first, then the exact circle dist² ≤ R² —
          // the same box→refine shape as Geo.geoNear. `query` filters
          // like $match. Documents without a valid point are excluded
          // (Mongo's behavior for missing geo fields). spherical: true
          // switches the metric to [[MqlFilter.sphereDist2]] — points
          // are [lon, lat] integer MICRODEGREES, distance is the
          // antimeridian-wrapped latitude-scaled integer surrogate,
          // and the prefilter is the LATITUDE band only (a longitude
          // band is wrap-unsafe and pole-degenerate; latitude alone
          // buys the row reduction). Float coordinates stay loud.
          require(cur eq df,
            "$geoNear must be the first pipeline stage (Mongo)")
          require(spec.isObject, s"$$geoNear needs options: $spec")
          val geoAllowed = Set("near", "key", "distanceField",
            "maxDistance", "query", "spherical")
          spec.properties().asScala.foreach(e =>
            require(geoAllowed(e.getKey),
              s"unsupported $$geoNear option (scope: " +
                s"${geoAllowed.toSeq.sorted.mkString("/")}): ${e.getKey}"))
          val spherical =
            Option(spec.get("spherical")).exists(_.asBoolean())
          val near0 = spec.get("near")
          require(near0 != null, "$geoNear requires near")
          val near =
            if (near0.isObject) {
              require(Option(near0.get("type"))
                .exists(_.asText() == "Point") &&
                near0.get("coordinates") != null,
                s"$$geoNear GeoJSON near must be a Point: $near0")
              near0.get("coordinates")
            } else near0
          require(near.isArray && near.size() == 2 &&
            near.get(0).isIntegralNumber && near.get(1).isIntegralNumber,
            "$geoNear near must be [x, y] integers on the planar " +
              s"grid (GeoJSON Point accepted): $near0")
          val (qx, qy) = (near.get(0).asLong(), near.get(1).asLong())
          val geoKey = Option(spec.get("key")).map(_.asText()).getOrElse(
            throw new IllegalArgumentException(
              "$geoNear requires key (the [x, y] metadata field)"))
          val distF = Option(spec.get("distanceField")).map(_.asText())
            .getOrElse(throw new IllegalArgumentException(
              "$geoNear requires distanceField"))
          val loc = from_json(get_json_object(meta, s"$$.$geoKey"),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType))
          val px = element_at(loc, 1)
          val py = element_at(loc, 2)
          // query filter first (row reduction before any arithmetic)
          Option(spec.get("query")).foreach { q =>
            val typed = MqlFilter.TypedResolver(
              cur.schema.fields.map(f => f.name -> col(f.name)).toMap,
              cur.schema.fields.map(f => f.name -> f.dataType).toMap)
            cur = cur.filter(MqlFilter.toColumn(q.toString,
              new HybridResolver(cur.columns.toSet, typed,
                MqlFilter.JsonResolver(meta))))
          }
          cur = cur.filter(px.isNotNull && py.isNotNull)
          Option(spec.get("maxDistance")).foreach { d0 =>
            require(d0.isIntegralNumber && d0.asLong() >= 0,
              s"$$geoNear maxDistance must be a non-negative integer " +
                s"(grid units): $d0")
            val d = d0.asLong()
            cur =
              if (spherical) cur.filter(py.between(qy - d, qy + d))
              else cur.filter(px.between(qx - d, qx + d) &&
                py.between(qy - d, qy + d))
          }
          cur = cur.withColumn(distF,
            if (spherical) MqlFilter.sphereDist2(px, py, qx, qy)
            else (px - qx) * (px - qx) + (py - qy) * (py - qy))
          Option(spec.get("maxDistance")).foreach { d0 =>
            val d = d0.asLong()
            cur = cur.filter(col(distF) <= d * d)
          }
          cur = cur.orderBy(col(distF).asc)
          if (!grouped) sortKeys = Seq((col(distF), false))

        case "$vectorSearch" =>
          // Atlas's $vectorSearch, on this engine's EXACT top-k path
          // (r17): `path` is a numeric-array metadata field,
          // `queryVector` a numeric literal array, and the score is
          // Atlas's documented normalization of the similarity,
          // INTEGERIZED to micros (the cosµ stance: Atlas's float
          // score is index-internal; the SURFACE — score projection
          // via $meta, ordering, limit — is the parity provided,
          // reproducible under the oracle). `exact: true` is REQUIRED:
          // an ANN path's candidate set depends on index internals no
          // oracle can replay; exact top-k is its recall-1 superset
          // (the HNSW adjudication stance). `filter` is a PRE-filter
          // (Atlas semantics). Engine extensions, both loud-by-absence
          // because Atlas's stage cannot express them: `similarity`
          // (cosine|euclidean|dotProduct — Atlas configures it in the
          // index DEFINITION, which doesn't exist here) and
          // `tieBreakField` (a numeric field totalizing equal-score
          // selection — Atlas leaves tie order unspecified; a
          // hash-gated engine cannot). Selection compiles to
          // TakeOrderedAndProject (per-partition heaps, limit rows to
          // the driver — never a global sort).
          require(cur eq df,
            "$vectorSearch must be the first pipeline stage (Atlas)")
          require(spec.isObject, s"$$vectorSearch needs options: $spec")
          val vsAllowed = Set("index", "path", "queryVector", "limit",
            "numCandidates", "exact", "filter", "similarity",
            "tieBreakField")
          spec.properties().asScala.foreach(e =>
            require(vsAllowed(e.getKey),
              s"unsupported $$vectorSearch option (scope: " +
                s"${vsAllowed.toSeq.sorted.mkString("/")}): ${e.getKey}"))
          require(Option(spec.get("exact")).exists(n =>
            n.isBoolean && n.asBoolean()),
            "$vectorSearch needs exact: true — an approximate path's " +
              "candidate set depends on index internals no oracle can " +
              "replay; exact top-k is its recall-1 superset")
          val qvN = spec.get("queryVector")
          require(qvN != null && qvN.isArray && qvN.size() > 0 &&
            qvN.elements().asScala.forall(_.isNumber),
            s"$$vectorSearch queryVector must be a numeric array")
          val qv = (0 until qvN.size()).map(i => qvN.get(i).asDouble())
          val vsPath = Option(spec.get("path")).map(_.asText())
            .getOrElse(throw new IllegalArgumentException(
              "$vectorSearch requires path"))
          val vsLimit = Option(spec.get("limit"))
            .filter(n => n.isIntegralNumber && n.asLong() > 0)
            .map(_.asInt()).getOrElse(
              throw new IllegalArgumentException(
                "$vectorSearch requires a positive integer limit"))
          Option(spec.get("numCandidates")).foreach(n => require(
            n.isIntegralNumber && n.asLong() >= vsLimit,
            s"$$vectorSearch numCandidates must be >= limit: $n"))
          val vsSim = Option(spec.get("similarity")).map(_.asText())
            .getOrElse(throw new IllegalArgumentException(
              "$vectorSearch requires similarity (cosine|euclidean|" +
                "dotProduct) — Atlas reads it from the index " +
                "definition; this engine takes it in the stage"))
          val tieF = Option(spec.get("tieBreakField")).map(_.asText())
            .getOrElse(throw new IllegalArgumentException(
              "$vectorSearch requires tieBreakField (a numeric field " +
                "totalizing equal-score selection — Atlas leaves tie " +
                "order unspecified; a deterministic engine cannot)"))
          // pre-filter first (Atlas's filter is a PRE-filter)
          Option(spec.get("filter")).foreach { q =>
            val typed = MqlFilter.TypedResolver(
              cur.schema.fields.map(f => f.name -> col(f.name)).toMap,
              cur.schema.fields.map(f => f.name -> f.dataType).toMap)
            cur = cur.filter(MqlFilter.toColumn(q.toString,
              new HybridResolver(cur.columns.toSet, typed,
                MqlFilter.JsonResolver(meta))))
          }
          // Parse the path vector ONCE into a helper column (r18): the
          // composed form re-evaluated from_json(get_json_object(...))
          // at every reference — the size filter plus the score's HOF
          // folds re-parsed the 64-double JSON ~6x per row, all
          // interpreted because the lambda folds are CodegenFallback.
          // One codegen'd Project parses per row; the native vector
          // kernels (VectorFunctions) keep the whole score codegen'd
          // with the SAME left-to-right double accumulation as the
          // zip_with/aggregate fold they replace (bit-identical).
          val vCol = s"__graft_vsvec_${helperCols.size}"
          helperCols += vCol
          cur = cur.withColumn(vCol,
            from_json(get_json_object(meta, s"$$.$vsPath"),
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType)))
          val vec = col(vCol)
          // docs without a dimension-matching vector are skipped
          // (Atlas's behavior for missing/invalid path values)
          cur = cur.filter(vec.isNotNull && size(vec) === qv.size)
          val qvL = typedLit(qv)
          import graft.functions.VectorFunctions.{dot => vdot, l2Sq}
          val vsScoreµ: Column = vsSim match {
            case "cosine" =>
              // Atlas: (1 + cos) / 2 — the engine's integer-micro
              // cosine (zero norm → 0, the sqlCosMu contract), then
              // exact integer halving (the sum is ≤ 2e6, exact in
              // double; both engines' halving is a floor on a
              // non-negative value). The query-side norm is a driver
              // constant: Scala's left-fold sum of squares equals the
              // folded aggregate over the same literals.
              val qNorm = math.sqrt(qv.foldLeft(0.0)((a, x) => a + x * x))
              val nrm = sqrt(vdot(vec, vec)) * lit(qNorm)
              val cosmu = when(nrm === 0.0, lit(0L)).otherwise(
                round(vdot(vec, qvL) / nrm * 1000000.0).cast("long"))
              floor((lit(1000000L) + cosmu) / lit(2.0)).cast("long")
            case "euclidean" =>
              // Atlas: 1 / (1 + d²), in micros
              val d2 = l2Sq(vec, qvL)
              round(lit(1000000.0) / (lit(1.0) + d2)).cast("long")
            case "dotProduct" =>
              // Atlas: (1 + dot) / 2, in micros (Atlas requires
              // normalized vectors for this metric; the arithmetic
              // holds either way)
              round((lit(1.0) + vdot(vec, qvL)) / lit(2.0)
                * lit(1000000.0)).cast("long")
            case other => throw new IllegalArgumentException(
              s"unsupported $$vectorSearch similarity '$other' " +
                "(cosine|euclidean|dotProduct)")
          }
          val scCol = s"__graft_vs_${helperCols.size}"
          helperCols += scCol
          cur = cur.withColumn(scCol, vsScoreµ)
          // r19 (VERDICT item 5): the tie-break view's type-bracketing
          // CASE references the parsed document 3x — bind it to ONE
          // materialized try_parse_json helper (the stageDocResolver
          // device) instead of re-parsing per reference. CollapseProject
          // keeps the non-cheap alias materialized (3 references).
          val tkDoc = s"__graft_vsdoc_${helperCols.size}"
          helperCols += tkDoc
          cur = cur.withColumn(tkDoc, try_parse_json(meta))
          val tkR = MqlFilter.JsonResolver(meta)
          tkR.parsed = col(tkDoc)
          val tkCol = s"__graft_vstk_${helperCols.size}"
          helperCols += tkCol
          cur = cur.withColumn(tkCol, tkR.num(tieF))
          cur = cur.orderBy(col(scCol).desc, col(tkCol).asc)
            .limit(vsLimit)
          vsScore = Some(scCol)
          limited = true
          if (!grouped)
            sortKeys = Seq((col(scCol), true), (col(tkCol), false))

        case "$out" =>
          // Mongo's REPLACE-the-collection output stage: the pipeline
          // result verbatim becomes the named collection's content
          // (unlike $merge there is no keying — the prior content is
          // irrelevant by definition). Library-over-parquet form: the
          // frame is written to `<graft.mql.out_dir>/<name>` (overwrite)
          // and the pipeline continues from the READBACK, so both the
          // sink write and the source read sit under whatever gate
          // consumes the result. Real (non-metadata) columns only —
          // $out after shaping, the Mongo position for it.
          require(spec.isTextual && spec.asText().nonEmpty,
            s"$$out needs a collection name: $spec")
          val outRoot = df.sparkSession.conf
            .getOption("graft.mql.out_dir")
            .getOrElse(throw new IllegalArgumentException(
              "$out requires conf graft.mql.out_dir (the scratch root " +
                "the collection is materialized under)"))
          val outPath = s"$outRoot/${spec.asText()}"
          cur.write.mode("overwrite").parquet(outPath)
          // full documents persist (any metadata JSON column included,
          // as a plain string — it round-trips), so later stages and
          // the returned frame read entirely from storage
          cur = df.sparkSession.read.parquet(outPath)

        case "$count" =>
          cur = cur.agg(count(lit(1)).as(spec.asText()))
            .filter(col(spec.asText()) > 0) // empty input -> no document
          grouped = true

        case "$unionWith" =>
          // {"$unionWith": "coll"} or {"$unionWith": {coll, pipeline}}:
          // concatenate the foreign collection's documents (optionally
          // pre-shaped by a sub-pipeline) onto the stream — Mongo's
          // multi-collection union. Column alignment is by NAME with
          // missing columns null-filled (Mongo's absent-field shape).
          // The current metadata root must be a column the foreign
          // frame also carries (collections share the canonical layout)
          // — a rebound root (post-exclusion helper) has no foreign
          // counterpart and reads null for foreign rows.
          require(!grouped, "$unionWith after $group unsupported")
          val (collName, subPipe) =
            if (spec.isTextual) (spec.asText(), None)
            else {
              require(spec.isObject && spec.get("coll") != null,
                s"$$unionWith needs a collection name or {coll, " +
                  s"pipeline}, got: $spec")
              (spec.get("coll").asText(),
                Option(spec.get("pipeline")).map(_.toString))
            }
          val (odf, ometa) = lookup(collName)
          val other = subPipe.fold(odf)(p =>
            aggregate(odf, ometa, p, lookup))
          cur = cur.unionByName(other, allowMissingColumns = true)

        case "$redact" =>
          // Mongo's access-control stage: the expression evaluates per
          // DOCUMENT to $$KEEP (emit), $$PRUNE (drop), or $$DESCEND
          // (keep this level's scalar fields and RE-EVALUATE the
          // expression at each embedded subdocument). This engine
          // supports ONE nesting level of DESCEND (r13): the document
          // round-trips through a map<string,variant> view and
          // map_filter drops embedded-OBJECT fields whose re-rooted
          // verdict is PRUNE — field order preserved, scalars kept,
          // the Mongo ACL recursion for the flat-with-embedded-docs
          // shape. A level-2 DESCEND verdict and arrays of embedded
          // documents stay LOUD (an access-control operator must
          // never quietly widen visibility). The sentinels are
          // rewritten to plain string literals so the whole spec runs
          // through the standard computed-expression machinery
          // ($cond/$switch/comparisons/boolean ops), and a branch
          // value that is NOT a sentinel raises PER ROW (Mongo errors
          // the aggregation the same way — a typo'd verdict must not
          // silently drop or keep).
          require(!grouped, "$redact after $group unsupported")
          var hasDescend = false
          def rewriteSentinels(n: JsonNode): JsonNode =
            if (n.isTextual) n.asText() match {
              case "$$KEEP" =>
                com.fasterxml.jackson.databind.node.TextNode
                  .valueOf("KEEP")
              case "$$PRUNE" =>
                com.fasterxml.jackson.databind.node.TextNode
                  .valueOf("PRUNE")
              case "$$DESCEND" =>
                hasDescend = true
                com.fasterxml.jackson.databind.node.TextNode
                  .valueOf("DESCEND")
              case _ => n
            }
            else if (n.isObject) {
              val o = mapper.createObjectNode()
              n.properties().asScala.foreach(e =>
                o.set[JsonNode](e.getKey, rewriteSentinels(e.getValue)))
              o
            } else if (n.isArray) {
              val a = mapper.createArrayNode()
              n.elements().asScala.foreach(e => a.add(rewriteSentinels(e)))
              a
            } else n
          val rewritten = rewriteSentinels(spec)
          val verdict = computeExpr(rewritten, meta, cur)
          def verdictErr = raise_error(concat(
            lit("$redact must evaluate to $$KEEP or $$PRUNE" +
              (if (hasDescend) " or $$DESCEND" else "") + ", got: "),
            coalesce(verdict.cast("string"), lit("null"))))
            .cast("boolean")
          if (!hasDescend)
            cur = cur.filter(
              when(verdict === "KEEP", lit(true))
                .when(verdict === "PRUNE", lit(false))
                .otherwise(verdictErr))
          else if (RedactWalk.interpretable(rewritten) &&
              cur.sparkSession.conf
                .get("graft.redact.force_unroll", "false") != "true") {
            // r15 scale path: the verdict is inside RedactWalk's
            // interpreter grammar (the canonical ACL shape), so the
            // whole recursion runs as ONE jackson walk per row — O(1)
            // plan size, depth a runtime parameter (cap 64, loud)
            // instead of the unrolled path's plan-size-bound depth 2.
            // Semantics parity is locked by RedactWalkSpec's
            // cross-implementation property test.
            val rcol = s"__graft_redact_${helperCols.size}"
            helperCols += rcol
            cur = cur.withColumn(rcol,
                RedactWalk.redactOnce(meta,
                  mapper.writeValueAsString(rewritten)))
              .filter(col(rcol).isNotNull)
            meta = col(rcol)
          } else {
            // DESCEND rewrite, bounded depth (r14 — r13 supported one
            // level, objects only). The recursion is unrolled at PLAN
            // time to RedactMaxDepth levels (the fixed-rounds device):
            // each level re-roots the verdict expression at the
            // subdocument / array element and reassembles the JSON
            // text field-by-field (manual reassembly because a kept
            // field keeps its variant VERBATIM while a descended one
            // is REPLACED by its rewritten text — map_filter can drop
            // but never substitute). Arrays of embedded documents get
            // Mongo's per-element treatment: each object element is
            // re-evaluated (PRUNE removes the element), non-object
            // elements pass through. Beyond RedactMaxDepth the verdict
            // raises PER ROW — an ACL operator must never silently
            // widen visibility.
            import org.apache.spark.sql.types.{ArrayType, MapType,
              StringType, VariantType}
            // value-text of one field/element given its verdict; null
            // text = drop. `leafKeep`: DESCEND on a value with no
            // nested objects is Mongo's KEEP (nothing to recurse into).
            def jsonKey(k: Column): Column = concat(lit("\""),
              regexp_replace(
                regexp_replace(k, lit("\\\\"), lit("\\\\\\\\")),
                lit("\""), lit("\\\\\"")),
              lit("\":"))
            def cleanDoc(docJson: Column, level: Int): Column = {
              val mv = from_json(docJson, MapType(StringType, VariantType))
              val frags = transform(map_entries(mv), e => {
                val k = e.getField("key")
                val v = e.getField("value")
                concat(jsonKey(k), valueText(v, level, RedactMaxArrayDepth))
              })
              concat(lit("{"),
                concat_ws(",", filter(frags, f => f.isNotNull)),
                lit("}"))
            }
            // the rewritten text of one variant VALUE at `level`, or
            // null to drop the enclosing field/element. `arrBudget`
            // bounds ARRAY nesting structurally (the plan is built by
            // Scala recursion, so every branch must terminate at plan
            // time): arrays-of-arrays beyond RedactMaxArrayDepth with
            // objects inside raise per row rather than pass unredacted.
            def valueText(v: Column, level: Int, arrBudget: Int): Column = {
              val sch = schema_of_variant(v)
              // "leaf" must mean PROVABLY no nested documents: a mixed
              // array inside the subdoc reports ARRAY<VARIANT> with no
              // nested OBJECT<, so a bare second-OBJECT< test would
              // treat {a:[1,{..}]} as a leaf and keep the embedded
              // object verbatim — the exact silent-visibility-widening
              // arrText's mayHideObjects guard exists to prevent. Any
              // VARIANT in the schema routes through cleanDoc/arrText.
              val isLeafObj = locate("OBJECT<", sch, 2) === 0 &&
                !sch.contains("VARIANT")
              def objText: Column = {
                val sv = computeExpr(rewritten, to_json(v), cur)
                val descended: Column =
                  if (level < RedactMaxDepth) cleanDoc(to_json(v), level + 1)
                  else raise_error(lit("$redact $$DESCEND exceeds the " +
                    s"supported nesting depth $RedactMaxDepth — a " +
                    "DESCEND verdict this deep on a subdocument that " +
                    "itself nests objects is loud")).cast("string")
                when(sv === "KEEP", to_json(v))
                  .when(sv === "PRUNE", lit(null).cast("string"))
                  .when(sv === "DESCEND" && isLeafObj, to_json(v))
                  .when(sv === "DESCEND", descended)
                  .otherwise(raise_error(concat(
                    lit("$redact subdocument verdict must be " +
                      "$$KEEP/$$PRUNE/$$DESCEND, got: "),
                    coalesce(sv.cast("string"), lit("null"))))
                    .cast("string"))
              }
              // a mixed array reports ARRAY<VARIANT>, so any array that
              // MIGHT hide objects (OBJECT or VARIANT in its schema)
              // must go through per-element dispatch — falling through
              // verbatim would silently keep unredacted documents
              def mayHideObjects: Column =
                sch.contains("OBJECT") || sch.contains("VARIANT")
              def arrText: Column =
                if (arrBudget <= 0)
                  when(mayHideObjects,
                    raise_error(lit("$redact $$DESCEND: arrays nested " +
                      s"deeper than $RedactMaxArrayDepth with embedded " +
                      "documents are unsupported — loud, never " +
                      "unredacted")).cast("string"))
                    .otherwise(to_json(v))
                else {
                  val elems = from_json(to_json(v), ArrayType(VariantType))
                  val kept = filter(
                    transform(elems, el =>
                      valueText(el, level, arrBudget - 1)),
                    t => t.isNotNull)
                  concat(lit("["), concat_ws(",", kept), lit("]"))
                }
              when(sch.startsWith("OBJECT"), objText)
                .when(sch.startsWith("ARRAY"), arrText)
                .otherwise(to_json(v)) // scalar: keep
            }
            val cleaned = cleanDoc(meta, 1)
            // materialize the rewrite ONCE as a column: the unrolled
            // tree is large (every level embeds the verdict expression),
            // and referencing it from both the filter and the
            // downstream meta would double plan size and codegen time
            val rcol = s"__graft_redact_${helperCols.size}"
            helperCols += rcol
            cur = cur.withColumn(rcol,
                when(verdict === "DESCEND", cleaned).otherwise(meta))
              .filter(
                when(verdict === "KEEP", lit(true))
                  // force the cleaned document INSIDE the filter: the
                  // per-subdoc loud raises must fire even when no later
                  // stage reads the rewritten meta
                  .when(verdict === "DESCEND",
                    coalesce(length(col(rcol)) >= 0, lit(true)))
                  .when(verdict === "PRUNE", lit(false))
                  .otherwise(verdictErr))
            meta = col(rcol)
          }

        case "$sortByCount" =>
          // {$sortByCount: <expr>} ≡ $group{_id: expr, count: {$sum: 1}}
          // + $sort{count: -1}. Mongo leaves equal-count order
          // undefined; this engine breaks ties by _id ascending so the
          // stage is deterministic (documented divergence, same spirit
          // as the $addToSet canonical-order choice).
          require(!grouped, "$sortByCount after $group unsupported")
          cur = cur.groupBy(valueExpr(spec, meta, cur).as("_id"))
            .agg(count(lit(1)).as("count"))
            .orderBy(col("count").desc, col("_id").asc)
          grouped = true

        case "$bucket" =>
          // {groupBy: "$f", boundaries: [b0 < b1 < ...], default: d,
          //  output: {name: accum, ...}}: each row lands in the
          // half-open [b_i, b_{i+1}) bucket labeled by its LOWER bound
          // (Mongo's _id contract); out-of-range rows take the default
          // label, or — matching Mongo's error — fail the job via
          // raise_error when no default is given. NUMERIC boundaries
          // only (the overwhelmingly common form; string/date
          // boundaries fail loudly). Output documents sort by _id,
          // Mongo's documented stage order.
          require(!grouped, "$bucket after $group unsupported")
          val gbN = spec.get("groupBy")
          require(gbN != null && gbN.isTextual &&
            gbN.asText().startsWith("$"),
            s"$$bucket groupBy must be a \"$$field\" path: $spec")
          val bN = spec.get("boundaries")
          require(bN != null && bN.isArray && bN.size() >= 2 &&
            bN.elements().asScala.forall(_.isNumber),
            s"$$bucket needs >=2 NUMERIC ascending boundaries: $spec")
          val bs = bN.elements().asScala.toSeq.map(_.asDouble())
          require(bs.sliding(2).forall(p => p(0) < p(1)),
            s"$$bucket boundaries must be strictly ascending: $spec")
          // _id stays integral when every literal is (long column);
          // any fractional literal promotes the whole label space
          val integral = bN.elements().asScala.forall(_.isIntegralNumber)
          def idLit(d: Double): Column =
            if (integral) lit(d.toLong) else lit(d)
          val f = gbN.asText().drop(1)
          val v =
            if (cur.columns.contains(f)) col(f).cast("double")
            else MqlFilter.JsonResolver(meta).num(f)
          val defN = spec.get("default")
          require(defN == null || defN.isNumber,
            s"$$bucket default must be numeric here (label space is " +
              s"numeric): $spec")
          val fallback: Column =
            if (defN != null) {
              if (integral && defN.isIntegralNumber) lit(defN.asLong())
              else lit(defN.asDouble())
            } else raise_error(concat(
              lit("$bucket value outside boundaries with no default: "),
              v.cast("string")))
              .cast(if (integral) "long" else "double")
          val bucketId = bs.init.zip(bs.tail).foldLeft(
            when(lit(false), idLit(0))) { case (acc, (lo, hi)) =>
              acc.when(v >= lo && v < hi, idLit(lo)) }
            .otherwise(fallback)
          val outN = spec.get("output")
          val outs: Seq[Column] =
            if (outN == null) Seq(count(lit(1)).as("count"))
            else outN.properties().asScala.toSeq.map(e =>
              accumulator(e.getValue, meta, cur, sortKeys).as(e.getKey))
          cur = cur.groupBy(bucketId.as("_id"))
            .agg(outs.head, outs.tail: _*)
            .orderBy(col("_id").asc)
          grouped = true

        case "$setWindowFields" if {
          val o = spec.get("output")
          o != null && o.isObject && o.properties().asScala.exists(
            e => e.getValue.isObject && e.getValue.has("$expMovingAvg"))
        } =>
          // $expMovingAvg (r17): Mongo's N-form EMA, inherently
          // ORDER-RECURSIVE — every value depends on the whole prefix,
          // so no per-row window frame expresses it without O(n²)
          // work. Translation: pack each partition's rows into ONE
          // sorted array (sort keys lead the struct, so sort_array's
          // lexicographic order IS the sortBy order, ties totalized
          // by the remaining struct fields — deterministic), run the
          // scan as one O(n) native expression ([[graft.expr
          // .IntEmaScan]] — exact integer micros, the textScore/cosµ
          // integerization stance; the oracle replays the identical
          // recurrence as a recursive CTE), then zip + explode back.
          // One shuffle (the partition groupBy); partition size bounds
          // the packed row like every collect_list accumulator.
          // Brackets, all loud: the EMA must be the stage's ONLY
          // output (the stage restructures the frame); ascending
          // sortBy; integral input in |x| ≤ 1e6. The alpha form
          // (r18, lifting the r17 refusal) quantizes alpha to EXACT
          // parts-per-million — an alpha with more than 6 decimal
          // digits stays a loud refusal (the integerization stance:
          // the recurrence must replay bit-exactly under the oracle).
          val emaOutN = spec.get("output")
          require(emaOutN.properties().size() == 1,
            "$expMovingAvg must be the only output of its " +
              "$setWindowFields stage (the translation restructures " +
              "the frame) — split the stage")
          val emaOut = emaOutN.properties().asScala.head
          require(emaOut.getValue.properties().size() == 1,
            "$expMovingAvg takes no window option (Mongo contract)")
          val emaArg = emaOut.getValue.get("$expMovingAvg")
          require(emaArg.isObject && emaArg.get("input") != null,
            s"$$expMovingAvg needs {input, N} or {input, alpha}: " +
              s"$emaArg")
          emaArg.properties().asScala.foreach(e => require(
            Seq("input", "N", "alpha").contains(e.getKey),
            s"unsupported $$expMovingAvg option: ${e.getKey}"))
          require((emaArg.get("N") != null) !=
            (emaArg.get("alpha") != null),
            s"$$expMovingAvg takes exactly one of N or alpha " +
              s"(Mongo contract): $emaArg")
          // (numX, numS, den) of the integer-micro recurrence: the N
          // form is the exact fraction α = 2/(N+1); the alpha form is
          // the exact-ppm quantization A/10⁶
          val (emaNumX, emaNumS, emaDen) =
            Option(emaArg.get("N")) match {
              case Some(nn) =>
                require(nn.isIntegralNumber && nn.asLong() >= 1 &&
                  nn.asLong() <= 1000,
                  s"$$expMovingAvg N must be an integer in 1..1000: $nn")
                (2L, nn.asLong() - 1L, nn.asLong() + 1L)
              case None =>
                val an = emaArg.get("alpha")
                require(an.isNumber,
                  s"$$expMovingAvg alpha must be a number: $an")
                val alpha = an.asDouble()
                require(alpha > 0.0 && alpha < 1.0,
                  s"$$expMovingAvg alpha must be in (0, 1) " +
                    s"exclusive (Mongo contract): $alpha")
                val ppm = math.round(alpha * 1e6)
                require(math.abs(alpha * 1e6 - ppm) < 1e-6 &&
                  ppm >= 1 && ppm <= 999999,
                  s"$$expMovingAvg alpha must be exactly " +
                    s"representable in parts-per-million (at most 6 " +
                    s"decimal digits — the exact integer recurrence): " +
                    s"$alpha")
                (ppm, 1000000L - ppm, 1000000L)
            }
          val emaRes = Some(stageDocResolver())
          val emaPartCols: Seq[Column] =
            Option(spec.get("partitionBy")).toSeq
              .flatMap(partitionKeyCols(_, emaRes))
          val emaSortPairs: Seq[(Column, Boolean)] =
            Option(spec.get("sortBy")).toSeq
              .flatMap(_.properties().asScala.toSeq).flatMap { e =>
                val desc = e.getValue.asInt() < 0
                sortBases(e.getKey, cur, meta, shared = emaRes)
                  .map(b => (b, desc))
              }
          require(emaSortPairs.nonEmpty,
            "$expMovingAvg requires a sortBy in $setWindowFields")
          require(emaSortPairs.forall(p => !p._2),
            "$expMovingAvg supports ascending sortBy only (the " +
              "packed-array order is sort_array's ascending order)")
          val exd = valueExprWith(emaArg.get("input"), meta, cur, emaRes)
            .cast("double")
          val exChk = when(exd === exd.cast("long").cast("double"),
            exd.cast("long")).otherwise(raise_error(concat(
              lit("$expMovingAvg input must be integral (the exact " +
                "micro recurrence; fractional inputs are not in the " +
                "bracket): "), exd.cast("string"))).cast("long"))
          val emaName = emaOut.getKey
          // overwrite semantics: an output named like an existing
          // column replaces it — exclude it from the packed row, along
          // with stage-internal helper columns (the shared parse and
          // materialized keys are consumed before the pack; carrying
          // the parsed-variant column through the pack/explode would
          // shuffle the whole document per row for nothing)
          val keepCols = cur.columns
            .filterNot(c => c == emaName || helperCols.contains(c))
          val rowStruct = struct(keepCols.map(col): _*)
          val entry = struct((emaSortPairs.map(_._1).zipWithIndex.map {
              case (c, i) => c.as(s"__s$i") } :+
            exChk.as("__x") :+ rowStruct.as("__row")): _*)
          val pAliases = emaPartCols.zipWithIndex.map {
            case (c, i) => c.as(s"__p$i") }
          val packed = cur.select((pAliases :+ entry.as("__e")): _*)
            .groupBy(emaPartCols.indices.map(i => col(s"__p$i")): _*)
            .agg(sort_array(collect_list(col("__e"))).as("__rows"))
          import org.apache.spark.sql.graft.ColumnBridge.{
            column => bCol, expression => bExpr}
          val emaArr = bCol(graft.expr.IntEmaScan(
            bExpr(transform(col("__rows"), r => r.getField("__x"))),
            emaNumX, emaNumS, emaDen))
          cur = packed.withColumn("__ema", emaArr)
            .select(explode(arrays_zip(col("__rows"), col("__ema")))
              .as("__z"))
            .select(col("__z.__rows.__row.*") +:
              Seq(col("__z.__ema").as(emaName)): _*)
          grouped = false
          sortKeys = Nil

        case "$setWindowFields" =>
          // Mongo 5.0's window-function stage — the one MQL stage that
          // IS Spark's Window API: partitionBy/sortBy/output map 1:1 to
          // Window.partitionBy/orderBy/over, so the whole stage stays
          // inside the single Catalyst plan (one Window node; Spark
          // groups same-spec functions into one pass).
          //  - rank ops: $rank/$denseRank/$documentNumber (require
          //    sortBy, frameless — Spark's contract too)
          //  - accumulators: $sum/$avg/$min/$max/$count with optional
          //    {window: {documents: [lo, hi]}} bounds (lo/hi =
          //    "unbounded" | "current" | integer offset). Mongo's
          //    DEFAULT window is the whole partition — Spark's default
          //    frame with an orderBy is unbounded-preceding..current,
          //    so the frame is ALWAYS set explicitly.
          //  - $shift {output, by, default}: by > 0 → following row
          //    (lead), by < 0 → preceding (lag); requires sortBy.
          //  - {window: {range: [lo, hi]}} — VALUE-keyed frames over
          //    the single ascending numeric sortBy field (Mongo's
          //    contract), mapping to Spark's rangeBetween; peers are
          //    included by RANGE semantics in both engines. With
          //    "unit", the frame keys on the timestamp sortBy's
          //    epoch-micros with bounds scaled by the unit (the
          //    sliding time-lookback form).
          val outN = spec.get("output")
          require(outN != null && outN.isObject && !outN.isEmpty,
            s"$$setWindowFields needs a non-empty output document: $spec")
          // parse-once for the whole stage (r18): see stageDocResolver
          val wres = Some(stageDocResolver())
          val partCols: Seq[Column] = materializeKeys(
            Option(spec.get("partitionBy")).toSeq
              .flatMap(partitionKeyCols(_, wres)))
          val sortPairs0: Seq[(Column, Boolean)] =
            Option(spec.get("sortBy")).toSeq
              .flatMap(_.properties().asScala.toSeq).flatMap { e =>
                val desc = e.getValue.asInt() < 0
                sortBases(e.getKey, cur, meta, shared = wres)
                  .map(b => (b, desc))
              }
          val sortPairs = materializeKeys(sortPairs0.map(_._1))
            .zip(sortPairs0.map(_._2))
          val sortCols = sortPairs.map { case (b, desc) =>
            if (desc) b.desc else b.asc }
          import org.apache.spark.sql.expressions.Window
          val baseW = Window.partitionBy(partCols: _*)
          def orderedW(opName: String) = {
            require(sortCols.nonEmpty,
              s"$opName requires a sortBy in $$setWindowFields")
            baseW.orderBy(sortCols: _*)
          }
          def docBound(n: JsonNode, lower: Boolean): Long =
            if (n.isTextual) n.asText() match {
              case "unbounded" =>
                if (lower) Window.unboundedPreceding
                else Window.unboundedFollowing
              case "current" => Window.currentRow
              case other => throw new IllegalArgumentException(
                s"unsupported window bound: $other")
            } else {
              require(n.isIntegralNumber,
                s"documents bound must be integer/unbounded/current: $n")
              n.asLong()
            }
          // primary sortBy field — the x-axis of $derivative/$integral
          val sortFields: Seq[String] = Option(spec.get("sortBy")).toSeq
            .flatMap(_.properties().asScala.toSeq).map(_.getKey)
          def sortVal(wop: String): Column = {
            val sf = sortFields.headOption.getOrElse(
              throw new IllegalArgumentException(
                s"$wop requires a sortBy in $$setWindowFields"))
            require(cur.columns.contains(sf),
              s"$wop needs the primary sortBy field as a real numeric " +
                s"column: $sf")
            col(sf).cast("double")
          }
          // $integral's trapezoid references lag() — a window function
          // can't nest inside the outer sum's window, so traps
          // materialize as helper columns first and drop after
          val trapCols =
            scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
          val outCols = outN.properties().asScala.toSeq.map { out =>
            val opEntries = out.getValue.properties().asScala.toSeq
              .filterNot(_.getKey == "window")
            require(opEntries.length == 1,
              s"one window operator per output field: ${out.getValue}")
            val (wop, arg) = (opEntries.head.getKey, opEntries.head.getValue)
            def frame = Option(out.getValue.get("window")) match {
              case None => // Mongo default: the WHOLE partition
                baseW.orderBy(sortCols: _*).rowsBetween(
                  Window.unboundedPreceding, Window.unboundedFollowing)
              case Some(w) =>
                val docsN = w.get("documents")
                val rangeN = w.get("range")
                if (docsN != null) {
                  require(docsN.isArray && docsN.size == 2,
                    s"documents window needs [lo, hi]: $w")
                  orderedW(wop).rowsBetween(
                    docBound(docsN.get(0), lower = true),
                    docBound(docsN.get(1), lower = false))
                } else {
                  require(rangeN != null && rangeN.isArray &&
                    rangeN.size == 2,
                    s"window needs {documents: [lo, hi]} or " +
                      s"{range: [lo, hi]}: $w")
                  require(sortPairs.length == 1 && !sortPairs.head._2,
                    "range window requires exactly one ASCENDING " +
                      s"sortBy field: $spec")
                  Option(w.get("unit")) match {
                    case None =>
                      orderedW(wop).rangeBetween(
                        docBound(rangeN.get(0), lower = true),
                        docBound(rangeN.get(1), lower = false))
                    case Some(u) =>
                      // time-unit frames: the sortBy field must be a
                      // real timestamp column; the frame keys on its
                      // epoch-MICROS value (exact longs — no
                      // fractional-second drift) with bounds scaled
                      // by the unit. Inclusive both ends, matching
                      // Mongo and SQL RANGE.
                      val unitUs: Long = u.asText() match {
                        case "week" => 7L * 86400 * 1000000
                        case "day" => 86400L * 1000000
                        case "hour" => 3600L * 1000000
                        case "minute" => 60L * 1000000
                        case "second" => 1000000L
                        case "millisecond" => 1000L
                        case other => throw new IllegalArgumentException(
                          s"unsupported range-window unit: $other")
                      }
                      val sf = sortFields.head
                      require(cur.columns.contains(sf),
                        "time-unit range window needs the sortBy " +
                          s"field as a real timestamp column: $sf")
                      def scaled(n: JsonNode, lower: Boolean): Long = {
                        val b = docBound(n, lower)
                        if (b == Window.unboundedPreceding ||
                          b == Window.unboundedFollowing ||
                          b == Window.currentRow) b
                        else b * unitUs
                      }
                      Window.partitionBy(partCols: _*)
                        .orderBy(unix_micros(
                          col(sf).cast("timestamp")).asc)
                        .rangeBetween(
                          scaled(rangeN.get(0), lower = true),
                          scaled(rangeN.get(1), lower = false))
                  }
                }
            }
            lazy val operand: Column =
              if (arg.isNumber && wop == "$sum") {
                if (arg.isIntegralNumber) lit(arg.asLong())
                else lit(arg.asDouble())
              } else valueExprWith(arg, meta, cur, wres)
            val c: Column = wop match {
              case "$rank" => rank().over(orderedW(wop))
              case "$denseRank" => dense_rank().over(orderedW(wop))
              case "$documentNumber" => row_number().over(orderedW(wop))
              case "$sum" => sum(operand).over(frame)
              case "$avg" => avg(operand).over(frame)
              case "$min" => min(operand).over(frame)
              case "$max" => max(operand).over(frame)
              case "$count" => count(lit(1)).over(frame)
              // Mongo 5.0 window $first/$last (r18): the frame's
              // first/last value in sortBy order — Spark's
              // first/last over the ordered frame; input materialized
              // (the interpreted-per-frame-add rule below)
              case "$first" | "$last" =>
                require(sortCols.nonEmpty,
                  s"$wop requires a sortBy in $$setWindowFields")
                val Seq(v) = materializeKeys(Seq(operand))
                if (wop == "$first") first(v).over(frame)
                else last(v).over(frame)
              // window $push/$addToSet (r18): the frame's values in
              // frame order / as a sorted distinct set (the group
              // twins' determinism stance) — frame-sized buffers,
              // the bounded-frame caveat applies
              case "$push" =>
                require(sortCols.nonEmpty,
                  s"$wop requires a sortBy in $$setWindowFields")
                val Seq(v) = materializeKeys(Seq(operand))
                collect_list(v).over(frame)
              case "$addToSet" =>
                val Seq(v) = materializeKeys(Seq(operand))
                array_sort(collect_set(v).over(frame))
              // window $stdDevPop/$stdDevSamp (r18): the covariance
              // precedent — EXPLICIT MOMENT FORM over the frame
              // (sqrt((Σx² − (Σx)²/n)/denom)), not the stddev
              // built-ins whose Welford internals differ between
              // engines by ulps that flip a rounded value; integer
              // inputs make the window sums exact and the final
              // double expression evaluates in identical order on
              // both engines. greatest(…, 0) guards the tiny
              // negative a float cancellation can leave under sqrt.
              case "$stdDevPop" | "$stdDevSamp" =>
                val Seq(a) = materializeKeys(Seq(
                  valueExprWith(arg, meta, cur, wres)))
                val nn = sum(when(a.isNotNull, 1L).otherwise(0L))
                  .over(frame)
                val sa = sum(a).over(frame).cast("double")
                val saa = sum(a * a).over(frame).cast("double")
                val nD = nn.cast("double")
                val denom =
                  if (wop == "$stdDevPop") nD
                  else (nn - lit(1L)).cast("double")
                val minN = if (wop == "$stdDevPop") 1L else 2L
                when(nn >= minN,
                  sqrt(greatest((saa - sa * sa / nD) / denom,
                    lit(0.0))))
              // Mongo 5.2 window-scoped N-accumulators (r18): the
              // group twins' sorted-collect device over the FRAME —
              // collect_list as a window function (frame-sized
              // buffers, the same bounded-frame caveat as $push),
              // sort/slice per row. $minN/$maxN sort the VALUES;
              // $firstN/$lastN slice the frame's sortBy order
              // (collect_list over an ordered frame preserves row
              // order); $topN/$bottomN sort by their OWN uniform-
              // direction sortBy with the (key, value) struct
              // tie-break both engines agree on.
              //
              // The collect INPUT is MATERIALIZED as a real column
              // first (materializeKeys — the r11 sort-key device):
              // WindowExec evaluates aggregate inputs INTERPRETED,
              // once per frame ADD, and a sliding frame rebuilds its
              // buffer per row — a JSON-resolved input would re-parse
              // the document (frame length × outputs) times per row
              // (measured at sf1: 20.8 s for 50k rows; materialized:
              // one codegen'd parse per row in the Project below).
              case "$minN" | "$maxN" =>
                require(arg.isObject && arg.get("n") != null &&
                  arg.get("input") != null,
                  s"$wop needs {n, input}: $arg")
                val n = arg.get("n").asInt()
                require(n > 0, s"$wop.n must be positive")
                val Seq(v) = materializeKeys(Seq(
                  valueExprWith(arg.get("input"), meta, cur, wres)))
                slice(sort_array(collect_list(v).over(frame),
                  asc = wop == "$minN"), lit(1), lit(n))
              case "$firstN" | "$lastN" =>
                require(arg.isObject && arg.get("n") != null &&
                  arg.get("input") != null,
                  s"$wop needs {n, input}: $arg")
                val n = arg.get("n").asInt()
                require(n > 0, s"$wop.n must be positive")
                require(sortCols.nonEmpty,
                  s"$wop requires a sortBy in $$setWindowFields")
                val Seq(v) = materializeKeys(Seq(
                  valueExprWith(arg.get("input"), meta, cur, wres)))
                val arr = collect_list(v).over(frame)
                if (wop == "$firstN") slice(arr, lit(1), lit(n))
                else slice(arr,
                  greatest(size(arr) - (n - 1), lit(1)), lit(n))
              case "$topN" | "$bottomN" =>
                require(arg.isObject && arg.get("n") != null &&
                  arg.get("sortBy") != null && arg.get("output") != null,
                  s"$wop needs {n, sortBy, output}: $arg")
                val n = arg.get("n").asInt()
                require(n > 0, s"$wop.n must be positive")
                val outE = valueExprWith(arg.get("output"), meta, cur, wres)
                val pairs = arg.get("sortBy").properties().asScala.toSeq
                  .flatMap { f =>
                    require(f.getValue.isIntegralNumber &&
                      math.abs(f.getValue.asInt()) == 1,
                      s"$wop sortBy direction must be 1 or -1: " +
                        s"${f.getKey}: ${f.getValue}")
                    val desc = f.getValue.asInt() < 0
                    sortBases(f.getKey, cur, meta, shared = wres)
                      .map(b => (b, desc))
                  }
                require(pairs.nonEmpty, s"$wop.sortBy must be non-empty")
                val dirs = pairs.map(_._2).distinct
                require(dirs.size == 1, s"$wop requires a uniform-" +
                  "direction sortBy (no single sort_array key otherwise)")
                val k = if (pairs.size == 1) pairs.head._1
                  else struct(pairs.map(_._1): _*)
                val Seq(entry) = materializeKeys(Seq(
                  struct(k.as("k"), outE.as("v"))))
                val sorted = sort_array(
                  collect_list(entry).over(frame), asc = !dirs.head)
                val sliced =
                  if (wop == "$topN") slice(sorted, lit(1), lit(n))
                  else slice(sorted,
                    greatest(size(sorted) - (n - 1), lit(1)), lit(n))
                transform(sliced, x => x.getField("v"))
              case "$shift" =>
                val outE = arg.get("output")
                require(outE != null, s"$$shift needs output: $arg")
                val by = Option(arg.get("by")).map(_.asInt()).getOrElse(1)
                val base = valueExprWith(outE, meta, cur, wres)
                // out-of-partition rows take the default (Mongo's
                // contract) — lead/lag's literal default param, applied
                // only past the frame edge, not on null values
                val dflt: Any = Option(arg.get("default")).map { d =>
                  if (d.isIntegralNumber) d.asLong()
                  else if (d.isNumber) d.asDouble()
                  else d.asText()
                }.orNull
                val w = orderedW(wop)
                if (by >= 0) lead(base, by, dflt).over(w)
                else lag(base, -by, dflt).over(w)
              case "$median" | "$percentile" =>
                // Mongo 7.0 window ops. Mongo mandates method:
                // "approximate" (its t-digest); this engine computes the
                // EXACT interpolated percentile — a correctness superset
                // — and accepts the keyword. $percentile returns the
                // array shape Mongo documents (one value per requested
                // p, request order).
                val inputE = arg.get("input")
                require(inputE != null, s"$wop needs input: $arg")
                // Spark computes exact percentiles only over a bare
                // partition spec (no order/frame) — bounded frames are
                // loudly unsupported (Mongo's own default is the whole
                // partition too)
                require(out.getValue.get("window") == null,
                  s"$wop supports the whole-partition default window " +
                    s"only: ${out.getValue}")
                val v = valueExprWith(inputE, meta, cur, wres).cast("double")
                if (wop == "$median") median(v).over(baseW)
                else {
                  val pN = arg.get("p")
                  require(pN != null && pN.isArray && !pN.isEmpty &&
                    pN.elements().asScala.forall(n =>
                      n.isNumber && n.asDouble() >= 0 && n.asDouble() <= 1),
                    s"$$percentile needs p: [0..1 fractions]: $arg")
                  val ps = pN.elements().asScala.toSeq.map(_.asDouble())
                  percentile(v, typedLit(ps)).over(baseW)
                }
              case "$derivative" =>
                // Mongo's contract over ANY documents frame: rate of
                // change between the frame's first and last rows —
                // (last(input) − first(input)) / (last(x) − first(x)),
                // x = the primary sortBy value. Zero x-span (a one-row
                // frame, or tied sort values) → null in both engines.
                val inputE = arg.get("input")
                require(inputE != null, s"$$derivative needs input: $arg")
                val v = valueExprWith(inputE, meta, cur, wres).cast("double")
                val sv = sortVal(wop)
                val num = last(v).over(frame) - first(v).over(frame)
                val den = last(sv).over(frame) - first(sv).over(frame)
                when(den =!= 0, num / den)
              case "$integral" =>
                // trapezoid area over the frame's rows. Supported
                // frames: the whole-partition default or a running
                // ["unbounded", "current"] — per-row traps (computed
                // against the PREVIOUS row) sum cleanly there; an
                // interior lower bound would need the trap at the frame
                // edge re-based, which Mongo itself doesn't offer
                // beyond these shapes in common use. Loud otherwise.
                val inputE = arg.get("input")
                require(inputE != null, s"$$integral needs input: $arg")
                Option(out.getValue.get("window")).foreach { w =>
                  val d = w.get("documents")
                  require(d != null && d.isArray && d.size == 2 &&
                    d.get(0).isTextual && d.get(0).asText() == "unbounded" &&
                    d.get(1).isTextual && d.get(1).asText() == "current",
                    "$integral supports the default whole-partition " +
                      s"window or [unbounded, current] only, got: $w")
                }
                val v = valueExprWith(inputE, meta, cur, wres).cast("double")
                val sv = sortVal(wop)
                val w = orderedW(wop)
                val trap = when(lag(sv, 1).over(w).isNull, lit(0.0))
                  .otherwise((v + lag(v, 1).over(w)) / 2 *
                    (sv - lag(sv, 1).over(w)))
                val tmp = s"_swf_trap_${out.getKey}"
                trapCols += tmp -> trap
                sum(col(tmp)).over(frame)
              case "$covariancePop" | "$covarianceSamp" =>
                // Mongo 5.0 window covariance of two numeric
                // expressions over the frame, translated to the
                // EXPLICIT MOMENT FORM — (Σab − Σa·Σb/n) / n (or n−1)
                // over pairwise-non-null rows — instead of the covar
                // built-ins: the built-ins' internal update algorithms
                // (Welford merges) differ between engines by an ulp,
                // which flips a rounded gate value at a boundary
                // (measured: one row in 500 at 6 decimals). With the
                // moment form the window SUMS are exact for integral
                // inputs and the final double expression is evaluated
                // in the IDENTICAL operation order by both engines —
                // bit-deterministic. Double inputs make the sums
                // order-sensitive again (the float-aggregate stance:
                // callers round).
                require(arg.isArray && arg.size() == 2,
                  s"$wop needs [expr1, expr2]: $arg")
                val a = valueExprWith(arg.get(0), meta, cur, wres)
                val b = valueExprWith(arg.get(1), meta, cur, wres)
                val both = a.isNotNull && b.isNotNull
                val n = sum(when(both, 1L).otherwise(0L)).over(frame)
                val sa = sum(when(both, a)).over(frame).cast("double")
                val sb = sum(when(both, b)).over(frame).cast("double")
                val sab = sum(when(both, a * b)).over(frame)
                  .cast("double")
                val nD = n.cast("double")
                val denom =
                  if (wop == "$covariancePop") nD
                  else (n - lit(1L)).cast("double")
                val minN = if (wop == "$covariancePop") 1L else 2L
                when(n >= minN, (sab - sa * sb / nD) / denom)
              case other => throw new IllegalArgumentException(
                s"unsupported window operator: $other")
            }
            c.as(out.getKey)
          }
          cur = trapCols.foldLeft(cur) { case (d, (n, c)) =>
            d.withColumn(n, c) }
          // Mongo overwrite semantics: an output field named like an
          // existing column REPLACES it (all output expressions still
          // evaluate against the pre-stage document — select computes
          // over the input frame); appending instead would duplicate the
          // name and break later stage references with ambiguity errors
          val outNames = outN.properties().asScala.toSeq.map(_.getKey)
          val outByName = outNames.zip(outCols).toMap
          val kept = cur.columns.toSeq.map(n =>
            outByName.getOrElse(n, col(n)))
          val appended = outNames.filterNot(cur.columns.contains)
            .map(outByName)
          cur = cur.select(kept ++ appended: _*)
          cur = trapCols.foldLeft(cur) { case (d, (n, _)) => d.drop(n) }

        case "$fill" =>
          // Mongo 5.3's gap-filling stage. Two fill forms:
          //  - {value: <literal>}: constant fill → coalesce
          //  - {method: "locf"}: last observed carried forward → Spark's
          //    last(ignoreNulls) over an unbounded-preceding..current
          //    running frame (requires sortBy; leading nulls stay null
          //    in both Mongo and this translation)
          // "linear" interpolation is unsupported and fails loudly.
          // Fill targets must be REAL columns (the shaped frame), not
          // metadata JSON paths — filling inside a JSON document would
          // need a rewrite per row; shape the column out first.
          val foutN = spec.get("output")
          require(foutN != null && foutN.isObject && !foutN.isEmpty,
            s"$$fill needs a non-empty output document: $spec")
          val fres = Some(stageDocResolver())
          val fPartCols: Seq[Column] = Option(spec.get("partitionBy"))
            .toSeq.flatMap(partitionKeyCols(_, fres))
          val fSortCols: Seq[Column] = Option(spec.get("sortBy")).toSeq
            .flatMap(_.properties().asScala.toSeq).flatMap { e =>
              val desc = e.getValue.asInt() < 0
              sortBases(e.getKey, cur, meta, shared = fres)
                .map(b => if (desc) b.desc else b.asc)
            }
          import org.apache.spark.sql.expressions.Window
          for (out <- foutN.properties().asScala.toSeq) {
            val f = out.getKey
            require(cur.columns.contains(f),
              s"$$fill target must be a real column, got: $f " +
                s"(shape metadata fields into columns first)")
            val o = out.getValue
            (Option(o.get("value")), Option(o.get("method"))) match {
              case (Some(v), None) =>
                val fillV: Column =
                  if (v.isIntegralNumber) lit(v.asLong())
                  else if (v.isNumber) lit(v.asDouble())
                  else if (v.isTextual && v.asText().startsWith("$"))
                    valueExprWith(v, meta, cur, fres)
                  else if (v.isTextual) lit(v.asText())
                  else throw new IllegalArgumentException(
                    s"unsupported $$fill value: $v")
                cur = cur.withColumn(f, coalesce(col(f), fillV))
              case (None, Some(m)) if m.asText() == "locf" =>
                require(fSortCols.nonEmpty,
                  s"$$fill locf requires a sortBy to define document order")
                val w = Window.partitionBy(fPartCols: _*)
                  .orderBy(fSortCols: _*)
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                cur = cur.withColumn(f,
                  last(col(f), ignoreNulls = true).over(w))
              case (None, Some(m)) if m.asText() == "linear" =>
                // Mongo 5.3 linear interpolation, composed from the
                // resample_interp exact-integer time-weighted device:
                // bracket each null between its nearest non-null
                // neighbours along the sortBy axis (one backward + one
                // forward running-frame window — no self-join, no
                // driver pass) and interpolate
                //   (pv.y·(nv.x−x) + nv.y·(x−pv.x)) DIV (nv.x−pv.x).
                // INTEGRAL axis and target only: float interpolation
                // would put IEEE division in the oracle compare, so it
                // stays loud by contract (cast to a scaled-integer
                // column — cents/micros — first). Leading/trailing
                // nulls stay null (Mongo parity). Like Mongo, linear
                // requires exactly one ASCENDING numeric sortBy field.
                val sortEntries = spec.get("sortBy")
                  .properties().asScala.toSeq
                require(sortEntries.size == 1 &&
                  sortEntries.head.getValue.asInt() > 0,
                  s"$$fill linear requires exactly one ascending " +
                    s"sortBy field: $spec")
                val xName = sortEntries.head.getKey
                require(cur.columns.contains(xName),
                  s"$$fill linear sortBy must be a real column, got: " +
                    s"$xName (shape metadata fields into columns first)")
                def integral(n: String): Boolean =
                  cur.schema(n).dataType match {
                    case org.apache.spark.sql.types.ByteType |
                         org.apache.spark.sql.types.ShortType |
                         org.apache.spark.sql.types.IntegerType |
                         org.apache.spark.sql.types.LongType => true
                    case _ => false
                  }
                // a TIMESTAMP axis (r16 — Mongo's time-series fill)
                // interpolates over epoch-µs LONGS: still exact
                // integer arithmetic, so the oracle pins it unchanged
                val xIsTs = cur.schema(xName).dataType ==
                  org.apache.spark.sql.types.TimestampType
                require((integral(xName) || xIsTs) && integral(f),
                  s"$$fill linear supports integral-or-timestamp " +
                    s"sortBy and integral target columns only (exact " +
                    s"integer interpolation; scale floats to " +
                    s"cents/micros first): $xName -> $f")
                val back = Window.partitionBy(fPartCols: _*)
                  .orderBy(fSortCols: _*)
                  .rowsBetween(Window.unboundedPreceding,
                    Window.currentRow)
                // the NEXT observed neighbour as a running frame over
                // the REVERSED axis — never `first(...) over
                // (currentRow, unboundedFollowing)`: Spark evaluates
                // an UnboundedFollowing frame by rescanning the
                // remainder of the partition PER ROW (O(n²); the sf1
                // probe measured this stage at 30.8 s standalone vs
                // 0.93 at sf0.1), while running frames are
                // incremental. Equivalent on the total sortBy order
                // (the axis is the single ascending sortBy; the
                // current row is included in both formulations and
                // contributes only when non-null, where no fill
                // happens anyway).
                val fwdRev = Window.partitionBy(fPartCols: _*)
                  .orderBy(col(xName).desc)
                  .rowsBetween(Window.unboundedPreceding,
                    Window.currentRow)
                val xN = s"__fill_x_$f"
                val xCol = if (xIsTs) unix_micros(col(xName))
                  else col(xName).cast("long")
                val ob = when(col(f).isNotNull, struct(
                  col(xN).as("x"), col(f).cast("long").as("y")))
                val pvN = s"__fill_pv_$f"
                val nvN = s"__fill_nv_$f"
                cur = cur
                  .withColumn(xN, xCol)
                  .withColumn(pvN, last(ob, ignoreNulls = true).over(back))
                  .withColumn(nvN, last(ob, ignoreNulls = true).over(fwdRev))
                  .withColumn(f,
                    when(col(f).isNotNull, col(f).cast("long"))
                      .when(col(pvN).isNotNull && col(nvN).isNotNull,
                        // tied axis values can make the bracket
                        // degenerate (pv.x == nv.x): take the earlier
                        // neighbour deterministically, never divide by 0
                        when(col(nvN)("x") === col(pvN)("x"),
                          col(pvN)("y"))
                          .otherwise(expr(
                            s"(`$pvN`.y * (`$nvN`.x - `$xN`) + " +
                              s"`$nvN`.y * (`$xN` - `$pvN`.x)) DIV " +
                              s"(`$nvN`.x - `$pvN`.x)"))))
                  .drop(pvN, nvN, xN)
              case (None, Some(m)) =>
                throw new IllegalArgumentException(
                  s"unsupported $$fill method: ${m.asText()} " +
                    s"(locf and linear)")
              case _ => throw new IllegalArgumentException(
                s"$$fill output needs exactly one of value/method: $o")
            }
          }

        case "$densify" =>
          // Mongo 5.1's gap-GENERATING stage (the $fill twin): emit a
          // document for every missing step-multiple of `field` —
          // per-partition bounds ("partition"), global bounds ("full"),
          // or an explicit half-open [lo, hi). Spark-first shape:
          //   bounds agg (tiny: one row per partition) → explode
          //   sequence(lo, hi, step) → LEFT ANTI join against existing
          //   (field, partition) pairs → unionByName with null-filled
          //   other columns (Mongo's generated-document shape).
          // Everything is distributed — generated volume is
          // range/step per partition, never a driver loop. INTEGRAL
          // fields/steps only: a double grid accumulates float error
          // and the "is this value present" equality becomes
          // ill-defined (Mongo has the same hazard; we refuse loudly).
          // Date units are unsupported (no date densify fixture).
          val dF = spec.get("field")
          require(dF != null && dF.isTextual,
            s"$$densify needs a field name: $spec")
          val df0 = dF.asText()
          require(cur.columns.contains(df0),
            s"$$densify field must be a real column, got: $df0 " +
              s"(shape metadata fields into columns first)")
          val dPartFs: Seq[String] = Option(spec.get("partitionByFields"))
            .toSeq.flatMap(_.elements().asScala).map(_.asText())
          for (p <- dPartFs) require(cur.columns.contains(p),
            s"$$densify partitionByFields must be real columns, got: $p")
          val rangeN = spec.get("range")
          require(rangeN != null && rangeN.isObject,
            s"$$densify needs a range document: $spec")
          // unit (Mongo's calendar-step form): the field must be a
          // TIMESTAMP column; grid arithmetic runs on epoch-µs LONGS
          // (exact, both engines). FIXED-width units step the grid at
          // lo + k·width µs; CALENDAR units (month/quarter/year, r16)
          // step at dateAdd(lo, unit, k·step) — each point's month add
          // clamps from the ORIGINAL lo day-of-month (add_months(d,
          // k·m): Mongo's documented clamp and DuckDB's + INTERVAL
          // behavior, the bracket mql_date_add_cal already pins) with
          // time-of-day and sub-second µs riding unchanged.
          val unitName = Option(rangeN.get("unit")).map(_.asText())
          val unitMonthsOpt: Option[Int] = unitName.collect {
            case "month" => 1
            case "quarter" => 3
            case "year" => 12
          }
          val unitUsOpt: Option[Long] = unitName.collect {
            case "week" => 604800000000L
            case "day" => 86400000000L
            case "hour" => 3600000000L
            case "minute" => 60000000L
            case "second" => 1000000L
            case "millisecond" => 1000L
          }
          unitName.foreach(u => require(
            unitMonthsOpt.isDefined || unitUsOpt.isDefined,
            s"unsupported $$densify unit: $u (millisecond|second|" +
              "minute|hour|day|week|month|quarter|year)"))
          val dated = unitMonthsOpt.isDefined || unitUsOpt.isDefined
          val stepN = rangeN.get("step")
          require(stepN != null && stepN.isIntegralNumber &&
            stepN.asLong() > 0,
            s"$$densify step must be a positive integer: $rangeN")
          val step = stepN.asLong()
          import org.apache.spark.sql.types.{IntegerType, LongType,
            TimestampType}
          val fType = cur.schema(df0).dataType
          // with a unit the work frame carries the field as epoch-µs
          val dWork =
            if (dated) {
              require(fType == TimestampType,
                s"$$densify with unit needs a TIMESTAMP field, " +
                  s"got $fType for $df0")
              cur.withColumn(df0, unix_micros(col(df0)))
            } else {
              require(fType == LongType || fType == IntegerType,
                s"$$densify field must be integral, got $fType for $df0")
              cur
            }
          val dStep = unitUsOpt.map(_ * step).getOrElse(step)
          val gType: org.apache.spark.sql.types.DataType =
            if (dated) LongType else fType
          val boundsN = rangeN.get("bounds")
          val partCols = dPartFs.map(col)
          // one row per partition carrying its [lo, hi] grid bounds
          val bh: (DataFrame, Option[Long]) = boundsN match {
            case b if b != null && b.isTextual &&
                b.asText() == "partition" =>
              (dWork.groupBy(partCols: _*)
                .agg(min(col(df0)).as("_lo"), max(col(df0)).as("_hi")),
                None)
            case b if b != null && b.isTextual && b.asText() == "full" =>
              // global grid bounds, applied to EVERY partition
              val g = dWork.agg(min(col(df0)).as("_lo"),
                max(col(df0)).as("_hi"))
              val parts =
                if (dPartFs.isEmpty) g
                else dWork.select(partCols: _*).distinct().crossJoin(g)
              (parts, None)
            case b if b != null && b.isArray && b.size() == 2 &&
                b.get(0).isIntegralNumber && b.get(1).isIntegralNumber =>
              // explicit [lo, hi): every partition gets the grid, even
              // where it has no rows in range (Mongo's contract).
              // Integral bounds describe an integral field — a unit
              // would be a shape error, loud.
              require(!dated,
                "$densify integral explicit bounds cannot carry a " +
                  "range unit (use date-literal bounds)")
              val (lo, hi) = (b.get(0).asLong(), b.get(1).asLong())
              require(lo < hi, s"$$densify bounds must be [lo < hi): $b")
              val parts =
                if (dPartFs.isEmpty) dWork.select(lit(1).as("_one"))
                  .limit(1).select(lit(lo).as("_lo"), lit(hi).as("_hi"))
                else dWork.select(partCols: _*).distinct()
                  .withColumn("_lo", lit(lo)).withColumn("_hi", lit(hi))
              (parts, Some(hi))
            case b if b != null && b.isArray && b.size() == 2 &&
                b.get(0).isTextual && b.get(1).isTextual =>
              // explicit DATE-literal bounds (r16 — the last loud
              // $densify bracket): ISO local strings (date or
              // date-time, the engine's date convention) parsed
              // DRIVER-side to epoch-µs literals; the grid anchors at
              // lo exactly like the integral form — [lo, hi)
              // half-open, every partition gets the grid. Works for
              // fixed-width AND calendar units (the calendar branch
              // anchors its month arithmetic at _lo and the half-open
              // filter composes after generation).
              require(dated,
                "$densify date-literal bounds need a range unit")
              def usOf(t: String): Long = {
                // rethrow parse failures in the engine's loud
                // IllegalArgumentException shape (a bound carrying a
                // 'Z'/offset suffix or any non-ISO-local form must
                // state the contract, not escape as a raw
                // DateTimeParseException)
                val ldt =
                  try {
                    if (t.length == 10)
                      java.time.LocalDate.parse(t).atStartOfDay()
                    else java.time.LocalDateTime.parse(t)
                  } catch {
                    case e: java.time.format.DateTimeParseException =>
                      throw new IllegalArgumentException(
                        s"$$densify date bounds must be ISO LOCAL " +
                          "date or date-time strings (yyyy-MM-dd or " +
                          "yyyy-MM-dd'T'HH:mm:ss[.SSS], no zone/offset " +
                          s"suffix — the engine's date convention): '$t'",
                        e)
                  }
                val i = ldt.toInstant(java.time.ZoneOffset.UTC)
                i.getEpochSecond * 1000000L + i.getNano / 1000L
              }
              val (lo, hi) = (usOf(b.get(0).asText()),
                usOf(b.get(1).asText()))
              require(lo < hi, s"$$densify bounds must be [lo < hi): $b")
              val parts =
                if (dPartFs.isEmpty) dWork.select(lit(1).as("_one"))
                  .limit(1).select(lit(lo).as("_lo"), lit(hi).as("_hi"))
                else dWork.select(partCols: _*).distinct()
                  .withColumn("_lo", lit(lo)).withColumn("_hi", lit(hi))
              (parts, Some(hi))
            case other => throw new IllegalArgumentException(
              s"""$$densify bounds must be "partition", "full" or """ +
                s"[lo, hi]: $other")
          }
          val (boundsDf, hiOpen) = bh
          // explode can't nest inside a cast — generate, then cast the
          // grid value back to the field's own integral width
          val gen0 = unitMonthsOpt match {
            case Some(mPerU) =>
              // calendar grid (r16): enumerate k = 0..kMax (the month-
              // index span DIV months-per-step bounds it exactly —
              // add_months is monotone and the index difference counts
              // calendar months between the endpoints' months), place
              // each point with ONE add_months from lo, re-attach
              // time-of-day seconds and sub-second µs, keep points
              // ≤ hi (a clamped short month can land past a hi that
              // sits earlier in the same month)
              val mStep = mPerU * step
              def usSec(c: Column): Column =
                ((c - pmod(c, lit(1000000L))) / lit(1000000L)).cast("long")
              val loSec = usSec(col("_lo"))
              val usFrac = pmod(col("_lo"), lit(1000000L))
              val dLo = to_date(timestamp_seconds(loSec))
              val tod = loSec - unix_date(dLo).cast("long") * 86400L
              val dHi = to_date(timestamp_seconds(usSec(col("_hi"))))
              val kMax = greatest(lit(0L), MqlFilter.intDiv(
                ((year(dHi) - year(dLo)) * 12 +
                  (month(dHi) - month(dLo))).cast("long"), mStep))
              boundsDf
                .select(partCols ++ Seq(col("_hi"),
                  usFrac.as("_usf"), tod.as("_tod"), dLo.as("_dlo"),
                  explode(sequence(lit(0L), kMax)).as("_k")): _*)
                .select(partCols :+
                  (unix_date(add_months(col("_dlo"),
                      (col("_k") * mStep).cast("int"))).cast("long")
                    * 86400L * 1000000L + col("_tod") * 1000000L +
                    col("_usf")).as(df0) :+ col("_hi"): _*)
                .filter(col(df0) <= col("_hi"))
                .select(partCols :+ col(df0): _*)
            case None =>
              boundsDf.select(partCols :+
                  explode(sequence(col("_lo"), col("_hi"), lit(dStep)))
                    .as(df0): _*)
                .withColumn(df0, col(df0).cast(gType))
          }
          // sequence() is end-inclusive; explicit bounds are half-open
          val gen = hiOpen.fold(gen0)(hi => gen0.filter(col(df0) < hi))
          val missing = gen.join(
            dWork.select((dPartFs :+ df0).map(col): _*),
            dPartFs :+ df0, "left_anti")
          val densified =
            dWork.unionByName(missing, allowMissingColumns = true)
          // with a unit the µs work column converts back to TIMESTAMP
          cur = if (dated)
            densified.withColumn(df0, timestamp_micros(col(df0)))
          else densified

        case "$graphLookup" =>
          // Recursive graph traversal (Mongo 3.4): from each document's
          // startWith value, repeatedly match connectToField in `from`
          // and follow connectFromField, collecting every reached
          // document into the `as` array (optionally depth-tagged).
          // Spark has no recursion operator, so this is DISTRIBUTED BFS
          // by iterative joins — the dedup_clusters label-propagation
          // pattern: each round one equi-join frontier⋈from, results
          // localCheckpoint'ed so lineage doesn't nest. Two scale
          // devices: (1) traversal runs over DISTINCT start values, not
          // input rows — co-started documents share one walk, and the
          // result joins back by start value; (2) per-(start, value)
          // visited-set pruning = BFS min-depth semantics AND cycle
          // termination (Mongo's visited contract: each doc once, at
          // first encounter). Unbounded traversals are capped by
          // graft.graphlookup.max_depth (default 20) and fail LOUDLY if
          // the frontier is still live — a silent truncation would
          // misreport connectivity. connectTo/connectFrom/as must be
          // real columns on the `from` frame; null connect values never
          // match (Mongo: null≠null in the join).
          require(!grouped, "$graphLookup after $group unsupported")
          def glText(k: String): String = {
            val n = spec.get(k)
            require(n != null && n.isTextual,
              s"$$graphLookup needs textual $k: $spec")
            n.asText()
          }
          val glFrom = glText("from")
          val glCff = glText("connectFromField")
          val glCtf = glText("connectToField")
          val glAs = glText("as")
          val glStartN = spec.get("startWith")
          require(glStartN != null, s"$$graphLookup needs startWith: $spec")
          val glMaxDepth = Option(spec.get("maxDepth")).map { n =>
            require(n.isIntegralNumber && n.asInt() >= 0,
              s"maxDepth must be a non-negative integer: $n")
            n.asInt()
          }
          val glDepthF = Option(spec.get("depthField")).map(_.asText())
          val (glFromDf, _) = lookup(glFrom)
          for (c <- Seq(glCff, glCtf))
            require(glFromDf.columns.contains(c),
              s"$$graphLookup connect field must be a real column on " +
                s"$glFrom: $c")
          val fromCols = glFromDf.columns.toSeq
          val cap = glMaxDepth.getOrElse(cur.sparkSession.conf
            .get("graft.graphlookup.max_depth", "20").trim.toInt)

          val startCol = valueExpr(glStartN, meta, cur)
          var frontier = cur.select(startCol.as("_gl_start"))
            .filter(col("_gl_start").isNotNull).distinct()
            .withColumn("_gl_val", col("_gl_start"))
            .localCheckpoint(true)
          var seen = frontier
          var foundParts: List[DataFrame] = Nil
          var d = 0
          var live = !frontier.isEmpty
          while (live && d <= cap) {
            val matched = glFromDf
              .join(frontier, glFromDf(glCtf) === frontier("_gl_val"))
              .select(col("_gl_start") +: lit(d).as("_gl_depth") +:
                fromCols.map(glFromDf(_)): _*)
              .localCheckpoint(true)
            foundParts ::= matched
            val next = matched
              .select(col("_gl_start"), col(glCff).as("_gl_val"))
              .filter(col("_gl_val").isNotNull).distinct()
              .join(seen, Seq("_gl_start", "_gl_val"), "left_anti")
              .localCheckpoint(true)
            val prevSeen = seen
            seen = seen.union(next).localCheckpoint(true)
            // superseded checkpoints (old seen; the old frontier whose
            // only consumer, matched, is materialized) free NOW (r19 §5)
            org.apache.spark.sql.graft.StorageBridge.release(prevSeen)
            org.apache.spark.sql.graft.StorageBridge.release(frontier)
            frontier = next
            d += 1
            live = !frontier.isEmpty
          }
          // with an explicit maxDepth a live frontier is the requested
          // bounded traversal; only the unbounded-with-safety-cap form
          // must refuse to silently truncate
          if (live && glMaxDepth.isEmpty) throw new IllegalStateException(
            s"$$graphLookup frontier still live after $cap rounds — " +
              "set maxDepth or raise graft.graphlookup.max_depth")
          val structCols: Seq[Column] = fromCols.map(col) ++
            glDepthF.map(f => col("_gl_depth").cast("long").as(f))
          val glGrouped = foundParts.reduceOption(_ union _) match {
            case None => null
            case Some(all) => all
              .groupBy("_gl_start")
              // canonical order: sort_array over the full struct —
              // Mongo guarantees none; this engine picks a
              // deterministic one (the $addToSet precedent)
              .agg(sort_array(collect_list(struct(structCols: _*)))
                .as(glAs))
          }
          cur = cur.withColumn("_gl_start", startCol)
          cur =
            if (glGrouped == null)
              // zero rounds ran (no non-null starts): empty arrays of a
              // best-effort element type are unconstructable without a
              // match schema — emit the degenerate all-null-start shape
              cur.withColumn(glAs, array())
            else {
              val arrT = glGrouped.schema(glAs).dataType
              cur.join(glGrouped, Seq("_gl_start"), "left")
                .withColumn(glAs,
                  coalesce(col(glAs), array().cast(arrT)))
            }
          cur = cur.drop("_gl_start")

        case "$facet" =>
          // Multi-pipeline fan-out: each facet runs its own sub-pipeline
          // over the SAME input and the stage emits ONE document whose
          // fields are the facets' result arrays. The input is lazily
          // localCheckpoint'ed so N facets cost one source evaluation,
          // not N rescans (at warehouse scale the checkpoint spills to
          // local disk; facets over a pre-filtered stream are the normal
          // shape). Facet arrays are CANONICALLY sorted (sort_array over
          // the full result struct) — Mongo preserves sub-pipeline
          // order, but collect_list order is not a Spark guarantee, and
          // a deterministic canonical order is this engine's documented
          // stance ($addToSet precedent). Each single-row facet frame
          // joins the next by crossJoin — 1×1 rows, no data movement.
          require(!grouped, "$facet after $group unsupported")
          val facets = spec.properties().asScala.toSeq
          require(facets.nonEmpty, s"$$facet needs at least one facet")
          val shared = cur.localCheckpoint(false)
          var facetOut: DataFrame = null
          for (f <- facets) {
            require(f.getValue.isArray,
              s"facet ${f.getKey} must be a pipeline array: ${f.getValue}")
            val fr = aggregate(shared, meta, f.getValue.toString, lookup)
            val one = fr.agg(sort_array(collect_list(
              struct(fr.columns.map(col): _*))).as(f.getKey))
            facetOut =
              if (facetOut == null) one else facetOut.crossJoin(one)
          }
          cur = facetOut
          grouped = true

        case "$bucketAuto" =>
          // Equal-population bucketing. Boundaries are the EXACT values
          // at ranks floor(k·n/buckets) — selected distributed-style
          // (range-partitioned sort + zipWithIndex, ≤ buckets−1 values
          // to the driver: the quantiles_orders_dist device), never a
          // global single-partition window. Rows are then assigned BY
          // VALUE against the boundary chain (equal values always land
          // together, so the result is deterministic regardless of tie
          // order; duplicate boundary values merge buckets, and empty
          // buckets simply don't appear — both exactly mirrored by a
          // counting oracle). Documented divergence from Mongo: _id =
          // {min, max} of the ACTUAL values in each bucket (Mongo
          // rounds boundaries under `granularity`, unsupported here);
          // populations are approximately equal like Mongo's
          // "attempts to evenly distribute".
          require(!grouped, "$bucketAuto after $group unsupported")
          val baGbN = spec.get("groupBy")
          require(baGbN != null && baGbN.isTextual &&
            baGbN.asText().startsWith("$"),
            s"$$bucketAuto groupBy must be a \"$$field\" path: $spec")
          val baBN = spec.get("buckets")
          require(baBN != null && baBN.isIntegralNumber &&
            baBN.asInt() >= 1,
            s"$$bucketAuto needs buckets >= 1: $spec")
          require(spec.get("granularity") == null,
            "$bucketAuto granularity (preferred-number rounding) " +
              "unsupported — exact value boundaries only")
          val nb = baBN.asInt()
          val baF = baGbN.asText().drop(1)
          val baV =
            if (cur.columns.contains(baF)) col(baF).cast("double")
            else MqlFilter.JsonResolver(meta).num(baF)
          val vals = cur.select(baV.as("_ba_v"))
          // the non-null groupBy contract is enforced UP FRONT (one
          // aggregate computes total and non-null counts together) — a
          // null discovered mid-rank-scan would only fail if it happened
          // to land on a boundary rank, otherwise silently shifting rank
          // indices and dumping nulls into bucket 0
          val baCnts = vals.agg(count(lit(1)).as("n"),
            count(col("_ba_v")).as("nn")).collect()(0)
          val nRows = baCnts.getLong(0)
          require(baCnts.getLong(1) == nRows,
            s"$$bucketAuto groupBy '$baF' must be non-null numeric for " +
              s"every document (${nRows - baCnts.getLong(1)} of $nRows " +
              "values are null or non-numeric) — $match them out first")
          val rankSet = (1 until nb).map(k => k.toLong * nRows / nb)
            .filter(_ > 0).toSet
          val bounds: Seq[Double] =
            if (rankSet.isEmpty || nRows == 0L) Nil
            else {
              val bc = cur.sparkSession.sparkContext.broadcast(rankSet)
              vals.repartitionByRange(col("_ba_v"))
                .sortWithinPartitions("_ba_v")
                .rdd.zipWithIndex()
                .filter { case (_, i) => bc.value.contains(i) }
                .map { case (r, _) => r.getDouble(0) }
                .collect().toSeq.sorted // dup values kept: merged buckets
            }
          val bucketId = bounds.foldLeft(lit(0)) { (acc, b) =>
            acc + when(baV >= lit(b), 1).otherwise(0) }
          val baOutN = spec.get("output")
          val baOuts: Seq[(String, Column)] =
            if (baOutN == null) Seq("count" -> count(lit(1)))
            else baOutN.properties().asScala.toSeq.map(e =>
              e.getKey -> accumulator(e.getValue, meta, cur, sortKeys))
          val aggCols = min(baV).as("_ba_min") +: max(baV).as("_ba_max") +:
            baOuts.map { case (nm, c) => c.as(nm) }
          cur = cur.withColumn("_ba_bucket", bucketId)
            .groupBy(col("_ba_bucket"))
            .agg(aggCols.head, aggCols.tail: _*)
            .select(struct(col("_ba_min").as("min"),
              col("_ba_max").as("max")).as("_id") +:
              baOuts.map { case (nm, _) => col(nm) }: _*)
            .orderBy(col("_id.min"))
          grouped = true

        case other =>
          throw new IllegalArgumentException(s"unsupported stage: $other")
      }
    }
    // rank mode (a $rankFusion input): append the document's 1-based
    // rank from the FINAL sort order. The window re-derives the order
    // from the recorded sort keys (row position after an orderBy is
    // not addressable), which is why the contract demands the pipeline
    // END with its $sort (+ $limit): later stages could project the
    // key columns away. The rank window is one partition over the
    // $limit-bounded stream — k rows by construction, never corpus.
    if (rankMode) {
      require(!grouped && sortKeys.nonEmpty && limited,
        "a $rankFusion input pipeline must be RANKED on this engine: " +
          "end with a total-order $sort (suffix a unique id key — " +
          "rank ties would be nondeterministic) followed by an " +
          "explicit $limit (the rank window is single-partition by " +
          "design; bound it)")
      cur = cur.withColumn(RankCol, row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          sortKeys.map { case (c, desc) =>
            if (desc) c.desc else c.asc }: _*)).cast("long"))
    }
    // rebound-root scaffolding never surfaces to the caller; any helper
    // already projected away (post-$group / inclusion-$project) is a
    // no-op drop
    helperCols.foldLeft(cur)(_.drop(_))
  }

  /** Sort-key base columns for field `key`: the real column when one
    * exists, else the Mongo/BSON cross-type order over the metadata
    * view — missing/null < numbers < strings; inside a class, by value.
    * Shared by $sort and $setWindowFields.sortBy so stage order and
    * window order can never disagree. */
  private def sortBases(key: String, cur: DataFrame,
      meta: Column,
      collation: Option[MqlFilter.Collation] = None,
      shared: Option[MqlFilter.JsonResolver] = None): Seq[Column] =
    if (cur.columns.contains(key)) {
      // an active collation keys STRING sort columns (case/diacritic
      // fold at strength ≤ 2, numeric-run key under numericOrdering);
      // other types are not collatable and pass through
      collation.filter(_.active) match {
        case Some(c) if cur.schema(key).dataType ==
            org.apache.spark.sql.types.StringType =>
          Seq(MqlFilter.collKeyCol(col(key), c))
        case _ => Seq(col(key))
      }
    } else {
      // `shared` (r18): a stage-materialized parse — without it each
      // sortBases call carries its own try_parse_json per VIEW leaf,
      // and a window stage's materialized-key Project paid 124
      // parseJson evaluations per row (see $setWindowFields)
      val r = shared.getOrElse(MqlFilter.JsonResolver(meta))
      val rank = when(!r.exists(key) || r.typeName(key) === "null", 0)
        .when(r.typeName(key).isin("long", "double"), 1)
        .when(r.typeName(key) === "string", 2)
        .otherwise(3)
      Seq(rank, r.num(key),
        collation.filter(_.active)
          .map(c => MqlFilter.collKeyCol(r.str(key), c))
          .getOrElse(r.str(key)))
    }

  /** Evaluate `build` with ONE JSON→VARIANT parse per row: probe-build
    * first to learn whether the expression touches the metadata document
    * at all (pure real-column expressions skip the wrapper and its
    * wasted parse); if it does, rebuild with the resolver's parse bound
    * to a higher-order-function lambda variable — the
    * [[MqlFilter.toColumn]] device — so every leaf of the expression
    * shares a single parse instead of paying one or two per leaf
    * (schema introspection + value extraction both re-read the
    * document; Catalyst has no global CSE to merge them). */
  private def bindOnce(metaCol: Column,
      build: MqlFilter.JsonResolver => Column): Column = {
    val probe = MqlFilter.JsonResolver(metaCol)
    val plain = build(probe)
    if (!probe.touched) plain
    else transform(array(try_parse_json(metaCol)), { p =>
      val res = MqlFilter.JsonResolver(metaCol)
      res.parsed = p
      build(res)
    }).getItem(0)
  }

  /** `"$f"` → the real column `f` when one exists (post-$unwind shape),
    * else the STRING view of metadata field f;
    * {"$toLong"/"$toDouble": "$f"} → numeric view; literals pass.
    * Parse-bound: one JSON parse per row however many leaves. */
  private def valueExpr(node: JsonNode, metaCol: Column,
      cur: DataFrame): Column =
    bindOnce(metaCol, res => valueExprRes(node, metaCol, cur, res))

  /** [[valueExpr]] resolved against a stage-shared materialized parse
    * when one exists (the r16 parse-once prelude), else the per-
    * expression lambda binding. */
  private def valueExprWith(node: JsonNode, metaCol: Column,
      cur: DataFrame, shared: Option[MqlFilter.JsonResolver]): Column =
    shared match {
      case Some(r) => valueExprRes(node, metaCol, cur, r)
      case None => valueExpr(node, metaCol, cur)
    }

  private def valueExprRes(node: JsonNode, metaCol: Column,
      cur: DataFrame, res: MqlFilter.JsonResolver): Column = {
    def ref(f: String): Column =
      if (cur.columns.contains(f)) col(f)
      else res.str(f)
    def num(f: String): Column =
      if (cur.columns.contains(f)) col(f).cast("double")
      else res.num(f)
    if (node.isTextual && node.asText().startsWith("$"))
      ref(node.asText().drop(1))
    else if (node.isObject) {
      val e = node.properties().asScala.head
      val f = e.getValue.asText().stripPrefix("$")
      e.getKey match {
        case "$toLong" => num(f).cast("long")
        case "$toDouble" => num(f)
        case other =>
          throw new IllegalArgumentException(s"unsupported operator: $other")
      }
    } else if (node.isNumber) lit(node.asDouble())
    else throw new IllegalArgumentException(s"unsupported expression: $node")
  }

  /** The computed-field expression language of $project/$addFields —
    * a superset of [[valueExpr]]: `"$f"` references (real column first,
    * else string metadata view), literals, arithmetic
    * {$add/$subtract/$multiply/$divide: [...]} (double math — MQL's
    * cross-numeric bracketing), type coercion {$toLong/$toDouble: e},
    * string ops ({$concat/$toUpper/$toLower/$split/$trim/$ltrim/$rtrim/
    * $substrCP/$strLenCP/$indexOfCP/$replaceAll/$regexMatch}), the
    * array lambda family ({$map/$filter/$reduce} with `"$$var"`
    * variables, plus {$concatArrays/$slice/$range}), and comparison/
    * logic operators ({$gt..$ne/$and/$or/$not} — numeric operands, the
    * same bracket as $cond's if). Numeric positions resolve "$f"
    * through the NUMERIC view (a JSON number's string view is null by
    * bracketing); lambda variables resolve through `env` and coerce by
    * position (a VARIANT array element casts at its use site). */
  private def computeExpr(node: JsonNode, metaCol: Column,
      cur: DataFrame): Column =
    bindOnce(metaCol, res => computeExprRes(node, metaCol, cur, res))

  /** One compute-language expression as a Column over a metadata
    * document — the entry point Mongo-4.2 UPDATE PIPELINES use
    * ([[graft.api.Collection]].updateDoc's `[{$set: {f: expr}}]`
    * form): `"$f"` refs resolve through `cur`'s real columns first,
    * then the metadata views, exactly like $addFields. */
  private[graft] def computeColumn(exprJson: String, metaCol: Column,
      cur: DataFrame): Column =
    computeExpr(mapper.readTree(exprJson), metaCol, cur)

  /** {input, chars?} operand shape shared by $trim/$ltrim/$rtrim. */
  private def trimArgs(v: JsonNode,
      strOf: JsonNode => Column): (Column, Option[String]) = {
    require(v.isObject && v.get("input") != null,
      s"trim operators need {input, chars?}: $v")
    (strOf(v.get("input")),
      Option(v.get("chars")).map { c =>
        require(c.isTextual && c.asText().nonEmpty,
          s"trim chars must be a non-empty string literal: $c")
        c.asText()
      })
  }

  private def computeExprRes(node: JsonNode, metaCol: Column,
      cur: DataFrame, res: MqlFilter.JsonResolver,
      env: Map[String, Column] = Map.empty): Column = {
    def ref(f: String): Column =
      if (f.startsWith("$")) { // "$$var": lambda variables + $$ROOT
        val name = f.drop(1)
        if (name == "ROOT") metaCol
        else env.getOrElse(name, throw new IllegalArgumentException(
          s"unknown pipeline variable: $$$$$name"))
      } else if (cur.columns.contains(f)) col(f)
      else res.str(f)
    def numRef(f: String): Column =
      if (f.startsWith("$")) ref(f).cast("double")
      else if (cur.columns.contains(f)) col(f).cast("double")
      else res.num(f)
    def numOf(n: JsonNode): Column =
      if (n.isNumber) lit(n.asDouble())
      else if (n.isTextual && n.asText().startsWith("$"))
        numRef(n.asText().drop(1))
      else if (n.isObject) {
        // $ifNull/$cond in NUMERIC position: push the numeric view
        // into the branches — the generic value path resolves `$field`
        // through the string bracket, which is null for a VARIANT
        // number (so `{$toLong: {$ifNull: ["$a", 0]}}` silently took
        // the fallback for present numeric fields)
        val e = n.properties().asScala.headOption
        e match {
          case Some(p) if p.getKey == "$ifNull" &&
              n.properties().size() == 1 =>
            val as = args(p.getValue)
            require(as.size == 2,
              s"$$ifNull takes exactly 2 arguments: ${p.getValue}")
            coalesce(numOf(as(0)), numOf(as(1)))
          case Some(p) if p.getKey == "$cond" &&
              n.properties().size() == 1 =>
            val as = args(p.getValue)
            require(as.size == 3,
              s"$$cond takes [if, then, else]: ${p.getValue}")
            when(boolOf(as(0)), numOf(as(1))).otherwise(numOf(as(2)))
          case _ =>
            computeExprRes(n, metaCol, cur, res, env).cast("double")
        }
      } else throw new IllegalArgumentException(s"not numeric: $n")
    def strOf(n: JsonNode): Column =
      if (n.isTextual && n.asText().startsWith("$")) {
        val f = n.asText().drop(1)
        // a lambda variable may hold a VARIANT element — cast at use
        if (f.startsWith("$")) ref(f).cast("string") else ref(f)
      } else if (n.isTextual) lit(n.asText())
      else if (n.isObject)
        computeExprRes(n, metaCol, cur, res, env).cast("string")
      else throw new IllegalArgumentException(s"not a string: $n")
    // array view of an operand: lambda var / real column / VARIANT
    // array metadata view / nested array-producing expression
    def arrOf(n: JsonNode): Column =
      if (n.isTextual && n.asText().startsWith("$")) {
        val f = n.asText().drop(1)
        if (f.startsWith("$")) ref(f)
        else if (cur.columns.contains(f)) col(f)
        else res.varr(f)
      } else if (n.isObject) computeExprRes(n, metaCol, cur, res, env)
      else throw new IllegalArgumentException(s"not an array: $n")
    def args(v: JsonNode): Seq[JsonNode] = {
      require(v.isArray, s"operand must be an array: $v")
      v.elements().asScala.toSeq
    }
    // $cond's if-expression: aggregation-style comparisons over numeric
    // views ({$gt: [a, b]} — note ARRAY operands, unlike the $match
    // form), or a bare boolean metadata/real-column ref
    def boolOf(n: JsonNode): Column =
      if (n.isBoolean) lit(n.asBoolean())
      else if (n.isTextual && n.asText().startsWith("$")) {
        val f = n.asText().drop(1)
        if (f.startsWith("$")) ref(f).cast("boolean")
        else if (cur.columns.contains(f)) col(f).cast("boolean")
        else res.bool(f)
      } else if (n.isObject && n.properties().size() == 1) {
        val e = n.properties().asScala.head
        e.getKey match {
          case "$gt" | "$gte" | "$lt" | "$lte" | "$eq" | "$ne" |
               "$and" | "$or" | "$not" | "$regexMatch" =>
            // these ARE compute operators returning boolean
            computeExprRes(n, metaCol, cur, res, env).cast("boolean")
          case other => throw new IllegalArgumentException(
            s"unsupported $$cond comparison: $other")
        }
      } else throw new IllegalArgumentException(s"not a condition: $n")
    // date view of an expression: "$field" resolves through the
    // timestamp view (ISO strings in metadata, typed timestamp columns),
    // a bare string literal parses as an ISO timestamp, and a nested
    // expression casts — the operand shape Mongo's date operators take
    def dateOf(n: JsonNode): Column =
      if (n.isTextual && n.asText().startsWith("$")) {
        val f = n.asText().drop(1)
        if (cur.columns.contains(f)) col(f).cast("timestamp")
        else res.ts(f)
      } else if (n.isTextual) to_timestamp(lit(n.asText()))
      else if (n.isObject)
        computeExprRes(n, metaCol, cur, res, env).cast("timestamp")
      else throw new IllegalArgumentException(s"not a date: $n")
    if (node.isTextual && node.asText().startsWith("$"))
      ref(node.asText().drop(1))
    else if (node.isTextual) lit(node.asText())
    else if (node.isNumber) lit(node.asDouble())
    else if (node.isBoolean) lit(node.asBoolean())
    else if (node.isObject) {
      require(node.properties().size() == 1,
        s"computed expression must have one operator: $node")
      val e = node.properties().asScala.head
      (e.getKey, e.getValue) match {
        case ("$add", v) => args(v).map(numOf).reduceLeft(_ + _)
        case ("$multiply", v) => args(v).map(numOf).reduceLeft(_ * _)
        case ("$subtract", v) =>
          val Seq(a, b) = args(v); numOf(a) - numOf(b)
        case ("$divide", v) =>
          val Seq(a, b) = args(v); numOf(a) / numOf(b)
        case ("$concat", v) => concat(args(v).map(strOf): _*)
        case ("$toUpper", v) => upper(strOf(v))
        case ("$toLower", v) => lower(strOf(v))
        case ("$toLong", v) => numOf(v).cast("long")
        case ("$toDouble", v) => numOf(v)
        case ("$round", v) =>
          // [expr, places] — Mongo's decimal rounding; the device gated
          // float aggregates use to absorb engine summation-order ulps
          val Seq(a, p) = args(v)
          require(p.isIntegralNumber, s"$$round places must be int: $p")
          round(numOf(a), p.asInt())
        case ("$ifNull", v) =>
          val Seq(a, b) = args(v)
          coalesce(computeExprRes(a, metaCol, cur, res, env),
            computeExprRes(b, metaCol, cur, res, env))
        case ("$cond", v) =>
          // [if, then, else] — the if is a comparison expression
          // ({$gt: [a, b]} family, numeric) or a boolean "$field" ref
          val Seq(i, t, f) = args(v)
          when(boolOf(i), computeExprRes(t, metaCol, cur, res, env))
            .otherwise(computeExprRes(f, metaCol, cur, res, env))
        case ("$size", v) =>
          // {$size: "$arrayField"} — element count of a metadata (or
          // real) array; null (not an error) for non-arrays, like the
          // filter-side $size's bracket behavior. Also accepts a nested
          // array-producing expression ($filter/$map/$split/...).
          require(v.isObject ||
            (v.isTextual && v.asText().startsWith("$")),
            s"$$size operand must be a \"$$field\" path or array " +
              s"expression: $v")
          size(arrOf(v)).cast("long")
        case ("$arrayElemAt", v) =>
          // {$arrayElemAt: ["$arrayField", i]} — 0-based; negative
          // counts from the end (Mongo contract); out-of-range → null
          val Seq(a, i) = args(v)
          require(a.isTextual && a.asText().startsWith("$"),
            s"$$arrayElemAt needs a \"$$field\" path: $a")
          require(i.isIntegralNumber,
            s"$$arrayElemAt index must be an integer: $i")
          val f = a.asText().drop(1)
          val arrC =
            if (cur.columns.contains(f)) col(f) else res.arr(f)
          val idx = i.asInt()
          // try_element_at: 1-based for positives, end-relative for
          // negatives (exactly Mongo's indexing), NULL out of range
          // (element_at throws under ANSI)
          if (idx >= 0) try_element_at(arrC, lit(idx + 1))
          else try_element_at(arrC, lit(idx))
        case ("$switch", v) =>
          // {branches: [{case, then}...], default} — Mongo's multi-way
          // $cond; first matching branch wins, no default + no match →
          // Mongo errors, mirrored with raise_error in the data path
          require(v.isObject && v.get("branches") != null &&
            v.get("branches").isArray && v.get("branches").size() > 0,
            s"$$switch needs non-empty branches: $v")
          val branches = v.get("branches").elements().asScala.toSeq.map { b =>
            require(b.has("case") && b.has("then"),
              s"$$switch branch needs {case, then}: $b")
            (boolOf(b.get("case")),
              computeExprRes(b.get("then"), metaCol, cur, res, env))
          }
          // raise_error's NullType coerces to the branch type, so the
          // loud no-match default composes with any then-branch
          val dflt: Column = Option(v.get("default"))
            .map(d => computeExprRes(d, metaCol, cur, res, env))
            .getOrElse(raise_error(lit(
              "$switch: no branch matched and no default given")))
          branches.foldRight(dflt) { case ((c, t), e) =>
            when(c, t).otherwise(e) }
        case ("$convert", v) =>
          // Mongo's safe cast: {input, to, onError?, onNull?}. The
          // conversion itself is try_cast (≡ DuckDB TRY_CAST); a null
          // INPUT takes onNull (null if absent — Mongo), a non-null
          // input whose conversion fails takes onError, and WITHOUT
          // onError a failed conversion RAISES per row (Mongo errors
          // too — a silent null would let corrupt values slide through
          // a typed pipeline). `to` supports long/int (widened to
          // long — the engine's integral bracket), double, bool, and
          // (r13) string for inputs whose STATIC type sits in the
          // integral/boolean/string bracket — digit / "true"/"false" /
          // identity rendering is engine-exact. Double→string stays
          // LOUD: float FORMATTING is the one cast the two engines
          // render differently at the edges (1e20, -0.0).
          require(v.isObject && v.get("input") != null &&
            v.get("to") != null,
            s"$$convert needs {input, to, onError?, onNull?}: $v")
          v.properties().asScala.foreach(e => require(
            Seq("input", "to", "onError", "onNull").contains(e.getKey),
            s"unsupported $$convert option: ${e.getKey}"))
          val convIn = computeExprRes(v.get("input"), metaCol, cur,
            res, env)
          // r15: a provably-DOUBLE input may convert to string through
          // the EXACTLY-INTEGRAL sub-bracket (see below); detected
          // structurally so the general string bracket stays strict
          def doubleBracket(n: JsonNode): Boolean =
            (n.isObject && n.properties().size() == 1 &&
              n.properties().asScala.head.getKey == "$toDouble") || {
              n.isTextual && n.asText().startsWith("$") &&
                !n.asText().startsWith("$$") && {
                  val f = n.asText().drop(1)
                  cur.columns.contains(f) &&
                    (cur.schema(f).dataType ==
                      org.apache.spark.sql.types.DoubleType ||
                     cur.schema(f).dataType ==
                      org.apache.spark.sql.types.FloatType)
                }
            }
          val dblToStr = v.get("to").asText() == "string" &&
            doubleBracket(v.get("input"))
          // r17: a provably-INTEGRAL input converts to date as epoch
          // MILLISECONDS — Mongo's documented long→date semantics,
          // exact on both engines via an explicit millis constructor
          // (the r14 refusal was about Spark's CAST being
          // epoch-seconds; timestamp_millis sidesteps the cast
          // entirely). Structural proof like the string brackets:
          // integral literals, $toLong/$toInt producers, real
          // long/int columns. Metadata field refs are NOT in the
          // bracket (the generic path resolves them through the
          // string view — route through $toLong explicitly), and
          // doubles stay loud (fractional-millis truncate-vs-round
          // is not pinnable).
          def intBracket(n: JsonNode): Boolean = {
            import org.apache.spark.sql.types._
            n.isIntegralNumber ||
            (n.isObject && n.properties().size() == 1 &&
              Seq("$toLong", "$toInt").contains(
                n.properties().asScala.head.getKey)) ||
            (n.isTextual && n.asText().startsWith("$") &&
              !n.asText().startsWith("$$") && {
                val f = n.asText().drop(1)
                cur.columns.contains(f) &&
                  (cur.schema(f).dataType == LongType ||
                    cur.schema(f).dataType == IntegerType)
              })
          }
          val numToDate =
            Seq("date", "timestamp").contains(v.get("to").asText()) &&
              intBracket(v.get("input"))
          val convTo = v.get("to").asText() match {
            case "long" | "int" => "long"
            case "double" => "double"
            case "bool" => "boolean"
            case "string" =>
              // the bracket proof is STRUCTURAL (pre-resolution
              // Columns carry no static type): real columns prove by
              // schema type; metadata field refs are safe by
              // construction (the generic path resolves them through
              // the STRING view — non-strings are absent on that
              // view, route through $toLong first for digit
              // rendering); computed nodes prove by operator family.
              // Anything unprovable (arithmetic → double) refuses
              // loudly rather than risk divergent float rendering.
              import org.apache.spark.sql.types._
              def bracketOk(n: JsonNode): Boolean =
                if (n.isTextual && n.asText().startsWith("$$")) false
                else if (n.isTextual && n.asText().startsWith("$")) {
                  val f = n.asText().drop(1)
                  if (cur.columns.contains(f))
                    cur.schema(f).dataType match {
                      case LongType | IntegerType | BooleanType |
                        StringType => true
                      case _ => false
                    }
                  else true // string view of the metadata document
                } else if (n.isTextual || n.isBoolean) true
                else if (n.isObject && n.properties().size() == 1) {
                  val p = n.properties().asScala.head
                  p.getKey match {
                    case "$toLong" | "$toInt" => true
                    case "$gt" | "$gte" | "$lt" | "$lte" | "$eq" |
                      "$ne" | "$and" | "$or" | "$not" |
                      "$regexMatch" => true
                    case "$concat" | "$toUpper" | "$toLower" |
                      "$toString" | "$trim" | "$substrCP" |
                      "$dateToString" => true
                    case "$convert" =>
                      Option(p.getValue.get("to")).map(_.asText())
                        .exists(Seq("long", "int", "bool", "string")
                          .contains)
                    case _ => false
                  }
                } else false
              if (!dblToStr && !bracketOk(v.get("input")))
                throw new IllegalArgumentException(
                  "$convert to string needs a provably integral/" +
                    s"bool/string input (got ${v.get("input")}) — " +
                    "double formatting is engine-divergent at the " +
                    "edges (exactly-integral doubles pass via the " +
                    "$toLong-render sub-bracket)")
              "string"
            case "date" | "timestamp" =>
              // (r14) the ISO-STRING bracket: string→timestamp via
              // try_cast is engine-exact (both engines parse ISO-8601
              // variants identically; garbage routes through onError).
              // NUMERIC inputs refuse loudly: Mongo reads a long as
              // epoch MILLIS, Spark's cast as epoch SECONDS, and
              // DuckDB errors — three different answers. The proof is
              // structural, like the to-string bracket.
              import org.apache.spark.sql.types._
              def dateBracketOk(n: JsonNode): Boolean =
                if (n.isTextual && n.asText().startsWith("$$")) false
                else if (n.isTextual && n.asText().startsWith("$")) {
                  val f = n.asText().drop(1)
                  if (cur.columns.contains(f))
                    cur.schema(f).dataType match {
                      case StringType | TimestampType => true
                      case _ => false
                    }
                  else true // string view of the metadata document
                } else if (n.isTextual) true // ISO literal
                else if (n.isObject && n.properties().size() == 1) {
                  n.properties().asScala.head.getKey match {
                    case "$concat" | "$toUpper" | "$toLower" |
                      "$toString" | "$trim" | "$substrCP" |
                      "$dateToString" => true // string producers
                    case "$dateFromString" | "$dateAdd" |
                      "$dateSubtract" | "$dateTrunc" => true // ts producers
                    case "$cond" => // [if, then, else]: branches prove
                      val c = n.properties().asScala.head.getValue
                      c.isArray && c.size() == 3 &&
                        dateBracketOk(c.get(1)) && dateBracketOk(c.get(2))
                    case _ => false
                  }
                } else false
              if (!numToDate && !dateBracketOk(v.get("input")))
                throw new IllegalArgumentException(
                  "$convert to date needs a provably string/timestamp " +
                    s"input or a provably INTEGRAL one (epoch millis, " +
                    s"r17) (got ${v.get("input")}) — a double input's " +
                    "fractional-millis handling is not pinnable")
              "timestamp"
            case other => throw new IllegalArgumentException(
              s"unsupported $$convert target '$other' (long/int/" +
                "double/bool/date/string-on-integral-bracket)")
          }
          // r15 double→string EXACT sub-bracket: a double that is
          // exactly integral (v == trunc(v), |v| ≤ 2^53, not -0.0)
          // renders under an EXPLICIT integer cast — digit-identical
          // on both engines AND to Mongo ($toString renders 5.0 as
          // "5"). Everything float formatting could diverge on —
          // fractional values, magnitudes past 2^53, negative zero
          // (Mongo renders "-0") — raises PER ROW with the reason;
          // onError does NOT swallow it (Mongo's double→string never
          // errors, so a silent onError fallback would misreport a
          // bracket refusal as a data error).
          val convCast =
            if (dblToStr)
              when(convIn === convIn.cast("long").cast("double") &&
                  org.apache.spark.sql.functions.abs(convIn) <=
                    lit(9.007199254740992e15) &&
                  !(convIn === 0.0 && lit(1.0) / convIn < 0),
                convIn.cast("long").cast("string"))
              .otherwise(raise_error(concat(
                lit("$convert double->string is exact only for " +
                  "integral |v| <= 2^53 (float formatting diverges " +
                  "across engines), got: "),
                convIn.cast("string"))).cast("string"))
            else if (numToDate)
              // epoch-millis → timestamp, bounded so the µs value
              // always fits a long on BOTH engines (past it, DuckDB's
              // make_timestamp errors where Spark would silently
              // overflow — raise instead)
              when(org.apache.spark.sql.functions.abs(convIn)
                  <= lit(9223372036854775L),
                timestamp_millis(convIn.cast("long")))
                .otherwise(raise_error(concat(
                  lit("$convert long->date: |epoch millis| past the " +
                    "timestamp range: "),
                  convIn.cast("string"))).cast("timestamp"))
            else convIn.try_cast(convTo)
          val onNull: Column = Option(v.get("onNull"))
            .map(n => computeExprRes(n, metaCol, cur, res, env)
              .cast(convTo))
            .getOrElse(lit(null).cast(convTo))
          val onError: Column = Option(v.get("onError"))
            .map(n => computeExprRes(n, metaCol, cur, res, env)
              .cast(convTo))
            .getOrElse(raise_error(concat(
              lit(s"$$convert to $convTo failed for input: "),
              convIn.cast("string"))))
          when(convIn.isNull, onNull)
            .when(convCast.isNull, onError)
            .otherwise(convCast)
        // Mongo date operator family over the timestamp view (builds on
        // the ISO-string date convention of the $date filter literals).
        // Parts return LONG (the oracle engines' integer date parts).
        // Each part operator also accepts Mongo's {date, timezone}
        // document form (r14) — the part is extracted from the zone's
        // wall clock (which calendar day/hour an instant is depends on
        // the zone). Fixed offsets are integer shifts; named zones
        // (r15) shift by the baked per-instant offset — a total,
        // forward-only mapping (no gap/overlap ambiguity).
        case (op @ ("$year" | "$month" | "$dayOfMonth" | "$hour" |
            "$minute" | "$second" | "$millisecond" | "$dayOfWeek" |
            "$dayOfYear" | "$isoDayOfWeek" | "$isoWeek" |
            "$isoWeekYear" | "$week"), v) =>
          val (dn, tzp) =
            if (v.isObject && v.get("date") != null) {
              v.properties().asScala.foreach(e => require(
                Seq("date", "timezone").contains(e.getKey),
                s"unsupported $op option: ${e.getKey} (date/timezone)"))
              (v.get("date"), tzSpecOf(v))
            } else (v, UtcTz: TzSpec)
          val ts = if (tzp.isZero) dateOf(dn)
            else timestamp_seconds(tzp.toLocal(unix_timestamp(dateOf(dn))))
          (op match {
            case "$year" => year(ts)
            case "$month" => month(ts)
            case "$dayOfMonth" => dayofmonth(ts)
            case "$hour" => hour(ts)
            case "$minute" => minute(ts)
            case "$second" => second(ts)
            // all offsets are whole minutes, so the sub-second part is
            // zone-INVARIANT — read it off the unshifted instant (the
            // shifted `ts` rides unix_timestamp, which truncates to
            // whole seconds and would zero it); pmod keeps pre-1970
            // exact
            case "$millisecond" =>
              pmod(unix_micros(dateOf(dn)), lit(1000000L)) / lit(1000L)
            // Spark dayofweek is already Mongo's 1=Sunday..7=Saturday
            case "$dayOfWeek" => dayofweek(ts)
            case "$dayOfYear" => dayofyear(ts)
            // Spark weekday is 0=Monday..6 — ISO wants 1=Monday..7
            case "$isoDayOfWeek" => weekday(ts) + lit(1)
            // Spark weekofyear IS the ISO-8601 week number
            case "$isoWeek" => weekofyear(ts)
            case "$isoWeekYear" => date_part(lit("YEAROFWEEK"), ts)
            // Mongo $week = strftime %U: weeks start on Sunday, days
            // before the year's first Sunday are week 0. With d =
            // day-of-year and s = Sunday-based weekday index
            // (dayofweek-1), the count of Sundays in [1, d] is
            // (d - s + 6) DIV 7 — all integer, engine-exact
            case _ =>
              (dayofyear(ts) - (dayofweek(ts) - lit(1)) + lit(6))
                .cast("long") / lit(7L)
          }).cast("long")
        case ("$dateFromString", v) =>
          // {dateString, format?, timezone?, onError?, onNull?}: the
          // string is read as the zone's WALL CLOCK — parse, then map
          // back to the UTC instant (r14 fixed offsets; r15 named
          // zones via the baked table — a local time in a DST gap
          // shifts forward, one in an overlap takes the earlier
          // instant, the java.time resolution). r15 options: `format`
          // parses by Mongo %-specifiers (the numeric subset both
          // engines parse identically — %Y %m %d %H %M %S plus
          // literals; %L/%j/%Z raise: milli/zone PARSING diverges);
          // a null/missing dateString routes to onNull (absent →
          // null, Mongo's contract); an unparseable string routes to
          // onError, and WITHOUT onError it raises per row — Mongo
          // errors there, and the previous silent-null was a quiet
          // divergence this revision closes.
          require(v.isObject && v.get("dateString") != null,
            s"$$dateFromString needs {dateString}: $v")
          v.properties().asScala.foreach(e => require(
            Seq("dateString", "format", "timezone", "onError", "onNull")
              .contains(e.getKey),
            s"unsupported $$dateFromString option: ${e.getKey}"))
          val dfsTz = tzSpecOf(v)
          val dfsStr = strOf(v.get("dateString"))
          val parsed0 = Option(v.get("format")).map(_.asText()) match {
            case Some(f) =>
              require(!Seq("%L", "%j", "%Z").exists(f.contains),
                s"$$dateFromString format specifiers %L/%j/%Z are " +
                  s"render-only (parsing them is engine-divergent): $f")
              try_to_timestamp(dfsStr, lit(mongoDateFormat(f)))
            // try-parse in BOTH arms: ANSI to_timestamp throws its own
            // cast error before the onError/raise routing could run
            case None => try_to_timestamp(dfsStr)
          }
          val dfsOnNull: Column = Option(v.get("onNull"))
            .map(n => computeExprRes(n, metaCol, cur, res, env)
              .cast("timestamp"))
            .getOrElse(lit(null).cast("timestamp"))
          val dfsOnError: Column = Option(v.get("onError"))
            .map(n => computeExprRes(n, metaCol, cur, res, env)
              .cast("timestamp"))
            .getOrElse(raise_error(concat(
              lit("$dateFromString could not parse: "), dfsStr))
              .cast("timestamp"))
          val parsed = parsed0
          def routed(ok: Column): Column =
            when(dfsStr.isNull, dfsOnNull)
              .when(parsed.isNull, dfsOnError)
              .otherwise(ok)
          if (dfsTz.isZero) routed(parsed)
          else {
            // Mongo RAISES when the string carries its own offset AND a
            // timezone option is given; honoring the embedded offset
            // then shifting again would double-shift silently. The
            // string is column-valued, so the conflict check is a
            // runtime guard: an offset/Z suffix is only an offset when
            // it follows a time component (a bare date's "-01" is a day)
            val embedded = dfsStr.rlike(
              "\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?\\s*" +
                "([Zz]|[+-]\\d{2}(:?\\d{2})?)$")
            // the conflict raise outranks onError: a query that
            // supplies BOTH an embedded offset and a timezone option
            // is a query bug, not a data error — so the embedded
            // check runs BEFORE the parsed.isNull -> onError branch
            // (an offset-carrying string that ALSO fails the format
            // parse must still raise, not route to onError)
            when(dfsStr.isNull, dfsOnNull)
              .when(embedded, raise_error(concat(
                lit("$dateFromString: dateString carries an explicit " +
                  "offset while a timezone option is also given — Mongo " +
                  "raises on the conflict, so does this engine: "),
                dfsStr)).cast("timestamp"))
              .when(parsed.isNull, dfsOnError)
              .otherwise(timestamp_seconds(
                dfsTz.toInstant(unix_timestamp(parsed), None)))
          }
        case ("$dateTrunc", v) =>
          // {date, unit, binSize?, timezone?, startOfWeek?}: Mongo
          // 5.0's truncation. binSize 1 calendar units map to Spark's
          // date_trunc (same boundary semantics as the oracle
          // engines); binSize N (r15) is exact integer bin arithmetic
          // anchored at Mongo's documented reference instant
          // 2000-01-01T00:00:00Z — month-family bins on the
          // months-since-anchor index, second-family bins on
          // seconds-since-anchor, both with a bin-width-multiple
          // positive shift so truncating division IS floor division
          // (dates before 2000 bin correctly on both engines). week
          // truncation honors startOfWeek (default Sunday — the most
          // recent such weekday's midnight); week with binSize > 1
          // stays loud: the DIRECTION Mongo adjusts its week anchor
          // from the Saturday reference date is not pinnable from
          // public knowledge alone, and a coin-flip convention could
          // silently disagree by one whole bin. timezone: truncate in
          // the zone's wall clock, map back to the instant — fixed
          // offsets as a pure integer conjugation (r14); named zones
          // (r15) through the baked table, preferring the base
          // instant's offset when the truncated local lands in a
          // fall-back overlap (a zone that transitions AT midnight can
          // put local midnight in a gap — the java.time forward shift
          // applies, like all gap cases)
          require(v.isObject && v.get("date") != null &&
            v.get("unit") != null, s"$$dateTrunc needs {date, unit}: $v")
          v.properties().asScala.foreach(e => require(
            Seq("date", "unit", "binSize", "timezone", "startOfWeek")
              .contains(e.getKey),
            s"unsupported $$dateTrunc option: ${e.getKey}"))
          val u = v.get("unit").asText()
          require(Seq("year", "quarter", "month", "week", "day", "hour",
            "minute", "second").contains(u),
            s"unsupported $$dateTrunc unit: $u")
          val binN = Option(v.get("binSize")).map { n =>
            require(n.isIntegralNumber && n.asLong() >= 1,
              s"$$dateTrunc binSize must be a positive integer: $n")
            n.asLong()
          }.getOrElse(1L)
          val sow = Option(v.get("startOfWeek")).map { n =>
            require(u == "week",
              "$dateTrunc startOfWeek applies only to unit 'week'")
            n.asText().toLowerCase
          }.getOrElse("sunday")
          require(u != "week" || binN == 1L,
            "$dateTrunc week with binSize > 1 is unsupported: Mongo's " +
              "week-bin anchor adjustment from the 2000-01-01 " +
              "(Saturday) reference is not pinnable from public " +
              "knowledge — a guessed direction could silently be one " +
              "bin off; use binSize 1 (startOfWeek honored) or day " +
              "bins")
          val truncTz = tzSpecOf(v)
          // truncate LOCAL-frame seconds per unit/binSize
          def truncLocal(localSecs: Column): Column = u match {
            case "week" =>
              val w = Seq("sunday", "monday", "tuesday", "wednesday",
                "thursday", "friday", "saturday").indexOf(sow)
              require(w >= 0, s"bad startOfWeek: $sow")
              val ud = unix_date(to_date(timestamp_seconds(localSecs)))
                .cast("long")
              // Sunday-based weekday of epoch day ud is (ud+4) mod 7;
              // step back to the most recent startOfWeek midnight
              val back = pmod(pmod(ud + lit(4L), lit(7L)) - lit(w.toLong),
                lit(7L))
              (ud - back) * lit(86400L)
            case "year" | "quarter" | "month" if binN == 1L =>
              unix_timestamp(date_trunc(u,
                timestamp_seconds(localSecs)))
            case "year" | "quarter" | "month" =>
              val widthM = binN * (u match {
                case "year" => 12L; case "quarter" => 3L; case _ => 1L })
              require(widthM <= 1200000L,
                s"$$dateTrunc binSize too large: $binN $u")
              val shift = widthM * 100000L // bin-width multiple, > any
              val d = to_date(timestamp_seconds(localSecs))
              val msa = (year(d).cast("long") - lit(2000L)) * lit(12L) +
                month(d).cast("long") - lit(1L)
              // floor-to-bin as exact LONG arithmetic: x − (x mod W)
              // (a double-division quotient could truncate across the
              // boundary at large magnitudes), then back to a date via
              // add_months from the anchor
              val x = msa + lit(shift)
              val bm = x - pmod(x, lit(widthM)) - lit(shift)
              unix_date(add_months(to_date(lit("2000-01-01")),
                bm.cast("int"))).cast("long") * lit(86400L)
            case _ if binN == 1L =>
              unix_timestamp(date_trunc(u,
                timestamp_seconds(localSecs)))
            case _ =>
              val widthS = binN * (u match {
                case "day" => 86400L; case "hour" => 3600L
                case "minute" => 60L; case _ => 1L })
              require(widthS <= 4000000000000L,
                s"$$dateTrunc binSize too large: $binN $u")
              val anchor = 946684800L // 2000-01-01T00:00:00Z
              val shift = widthS * (1000000000000L / widthS + 1L)
              // x − (x mod W): exact LONG floor-to-bin (see above)
              val x = localSecs - lit(anchor) + lit(shift)
              x - pmod(x, lit(widthS)) + lit(anchor) - lit(shift)
          }
          if (truncTz.isZero)
            timestamp_seconds(truncLocal(
              unix_timestamp(dateOf(v.get("date")))))
          else {
            val baseSecs = unix_timestamp(dateOf(v.get("date")))
            timestamp_seconds(truncTz.toInstant(
              truncLocal(truncTz.toLocal(baseSecs)),
              Some(truncTz.offsetAt(baseSecs))))
          }
        case ("$dateToString", v) =>
          require(v.isObject && v.get("date") != null,
            s"$$dateToString needs {date, format?, timezone?}: $v")
          val fmt = Option(v.get("format")).map(_.asText())
            .getOrElse("%Y-%m-%dT%H:%M:%S.%LZ")
          // timezone: render the zone's WALL CLOCK — format the
          // shifted instant (the session stays UTC). r14 fixed
          // offsets; r15 named zones (forward-only, total)
          val fmtTz = tzSpecOf(v)
          require(fmtTz.isZero || !fmt.contains("%Z"),
            s"$$dateToString %Z with a nonzero offset would render the " +
              s"session zone, not the requested one — drop %Z or the " +
              s"timezone: $v")
          val fmtTs =
            if (fmtTz.isZero) dateOf(v.get("date"))
            else timestamp_seconds(
              fmtTz.toLocal(unix_timestamp(dateOf(v.get("date")))))
          date_format(fmtTs, mongoDateFormat(fmt))
        case ("$dateDiff", v) =>
          // {startDate, endDate, unit}: boundary-crossing count, Mongo's
          // contract — "day" counts calendar-day boundaries (datediff on
          // the date-truncated operands), "hour"/"minute"/"second" count
          // whole-unit boundaries on the epoch. Other units are loud.
          require(v.isObject && v.get("startDate") != null &&
            v.get("endDate") != null && v.get("unit") != null,
            s"$$dateDiff needs {startDate, endDate, unit}: $v")
          v.properties().asScala.foreach(e => require(
            Seq("startDate", "endDate", "unit", "timezone",
              "startOfWeek").contains(e.getKey),
            s"unsupported $$dateDiff option: ${e.getKey}"))
          // timezone (r14): boundaries are counted in the zone's wall
          // clock — day boundaries move with the zone, and hour
          // boundaries too for :30/:45 offsets. Shift both operands
          // into the zone frame (r15: named zones shift each operand
          // by ITS OWN baked offset — the calendar day an instant
          // falls on is offset-at-that-instant's business); the
          // boundary arithmetic below is unchanged.
          //
          // Sub-day units in NAMED zones (r17 — lifts the r15/r16
          // bracket): hour and minute counts are WALL-CLOCK LABEL
          // arithmetic — truncate each operand on its own
          // offset-shifted local clock and diff the unit indexes,
          // which is exactly Mongo's local-convert-then-truncate
          // evaluation (dateDiffHour/Minute in Mongo's
          // date_time_support convert through the zone before
          // truncating). The SECOND unit is different (r18, fixing
          // the r17 convention): Mongo's dateDiffSecond subtracts raw
          // epoch seconds and never consults the timezone — every
          // UTC offset is a whole number of minutes, so second
          // boundaries are zone-invariant. Across a spring-forward
          // gap the skipped hour/minute labels still count (01:30
          // EST → 03:30 EDT, one physical hour, counts 2 hour
          // boundaries); across a fall-back overlap the repeated hour
          // counts once (00:30 EDT → 01:30 EST, two physical hours,
          // counts 1). That asymmetry is a property of wall clocks,
          // not an ambiguity: the integer arithmetic over
          // TzTable-resolved offsets is exact, and the oracle replays
          // the identical table. Callers needing PHYSICAL elapsed
          // units subtract epochs (no timezone) instead.
          val ddTz = tzSpecOf(v)
          // startOfWeek (Mongo: week unit only, default Sunday)
          val ddSow = Option(v.get("startOfWeek")).map { n =>
            require(v.get("unit").asText() == "week",
              "$dateDiff startOfWeek applies only to unit 'week'")
            n.asText().toLowerCase
          }.getOrElse("sunday")
          def inZone(c: Column): Column =
            if (ddTz.isZero) c
            else timestamp_seconds(ddTz.toLocal(unix_timestamp(c)))
          val sd = inZone(dateOf(v.get("startDate")))
          val ed = inZone(dateOf(v.get("endDate")))
          v.get("unit").asText() match {
            case "day" => datediff(to_date(ed), to_date(sd)).cast("long")
            // calendar-boundary counts (r15): pure integer index
            // arithmetic on the wall-clock calendar — engine-exact
            case "year" => (year(ed) - year(sd)).cast("long")
            case "quarter" =>
              (year(ed) * lit(4) + quarter(ed) -
                (year(sd) * lit(4) + quarter(sd))).cast("long")
            case "month" =>
              (year(ed) * lit(12) + month(ed) -
                (year(sd) * lit(12) + month(sd))).cast("long")
            case "week" =>
              // week index = count of startOfWeek boundaries since a
              // fixed anchor: with e = epoch day and k the per-weekday
              // phase (first such weekday in 1970 is day 3+w, w =
              // Sunday-based index), index = (e + k + 35e6) DIV 7 —
              // the +35e6 keeps the dividend positive so truncating
              // division IS floor division on both engines (any date
              // past year −7000)
              val w = Seq("sunday", "monday", "tuesday", "wednesday",
                "thursday", "friday", "saturday").indexOf(ddSow)
              require(w >= 0, s"bad startOfWeek: $ddSow")
              val k = ((4 - w) % 7 + 7) % 7
              def wkIdx(c: Column): Column =
                ((unix_date(to_date(c)).cast("long") + lit(k.toLong) +
                  lit(35000000L)) / lit(7L)).cast("long")
              wkIdx(ed) - wkIdx(sd)
            case "hour" =>
              (floor(unix_timestamp(ed) / 3600) -
                floor(unix_timestamp(sd) / 3600)).cast("long")
            case "minute" =>
              (floor(unix_timestamp(ed) / 60) -
                floor(unix_timestamp(sd) / 60)).cast("long")
            case "second" =>
              // raw physical-epoch difference — Mongo ignores the
              // timezone for the second unit (see header comment)
              (unix_timestamp(dateOf(v.get("endDate"))) -
                unix_timestamp(dateOf(v.get("startDate")))).cast("long")
            case u => throw new IllegalArgumentException(
              s"unsupported $$dateDiff unit: $u (year|quarter|month|" +
                "week|day|hour|minute|second)")
          }
        case (op @ ("$dateAdd" | "$dateSubtract"), v) =>
          // Mongo 5.0 date arithmetic. Fixed-length units
          // (week/day/hour/minute/second) are pure integer
          // epoch-seconds arithmetic — engine-exact. Calendar units
          // (year/quarter/month, r13) run UTC CIVIL-DATE arithmetic:
          // add_months on the date part (Spark 3+ clamps a
          // nonexistent day-of-month to the month's last day — Jan 31
          // + 1 month → Feb 28/29 — exactly Mongo's documented clamp
          // AND DuckDB's ts + INTERVAL n MONTH behavior), then
          // re-attach the time-of-day as integer seconds-within-day.
          // Timezone (r14): FIXED offsets — the civil arithmetic runs
          // in the offset-shifted frame (shift, add, shift back: which
          // calendar day "Jan 31 23:00 UTC" is — and so which
          // month-end clamp applies — depends on the zone), a pure
          // integer conjugation. NAMED zones (r15): the same civil
          // arithmetic through the baked [[graft.expr.TzTable]] — the
          // shift-in offset is the base instant's, the shift-out
          // resolves the result local time with java.time's rules (gap
          // → forward by the gap; overlap → the base offset when still
          // valid, else the earlier instant). Mongo's documented
          // DST-awareness makes day/week CIVIL units in a named zone
          // (adding 1 day across spring-forward is 23 physical hours);
          // in fixed frames day/week stay on the exact-seconds path —
          // the same result, one expression instead of three.
          require(v.isObject && v.get("startDate") != null &&
            v.get("unit") != null && v.get("amount") != null,
            s"$op needs {startDate, unit, amount}: $v")
          val tzSp = tzSpecOf(v)
          val sign = if (op == "$dateSubtract") -1 else 1
          def civilShift(newLocalOf: Column => Column): Column = {
            val baseSecs = unix_timestamp(dateOf(v.get("startDate")))
            val localSecs = tzSp.toLocal(baseSecs)
            timestamp_seconds(tzSp.toInstant(newLocalOf(localSecs),
              Some(tzSp.offsetAt(baseSecs))))
          }
          v.get("unit").asText() match {
            case u @ ("year" | "quarter" | "month") =>
              val mPerU = u match {
                case "year" => 12; case "quarter" => 3; case _ => 1 }
              val amtM = numOf(v.get("amount")).cast("int") *
                lit(sign * mPerU)
              civilShift { localSecs =>
                val d = to_date(timestamp_seconds(localSecs))
                // integer seconds-within-day (session TZ is UTC, so
                // the date boundary is exactly unix_date * 86400)
                val tod = localSecs - unix_date(d).cast("long") * 86400L
                unix_date(add_months(d, amtM)).cast("long") * 86400L + tod
              }
            case u @ ("week" | "day") if tzSp.civilDays =>
              val daySecs = if (u == "week") 604800L else 86400L
              val amt = numOf(v.get("amount")).cast("long") *
                lit(daySecs * sign)
              civilShift(localSecs => localSecs + amt)
            case u =>
              val addSecs = u match {
                case "week" => 604800L
                case "day" => 86400L
                case "hour" => 3600L
                case "minute" => 60L
                case "second" => 1L
                case other => throw new IllegalArgumentException(
                  s"unsupported $op unit: $other (year|quarter|month|" +
                    "week|day|hour|minute|second)")
              }
              val amt = numOf(v.get("amount")).cast("long") * addSecs
              timestamp_seconds(
                unix_timestamp(dateOf(v.get("startDate"))) + amt * sign)
          }
        // ---- comparison / logic as first-class compute operators
        // (Mongo's aggregation $gt family — numeric operands, same
        // bracket as $cond's if-expression, which delegates here) ----
        case ("$gt", v) =>
          val Seq(a, b) = args(v); numOf(a) > numOf(b)
        case ("$gte", v) =>
          val Seq(a, b) = args(v); numOf(a) >= numOf(b)
        case ("$lt", v) =>
          val Seq(a, b) = args(v); numOf(a) < numOf(b)
        case ("$lte", v) =>
          val Seq(a, b) = args(v); numOf(a) <= numOf(b)
        case ("$eq", v) =>
          val Seq(a, b) = args(v); numOf(a) === numOf(b)
        case ("$ne", v) =>
          val Seq(a, b) = args(v); numOf(a) =!= numOf(b)
        case ("$and", v) => args(v).map(boolOf).reduceLeft(_ && _)
        case ("$or", v) => args(v).map(boolOf).reduceLeft(_ || _)
        case ("$not", v) =>
          // Mongo wraps the operand in a 1-element array
          val inner = if (v.isArray) args(v).head else v
          !boolOf(inner)
        // ---- array lambda family ($map/$filter/$reduce + helpers).
        // Lambda variables bind through `env`; a "$$var" reference
        // resolves to the bound Column and coerces at its use site
        // (VARIANT elements cast to double/string positionally). All
        // three compile to Spark's codegen'd higher-order functions —
        // per-row, scan-speed, zero shuffle. ----
        case ("$map", v) =>
          require(v.isObject && v.get("input") != null &&
            v.get("in") != null, s"$$map needs {input, as?, in}: $v")
          val as = Option(v.get("as")).map(_.asText()).getOrElse("this")
          transform(arrOf(v.get("input")), x =>
            computeExprRes(v.get("in"), metaCol, cur, res,
              env + (as -> x)))
        case ("$filter", v) =>
          require(v.isObject && v.get("input") != null &&
            v.get("cond") != null,
            s"$$filter needs {input, as?, cond}: $v")
          val as = Option(v.get("as")).map(_.asText()).getOrElse("this")
          filter(arrOf(v.get("input")), x =>
            computeExprRes(v.get("cond"), metaCol, cur, res,
              env + (as -> x)).cast("boolean"))
        case ("$reduce", v) =>
          require(v.isObject && v.get("input") != null &&
            v.get("initialValue") != null && v.get("in") != null,
            s"$$reduce needs {input, initialValue, in}: $v")
          // fully qualified: MqlPipeline.aggregate (the pipeline entry
          // point) shadows functions.aggregate here
          org.apache.spark.sql.functions.aggregate(
            arrOf(v.get("input")),
            computeExprRes(v.get("initialValue"), metaCol, cur, res, env),
            (acc: Column, t: Column) =>
              computeExprRes(v.get("in"), metaCol, cur, res,
                env + ("value" -> acc) + ("this" -> t)))
        case ("$concatArrays", v) => concat(args(v).map(arrOf): _*)
        case ("$slice", v) =>
          // [arr, n]: first n (n>0) / last n (n<0); [arr, pos, n]:
          // n elements from 0-based pos (negative pos from the end —
          // the |pos|>len clamp edge is unsupported, loud by absence)
          args(v) match {
            case Seq(arr, n) =>
              require(n.isIntegralNumber, s"$$slice count: $n")
              val k = n.asInt()
              if (k >= 0) slice(arrOf(arr), 1, k)
              else slice(arrOf(arr), k, -k)
            case Seq(arr, p, n) =>
              require(p.isIntegralNumber && n.isIntegralNumber &&
                n.asInt() > 0, s"$$slice position/count: $p/$n")
              val pos = p.asInt()
              slice(arrOf(arr), if (pos >= 0) pos + 1 else pos, n.asInt())
            case _ => throw new IllegalArgumentException(
              s"$$slice needs [array, n] or [array, position, n]: $v")
          }
        case ("$range", v) =>
          // [start, end, step?]: end-EXCLUSIVE integer grid (Mongo
          // contract); literal bounds, positive step
          val a = args(v)
          require((a.length == 2 || a.length == 3) &&
            a.forall(_.isIntegralNumber),
            s"$$range needs integer literals [start, end, step?]: $v")
          val (st, en) = (a(0).asLong(), a(1).asLong())
          val sp = if (a.length == 3) a(2).asLong() else 1L
          require(sp > 0, s"$$range supports positive step only: $sp")
          if (st >= en) lit(Array.empty[Long])
          else sequence(lit(st), lit(en - 1), lit(sp))
        case ("$let", v) =>
          // {vars: {name: expr, ...}, in: expr} — named subexpressions;
          // vars evaluate in the OUTER scope (Mongo contract: a var
          // cannot see its siblings), then `in` sees them as "$$name"
          require(v.isObject && v.get("vars") != null &&
            v.get("vars").isObject && v.get("in") != null,
            s"$$let needs {vars: {...}, in}: $v")
          val bound = v.get("vars").properties().asScala.map { e =>
            e.getKey -> computeExprRes(e.getValue, metaCol, cur, res, env)
          }.toMap
          computeExprRes(v.get("in"), metaCol, cur, res, env ++ bound)
        case ("$reverseArray", v) => reverse(arrOf(v))
        case ("$sortArray", v) =>
          // {input, sortBy: 1|-1} — scalar element sort (Mongo's
          // document sortBy specs are out of scope, loud)
          require(v.isObject && v.get("input") != null &&
            v.get("sortBy") != null && v.get("sortBy").isIntegralNumber,
            s"$$sortArray needs {input, sortBy: 1|-1}: $v")
          val asc = v.get("sortBy").asInt() == 1
          // numeric element bracket: VARIANT carries no ordering, so
          // elements sort through the double view
          val sorted = array_sort(
            transform(arrOf(v.get("input")), _.cast("double")))
          if (asc) sorted else reverse(sorted)
        case ("$indexOfArray", v) =>
          // [arr, value] — 0-based first position, -1 absent (Mongo);
          // numeric matching through the double view (the language's
          // numeric bracket)
          val Seq(a, value) = args(v)
          val arrD = transform(arrOf(a), x => x.cast("double"))
          coalesce(array_position(arrD, numOf(value)) - 1, lit(-1L))
        // set operators: Mongo sets are unordered — emitted
        // CANONICALLY SORTED (the $addToSet/$facet precedent), distinct
        // elements, numeric element bracket
        case ("$setUnion", v) =>
          array_sort(array_distinct(concat(
            args(v).map(n => transform(arrOf(n), _.cast("double"))): _*)))
        case ("$setIntersection", v) =>
          array_sort(array_distinct(args(v)
            .map(n => transform(arrOf(n), _.cast("double")))
            .reduceLeft(array_intersect)))
        case ("$setDifference", v) =>
          val Seq(a, b) = args(v)
          array_sort(array_distinct(array_except(
            transform(arrOf(a), _.cast("double")),
            transform(arrOf(b), _.cast("double")))))
        // ---- string operator family ----
        case ("$split", v) =>
          val Seq(a, d) = args(v)
          require(d.isTextual && d.asText().nonEmpty,
            s"$$split delimiter must be a non-empty string literal: $d")
          split(strOf(a), java.util.regex.Pattern.quote(d.asText()))
        case ("$strLenCP", v) => length(strOf(v)).cast("long")
        case ("$substrCP", v) =>
          // [str, start, count] — 0-based codepoint slice
          val Seq(a, st, cnt) = args(v)
          require(st.isIntegralNumber && cnt.isIntegralNumber &&
            st.asInt() >= 0 && cnt.asInt() >= 0,
            s"$$substrCP start/count must be non-negative ints: $v")
          substring(strOf(a), st.asInt() + 1, cnt.asInt())
        case ("$indexOfCP", v) =>
          // [str, substr-literal] — 0-based first occurrence, -1 absent
          val Seq(a, sub) = args(v)
          require(sub.isTextual,
            s"$$indexOfCP substring must be a string literal: $sub")
          (instr(strOf(a), sub.asText()) - 1).cast("long")
        case ("$trim", v) =>
          val (s0, ch) = trimArgs(v, strOf)
          ch.map(c => trim(s0, c)).getOrElse(trim(s0))
        case ("$ltrim", v) =>
          val (s0, ch) = trimArgs(v, strOf)
          ch.map(c => ltrim(s0, c)).getOrElse(ltrim(s0))
        case ("$rtrim", v) =>
          val (s0, ch) = trimArgs(v, strOf)
          ch.map(c => rtrim(s0, c)).getOrElse(rtrim(s0))
        case ("$replaceAll", v) =>
          // {input, find, replacement} — LITERAL find (Mongo contract;
          // $regexMatch is the regex form)
          require(v.isObject && v.get("input") != null &&
            v.get("find") != null && v.get("replacement") != null,
            s"$$replaceAll needs {input, find, replacement}: $v")
          replace(strOf(v.get("input")), strOf(v.get("find")),
            strOf(v.get("replacement")))
        case ("$regexMatch", v) =>
          // {input, regex, options?} — boolean; only the 'i' option
          require(v.isObject && v.get("input") != null &&
            v.get("regex") != null && v.get("regex").isTextual,
            s"$$regexMatch needs {input, regex-literal, options?}: $v")
          val opts = Option(v.get("options")).map(_.asText()).getOrElse("")
          require(opts.forall(_ == 'i'),
            s"$$regexMatch supports only the 'i' option: $opts")
          val rx = (if (opts.contains('i')) "(?i)" else "") +
            v.get("regex").asText()
          regexp_like(strOf(v.get("input")), lit(rx))
        case ("$toString", v) =>
          computeExprRes(v, metaCol, cur, res, env).cast("string")
        case ("$toInt", v) =>
          // emitted as LONG — one integral width in the result schema
          numOf(v).cast("long")
        case (other, _) =>
          throw new IllegalArgumentException(
            s"unsupported computed operator: $other")
      }
    } else throw new IllegalArgumentException(
      s"unsupported expression: $node")
  }

  /** {$sum|$avg|$min|$max|$count|$push|$addToSet|$first|$last: expr};
    * `$sum: 1` counts (sum of the int literal is a LONG — same type as
    * the oracle's count), `{$count: {}}` is Mongo 5's count accumulator.
    *
    * Order-sensitive accumulators translate shuffle-safely, never by
    * relying on input order (a pre-group orderBy does not survive the
    * aggregation exchange):
    *  - $first/$last REQUIRE a prior $sort with a uniform direction and
    *    become min_by/max_by over the (struct-composite) sort key — the
    *    per-group top-1 runs inside partial aggregation, no window, no
    *    extra shuffle. Rejected loudly without a $sort: FerretDB-style
    *    "positional first" is undefined under parallel scan.
    *    TIE CONTRACT: when the $sort key is NOT unique within a group,
    *    min_by/max_by picks an arbitrary row among the equal-key ties
    *    (stable across no re-ordering — partial-merge order decides);
    *    the returned value is always drawn from SOME tied row, never a
    *    mix. Supply a unique (composite) sort key for a deterministic
    *    answer — same stance as the $addToSet canonical-order choice.
    *  - $push with a prior $sort collects (key, value) pairs and
    *    sort_array's them per group (deterministic); without one it is
    *    plain collect_list — Mongo itself leaves the order unspecified
    *    once a collection is sharded, and so do we.
    *  - $addToSet is array_sort(collect_set(...)): Mongo specifies NO
    *    set order, so the engine picks the canonical (sorted) one —
    *    deterministic across runs and partitionings.
    */
  private def accumulator(node: JsonNode, metaCol: Column,
      cur: DataFrame, sortKeys: Seq[(Column, Boolean)],
      shared: Option[MqlFilter.JsonResolver] = None): Column = {
    require(node.isObject, s"accumulator must be an object: $node")
    val e = node.properties().asScala.head
    lazy val operand: Column =
      if (e.getValue.isNumber && e.getKey == "$sum") {
        val v = e.getValue
        if (v.isIntegralNumber) lit(v.asLong()) else lit(v.asDouble())
      } else valueExprWith(e.getValue, metaCol, cur, shared)
    // composite sort key for the order-sensitive accumulators
    lazy val (orderKey, orderDesc) = {
      require(sortKeys.nonEmpty,
        s"${e.getKey} requires a prior $$sort stage to define document " +
          "order (input order is undefined under parallel scan)")
      val dirs = sortKeys.map(_._2).distinct
      require(dirs.size == 1,
        s"${e.getKey} requires a uniform-direction $$sort (all ascending " +
          "or all descending) — mixed directions have no single " +
          "min_by/sort_array key")
      val k = if (sortKeys.size == 1) sortKeys.head._1
        else struct(sortKeys.map(_._1): _*)
      (k, dirs.head)
    }
    e.getKey match {
      case "$sum" => sum(operand)
      case "$avg" => avg(operand)
      case "$min" => min(operand)
      case "$max" => max(operand)
      case "$count" =>
        require(e.getValue.isObject && e.getValue.isEmpty,
          s"$$count accumulator takes an empty document, got: ${e.getValue}")
        count(lit(1))
      case "$first" =>
        if (orderDesc) max_by(operand, orderKey)
        else min_by(operand, orderKey)
      case "$last" =>
        if (orderDesc) min_by(operand, orderKey)
        else max_by(operand, orderKey)
      case "$push" =>
        if (sortKeys.isEmpty) collect_list(operand)
        else transform(
          sort_array(collect_list(struct(orderKey.as("k"),
            operand.as("v"))), asc = !orderDesc),
          x => x.getField("v"))
      case "$addToSet" => array_sort(collect_set(operand))
      // Mongo 5.2 N-accumulators. $topN/$bottomN carry their OWN
      // sortBy (independent of any pipeline $sort); $firstN/$lastN use
      // the pipeline's document order like $first/$last. All four ride
      // the sorted-struct device — collect, sort by (key, value)
      // (deterministic tie-break both engines agree on), slice from the
      // matching end, project the outputs. Group-sized buffers — the
      // Mongo accumulator contract; bounded-group data only (the same
      // caveat as $push).
      case "$topN" | "$bottomN" =>
        val v = e.getValue
        require(v.isObject && v.has("n") && v.has("sortBy") &&
          v.has("output"),
          s"${e.getKey} needs {n, sortBy, output}: $v")
        val n = v.get("n").asInt()
        require(n > 0, s"${e.getKey}.n must be positive")
        val out = valueExpr(v.get("output"), metaCol, cur)
        val pairs = v.get("sortBy").properties().asScala.toSeq
          .flatMap { f =>
            require(f.getValue.isIntegralNumber &&
              math.abs(f.getValue.asInt()) == 1,
              s"${e.getKey} sortBy direction must be 1 or -1: " +
                s"${f.getKey}: ${f.getValue}")
            val desc = f.getValue.asInt() < 0
            sortBases(f.getKey, cur, metaCol).map(b => (b, desc))
          }
        require(pairs.nonEmpty, s"${e.getKey}.sortBy must be non-empty")
        val dirs = pairs.map(_._2).distinct
        require(dirs.size == 1, s"${e.getKey} requires a uniform-" +
          "direction sortBy (no single sort_array key otherwise)")
        val k = if (pairs.size == 1) pairs.head._1
          else struct(pairs.map(_._1): _*)
        val sorted = sort_array(
          collect_list(struct(k.as("k"), out.as("v"))),
          asc = !dirs.head)
        val sliced =
          if (e.getKey == "$topN") slice(sorted, lit(1), lit(n))
          else slice(sorted,
            greatest(size(sorted) - (n - 1), lit(1)), lit(n))
        transform(sliced, x => x.getField("v"))
      case "$firstN" | "$lastN" =>
        val v = e.getValue
        require(v.isObject && v.has("n") && v.has("input"),
          s"${e.getKey} needs {n, input}: $v")
        val n = v.get("n").asInt()
        require(n > 0, s"${e.getKey}.n must be positive")
        val out = valueExpr(v.get("input"), metaCol, cur)
        val sorted = sort_array(
          collect_list(struct(orderKey.as("k"), out.as("v"))),
          asc = !orderDesc)
        val sliced =
          if (e.getKey == "$firstN") slice(sorted, lit(1), lit(n))
          else slice(sorted,
            greatest(size(sorted) - (n - 1), lit(1)), lit(n))
        transform(sliced, x => x.getField("v"))
      // Mongo 5.2 $minN/$maxN: the n smallest/largest VALUES (not
      // docs) — the sorted-collect device on the value itself; Mongo
      // skips nulls (collect_list does too)
      case "$minN" | "$maxN" =>
        val v = e.getValue
        require(v.isObject && v.has("n") && v.has("input"),
          s"${e.getKey} needs {n, input}: $v")
        val n = v.get("n").asInt()
        require(n > 0, s"${e.getKey}.n must be positive")
        val vals = sort_array(
          collect_list(valueExpr(v.get("input"), metaCol, cur)),
          asc = e.getKey == "$minN")
        slice(vals, lit(1), lit(n))
      // Mongo 5.2 $top/$bottom: $topN/$bottomN with n = 1, unwrapped —
      // min_by/max_by on the accumulator's OWN sortBy (no collect)
      case "$top" | "$bottom" =>
        val v = e.getValue
        require(v.isObject && v.has("sortBy") && v.has("output"),
          s"${e.getKey} needs {sortBy, output}: $v")
        val out = valueExpr(v.get("output"), metaCol, cur)
        val pairs = v.get("sortBy").properties().asScala.toSeq
          .flatMap { f =>
            require(f.getValue.isIntegralNumber &&
              math.abs(f.getValue.asInt()) == 1,
              s"${e.getKey} sortBy direction must be 1 or -1: " +
                s"${f.getKey}: ${f.getValue}")
            val desc = f.getValue.asInt() < 0
            sortBases(f.getKey, cur, metaCol).map(b => (b, desc))
          }
        require(pairs.nonEmpty, s"${e.getKey}.sortBy must be non-empty")
        val dirs = pairs.map(_._2).distinct
        require(dirs.size == 1, s"${e.getKey} requires a uniform-" +
          "direction sortBy (no single min_by/max_by key otherwise)")
        val k = if (pairs.size == 1) pairs.head._1
          else struct(pairs.map(_._1): _*)
        val descSort = dirs.head
        // $top = first in sort order (asc → min key, desc → max);
        // $bottom = last (the mirror)
        if ((e.getKey == "$top") == !descSort) min_by(out, k)
        else max_by(out, k)
      // Mongo 7.0 $median/$percentile GROUP accumulators — the same
      // exact-interpolation contract as their window twins (Mongo
      // mandates method "approximate"; this engine's exact percentile
      // is the correctness superset); gates use dyadic p fractions so
      // (n−1)·p interpolation is float-exact on both engines
      case "$median" =>
        val v = e.getValue
        require(v.isObject && v.has("input"),
          s"$$median needs {input}: $v")
        median(valueExpr(v.get("input"), metaCol, cur).cast("double"))
      case "$percentile" =>
        val v = e.getValue
        require(v.isObject && v.has("input") && v.has("p"),
          s"$$percentile needs {input, p}: $v")
        val pN = v.get("p")
        require(pN.isArray && !pN.isEmpty &&
          pN.elements().asScala.forall(x =>
            x.isNumber && x.asDouble() >= 0 && x.asDouble() <= 1),
          s"$$percentile needs p: [0..1 fractions]: $v")
        val ps = pN.elements().asScala.toSeq.map(_.asDouble())
        percentile(valueExpr(v.get("input"), metaCol, cur)
          .cast("double"), typedLit(ps))
      // Mongo's population/sample standard deviation accumulators. The
      // underlying parallel merge order is engine-defined, so the result
      // is exact only to ~1 ulp of summation order — gated queries
      // $round the output (the double-compare stance quantile gates take
      // with integer cents; stddev has no integer form).
      case "$stdDevPop" => stddev_pop(operand.cast("double"))
      case "$stdDevSamp" => stddev_samp(operand.cast("double"))
      case other =>
        throw new IllegalArgumentException(s"unsupported accumulator: $other")
    }
  }

  /** Mongo `timezone` option → signed offset SECONDS, for the fixed-
    * offset forms: "+05:30", "-08:00", "+0530", "+05", "UTC", "Z" are
    * pure integer shifts of the epoch — no DST, no zone-rules table,
    * engine-exact on both sides of the oracle. Named region ids route
    * through [[tzSpecOf]] instead (r15 — the baked-ZoneRules device);
    * this parser raises on anything that is not a fixed offset. */
  private[filter] def tzOffsetSeconds(tz: String): Long = {
    val Off = "^([+-])(\\d{2})(?::?(\\d{2}))?$".r
    tz match {
      case "UTC" | "Z" => 0L
      case Off(sgn, hh, mm) =>
        val h = hh.toInt
        val m = Option(mm).map(_.toInt).getOrElse(0)
        // ISO-8601 offset envelope is ±18:00 TOTAL — +18:30 is out
        require(m < 60 && (h < 18 || (h == 18 && m == 0)),
          s"invalid fixed timezone offset: $tz")
        (if (sgn == "-") -1L else 1L) * (h * 3600L + m * 60L)
      case other => throw new IllegalArgumentException(
        s"'$other' is not a fixed timezone offset " +
          "(+HH:MM / +HHMM / +HH / UTC / Z)")
    }
  }

  /** A resolved `timezone` option: the wall-clock frame a date
    * operator runs in. Fixed offsets stay on the r14 integer-shift
    * path (identical plans); NAMED zones (r15) carry a baked
    * [[graft.expr.TzTable]] and shift per-instant through native
    * binary-search expressions. `toInstant`'s `pref` is the base
    * instant's offset for java.time's overlap rule (None → earlier
    * instant). */
  private[filter] sealed trait TzSpec {
    def isZero: Boolean
    /** epoch seconds → local-frame seconds */
    def toLocal(secs: Column): Column
    /** local-frame seconds → epoch seconds */
    def toInstant(localSecs: Column, pref: Option[Column]): Column
    /** offset in force at an instant (seconds), as a column */
    def offsetAt(secs: Column): Column
    /** day-and-larger units are civil (DST-aware) only when offsets
      * can move; fixed frames keep the pure-seconds fast path */
    def civilDays: Boolean = false
  }
  private[filter] case object UtcTz extends TzSpec {
    def isZero = true
    def toLocal(secs: Column): Column = secs
    def toInstant(l: Column, p: Option[Column]): Column = l
    def offsetAt(secs: Column): Column = lit(0L)
  }
  private[filter] final case class FixedTz(off: Long) extends TzSpec {
    def isZero = false
    def toLocal(secs: Column): Column = secs + lit(off)
    def toInstant(l: Column, p: Option[Column]): Column = l - lit(off)
    def offsetAt(secs: Column): Column = lit(off)
  }
  private[filter] final case class NamedTz(table: graft.expr.TzTable)
      extends TzSpec {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    def isZero = false
    def toLocal(secs: Column): Column = secs + offsetAt(secs)
    def toInstant(l: Column, p: Option[Column]): Column =
      toCol(graft.expr.ZoneLocalToInstantExpr(toExpr(l),
        toExpr(p.getOrElse(lit(Long.MinValue))), table))
    def offsetAt(secs: Column): Column =
      toCol(graft.expr.ZoneOffsetAtExpr(toExpr(secs), table))
    override def civilDays: Boolean = true
  }

  /** The `timezone` member of a date-operator document, resolved
    * (UtcTz when absent). The member must be a literal string — a
    * column-valued timezone cannot be validated statically. Fixed
    * offsets parse first; anything else must be a region id the JVM's
    * tzdata knows (java.time raises with its own message otherwise). */
  private def tzSpecOf(v: JsonNode): TzSpec =
    Option(v.get("timezone")).map { n =>
      require(n.isTextual, s"timezone must be a literal string: $n")
      val tz = n.asText()
      try {
        tzOffsetSeconds(tz) match {
          case 0L => UtcTz
          case o => FixedTz(o)
        }
      } catch {
        case _: IllegalArgumentException if tz.contains("/") =>
          try NamedTz(graft.expr.TzTable.of(tz))
          catch {
            case e: java.time.DateTimeException =>
              throw new IllegalArgumentException(
                s"unknown timezone region id '$tz': ${e.getMessage}", e)
          }
        case e: IllegalArgumentException => throw new
            IllegalArgumentException(e.getMessage + "; named region " +
              "ids must contain '/' (America/New_York)", e)
      }
    }.getOrElse(UtcTz)

  /** Mongo $dateToString format → Spark DateTimeFormatter pattern.
    * Specifier coverage is the Mongo set this engine supports; literal
    * runs are single-quoted so pattern-letter characters in literals
    * (the 'T' of ISO-8601) pass through verbatim. Unknown specifiers
    * fail loudly rather than render garbage. */
  private[filter] def mongoDateFormat(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      out ++= "'" + lit.toString.replace("'", "''") + "'"
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt(i) == '%') {
        require(i + 1 < fmt.length, s"dangling %% in date format: $fmt")
        val spec = fmt(i + 1) match {
          case 'Y' => "yyyy"
          case 'm' => "MM"
          case 'd' => "dd"
          case 'H' => "HH"
          case 'M' => "mm"
          case 'S' => "ss"
          case 'L' => "SSS"
          case 'j' => "DDD"
          case 'Z' => "xx"
          case '%' => null // literal percent
          case other => throw new IllegalArgumentException(
            s"unsupported $$dateToString specifier %$other in: $fmt")
        }
        if (spec == null) lit += '%' else { flush(); out ++= spec }
        i += 2
      } else { lit += fmt(i); i += 1 }
    }
    flush()
    out.toString
  }

  /** Field resolver delegating to the typed view for real columns (the
    * post-$unwind element, post-$group outputs) and to the JSON metadata
    * view for everything else. */
  private final class HybridResolver(
      real: Set[String],
      typed: MqlFilter.TypedResolver,
      json: MqlFilter.JsonResolver) extends MqlFilter.FieldResolver {
    override private[filter] def jsonMeta: Option[Column] = json.jsonMeta
    override private[filter] def rebindJson(parsed: Column):
        (MqlFilter.FieldResolver, MqlFilter.JsonResolver) = {
      val (_, jr) = json.rebindJson(parsed)
      (new HybridResolver(real, typed, jr), jr)
    }
    private def pick(f: String): MqlFilter.FieldResolver =
      if (real(f)) typed else json
    def num(f: String): Column = pick(f).num(f)
    def intNum(f: String): Column = pick(f).intNum(f)
    def ts(f: String): Column = pick(f).ts(f)
    def str(f: String): Column = pick(f).str(f)
    def bool(f: String): Column = pick(f).bool(f)
    def arr(f: String): Column = pick(f).arr(f)
    def varr(f: String): Column = pick(f).varr(f)
    def exists(f: String): Column = pick(f).exists(f)
    def typeName(f: String): Column = pick(f).typeName(f)
  }
}
