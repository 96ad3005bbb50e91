package graft.filter

import graft.SparkTestBase
import graft.api.{Data, KaerSession}
import graft.embed.HashingEmbedder
import org.apache.spark.sql.functions._

/** Mongo aggregation-pipeline translator: stage semantics on a small
  * metadata corpus, plus the reference's own internal pipeline shape
  * (`[{$sort: {_m_id: 1}}, {$limit: 1}]`, db/db.go:146-148) through the
  * public Collection.aggregate surface. */
class MqlPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, """{"grp": "a", "v": 10}"""),
    (2L, """{"grp": "a", "v": 20}"""),
    (3L, """{"grp": "b", "v": 5}"""),
    (4L, """{"grp": "b", "v": 7}"""),
    (5L, """{"grp": "c", "v": 100}""")
  ).toDF("id", "meta")

  private def run(pipeline: String) =
    MqlPipeline.aggregate(df, col("meta"), pipeline)

  test("$meta textScore: tf-sum score, descending $meta sort, " +
      "requires a preceding $text, non-textScore $meta is loud") {
    val docs = Seq(
      (1L, "vector vector hash other words here", """{"k": 1}"""),
      (2L, "table only once", """{"k": 2}"""),
      (3L, "nothing relevant at all", """{"k": 3}"""),
      (4L, "vector hash table vector", """{"k": 4}""")
    ).toDF("doc_id", "text", "meta")
    val got = MqlPipeline.aggregate(docs, col("meta"),
      """[
        | {"$match": {"$text": {"$search": "vector hash table"}}},
        | {"$addFields": {"score": {"$meta": "textScore"}}},
        | {"$sort": {"score": {"$meta": "textScore"}, "doc_id": 1}},
        | {"$project": {"doc_id": 1, "score": 1}}
        |]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 4: 4 hits; doc 1: 3 hits; doc 2: 1; doc 3 filtered out
    assert(got == Seq((4L, 4L), (1L, 3L), (2L, 1L)), got.mkString(","))
    // $meta without a preceding $text: loud (Mongo contract)
    val e1 = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(docs, col("meta"),
        """[{"$addFields": {"score": {"$meta": "textScore"}}}]""")
        .collect()
    }
    assert(e1.getMessage.contains("$text"), e1.getMessage)
    // unsupported $meta values: loud
    val e2 = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(docs, col("meta"),
        """[
          | {"$match": {"$text": {"$search": "vector"}}},
          | {"$addFields": {"s": {"$meta": "indexKey"}}}
          |]""".stripMargin).collect()
    }
    assert(e2.getMessage.contains("textScore"), e2.getMessage)
  }

  test("$match -> $group -> post-group $match -> $sort") {
    val got = run(
      """[
        | {"$match": {"v": {"$lt": 100}}},
        | {"$group": {"_id": "$grp",
        |   "n": {"$sum": 1}, "total": {"$sum": {"$toLong": "$v"}},
        |   "top": {"$max": {"$toLong": "$v"}}}},
        | {"$match": {"n": {"$gte": 2}}},
        | {"$sort": {"total": -1}}
        |]""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("a", 2L, 30L, 20L), ("b", 2L, 12L, 7L)))
  }

  test("$expr inside pipeline $match — pre-group (metadata views) and " +
      "post-group (real typed columns)") {
    // pre-group: v > v/2 + 6  ⇔  v > 12
    val pre = run(
      """[
        | {"$match": {"$expr": {"$gt": ["$v",
        |   {"$add": [{"$divide": ["$v", 2]}, 6]}]}}},
        | {"$sort": {"id": 1}},
        | {"$project": {"id": {"$toLong": "$id"}}}
        |]""".stripMargin)
    // post-group: the $expr refs resolve through the TypedResolver
    val post = run(
      """[
        | {"$group": {"_id": "$grp", "n": {"$sum": 1},
        |   "total": {"$sum": {"$toLong": "$v"}}}},
        | {"$match": {"$expr": {"$gte": ["$total",
        |   {"$multiply": ["$n", 10]}]}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(run("""[{"$match": {"$expr": {"$gt": ["$v", 12]}}}]""")
      .count() == 2) // v=20, v=100
    assert(pre.collect().map(_.getLong(0)).toSeq == Seq(2L, 5L))
    assert(post == Seq("a", "c")) // a: 30≥20; b: 12<20; c: 100≥10
  }

  test("$group with _id null aggregates the whole input") {
    val got = run(
      """[{"$group": {"_id": null, "n": {"$sum": 1},
        |  "avg_v": {"$avg": {"$toLong": "$v"}}}}]""".stripMargin)
      .collect()
    assert(got.length == 1 && got(0).isNullAt(0) &&
      got(0).getLong(1) == 5L && got(0).getDouble(2) == 28.4)
  }

  test("$sort on real columns, $skip, $limit, $project, $count") {
    val ids = run(
      """[{"$sort": {"id": -1}}, {"$skip": 1}, {"$limit": 2},
        |  {"$project": {"id": 1, "grp": 1}}]""".stripMargin)
    assert(ids.columns.toSeq == Seq("id", "grp"))
    assert(ids.collect().map(_.getLong(0)).toSeq == Seq(4L, 3L))
    val cnt = run("""[{"$match": {"grp": "b"}}, {"$count": "n_b"}]""")
    assert(cnt.columns.toSeq == Seq("n_b") &&
      cnt.head().getLong(0) == 2L)
  }

  test("$unwind fans out array elements; later stages see the real column") {
    val arr = Seq(
      (1L, """{"tags": ["x", "y"], "v": 1}"""),
      (2L, """{"tags": ["y"], "v": 2}"""),
      (3L, """{"v": 3}""") // no array -> dropped by explode (Mongo parity)
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(arr, col("meta"),
      """[{"$unwind": "$tags"},
        |  {"$group": {"_id": "$tags", "n": {"$sum": 1}}},
        |  {"$sort": {"_id": 1}}]""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("x", 1L), ("y", 2L)))
  }

  test("$match after $unwind sees the unwound element, not the array") {
    val arr = Seq(
      (1L, """{"tags": ["x", "y"]}"""),
      (2L, """{"tags": ["y"]}""")
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(arr, col("meta"),
      """[{"$unwind": "$tags"}, {"$match": {"tags": "y"}},
        |  {"$group": {"_id": "$tags", "n": {"$sum": 1}}}]""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("y", 2L)))
  }

  test("empty input: $group(_id null) and $count emit NO document (Mongo parity)") {
    assert(run(
      """[{"$match": {"v": {"$gt": 100000}}},
        |  {"$group": {"_id": null, "n": {"$sum": 1}}}]""".stripMargin)
      .count() == 0)
    assert(run(
      """[{"$match": {"v": {"$gt": 100000}}}, {"$count": "n"}]""")
      .count() == 0)
  }

  test("exclusion $project drops columns; mixing include/exclude raises") {
    val got = run(
      """[{"$group": {"_id": "$grp", "n": {"$sum": 1},
        |   "t": {"$sum": {"$toLong": "$v"}}}},
        |  {"$project": {"t": 0}}, {"$sort": {"_id": 1}}]""".stripMargin)
    assert(got.columns.toSeq == Seq("_id", "n"))
    intercept[IllegalArgumentException] {
      run("""[{"$project": {"grp": 1, "v": 0}}]""")
    }
  }

  test("$project excludes METADATA fields (dotted paths) via JSON rewrite") {
    val nested = Seq(
      (1L, """{"keep": "a", "info": {"x": 1, "y": 2}, "drop_me": true}"""),
      (2L, """{"keep": "b", "info": {"y": 5}}"""),
      (3L, """{"keep": "c"}""") // no info sub-doc: dotted removal no-ops
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(nested, col("meta"),
      """[{"$project": {"drop_me": 0, "info.x": 0}},
        |  {"$addFields": {"doc": "$$ROOT",
        |    "x_after": {"$ifNull": [{"$toLong": "$info.x"}, -1]}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "doc": 1, "x_after": 1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq
    assert(got == Seq(
      (1L, """{"keep":"a","info":{"y":2}}""", -1.0),
      (2L, """{"keep":"b","info":{"y":5}}""", -1.0),
      (3L, """{"keep":"c"}""", -1.0)))
    // mixed real-column + metadata exclusion in one stage
    val mixed = MqlPipeline.aggregate(nested, col("meta"),
      """[{"$project": {"id": 0, "drop_me": 0}},
        |  {"$addFields": {"doc": "$$ROOT"}}]""".stripMargin)
    assert(!mixed.columns.contains("id"))
    assert(mixed.orderBy("doc").head().getString(1)
      == """{"keep":"a","info":{"x":1,"y":2}}""")
  }

  test("$replaceRoot document form composes a new root from expressions") {
    val got = run(
      """[
        | {"$replaceRoot": {"newRoot": {
        |   "g": {"$toUpper": "$grp"},
        |   "v10": {"$multiply": [{"$toLong": "$v"}, 10]}}}},
        | {"$match": {"v10": {"$gte": 100}}},
        | {"$sort": {"v10": 1}},
        | {"$project": {"g": 1, "v10": {"$toLong": "$v10"}}}
        |]""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("A", 100L), ("A", 200L), ("C", 1000L)))
    intercept[IllegalArgumentException] { // empty document root
      run("""[{"$replaceRoot": {"newRoot": {}}}]""")
    }
  }

  test("$replaceWith is exactly $replaceRoot's newRoot form (r17)") {
    def norm(pipe: String) = run(pipe).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaRoot = norm(
      """[
        | {"$replaceRoot": {"newRoot": {
        |   "g": {"$toUpper": "$grp"},
        |   "v10": {"$multiply": [{"$toLong": "$v"}, 10]}}}},
        | {"$sort": {"v10": 1}},
        | {"$project": {"g": 1, "v10": {"$toLong": "$v10"}}}
        |]""".stripMargin)
    val viaWith = norm(
      """[
        | {"$replaceWith": {
        |   "g": {"$toUpper": "$grp"},
        |   "v10": {"$multiply": [{"$toLong": "$v"}, 10]}}},
        | {"$sort": {"v10": 1}},
        | {"$project": {"g": 1, "v10": {"$toLong": "$v10"}}}
        |]""".stripMargin)
    assert(viaRoot == viaWith && viaWith.nonEmpty)
    intercept[IllegalArgumentException] { // empty document root
      run("""[{"$replaceWith": {}}]""")
    }
  }

  test("$expMovingAvg (r17): exact integer-micro N-form recurrence, " +
      "per partition in sort order; brackets loud") {
    val docs = Seq(
      (1L, """{"g": "a", "k": 1, "v": 4}"""),
      (2L, """{"g": "a", "k": 2, "v": 8}"""),
      (3L, """{"g": "a", "k": 3, "v": -3}"""),
      (4L, """{"g": "b", "k": 1, "v": 10}""")
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(docs, col("meta"),
      """[
        | {"$setWindowFields": {"partitionBy": "$g",
        |   "sortBy": {"k": 1},
        |   "output": {"ema": {"$expMovingAvg": {
        |     "input": {"$toLong": "$v"}, "N": 3}}}}},
        | {"$project": {"id": 1, "ema": 1}},
        | {"$sort": {"id": 1}}
        |]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // N=3 → s1 = x1·1e6; si = floor((2xi·1e6 + 2s)/4):
    // a: 4e6; (16e6+8e6)/4 = 6e6; (-6e6+12e6)/4 = 1.5e6. b: 10e6.
    assert(got == Seq((1L, 4000000L), (2L, 6000000L),
      (3L, 1500000L), (4L, 10000000L)), got.mkString(","))
    // the ALPHA form (r18): alpha = 0.5 → A = 500000, s = floor((A·x·
    // 1e6 + (1e6−A)·s)/1e6) — a: 4e6; (4e6+4e6)/2... = floor((0.5·8 +
    // 0.5·4)·1e6) = 6e6; floor((0.5·(−3) + 0.5·6)·1e6) = 1.5e6
    val gotA = MqlPipeline.aggregate(docs, col("meta"),
      """[
        | {"$setWindowFields": {"partitionBy": "$g",
        |   "sortBy": {"k": 1},
        |   "output": {"ema": {"$expMovingAvg": {
        |     "input": {"$toLong": "$v"}, "alpha": 0.5}}}}},
        | {"$project": {"id": 1, "ema": 1}},
        | {"$sort": {"id": 1}}
        |]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotA == Seq((1L, 4000000L), (2L, 6000000L),
      (3L, 1500000L), (4L, 10000000L)), gotA.mkString(","))
    // brackets: only-output, N+alpha together, alpha out of (0,1),
    // alpha finer than ppm, missing sortBy, descending sortBy,
    // fractional input
    for ((pipe, frag) <- Seq(
      ("""[{"$setWindowFields": {"partitionBy": "$g",
         |  "sortBy": {"k": 1}, "output": {
         |    "ema": {"$expMovingAvg": {"input": "$v", "N": 3}},
         |    "n": {"$sum": 1}}}}]""".stripMargin, "only output"),
      ("""[{"$setWindowFields": {"partitionBy": "$g",
         |  "sortBy": {"k": 1}, "output": {
         |    "ema": {"$expMovingAvg": {"input": "$v", "N": 3,
         |      "alpha": 0.5}}}}}]""".stripMargin, "exactly one"),
      ("""[{"$setWindowFields": {"partitionBy": "$g",
         |  "sortBy": {"k": 1}, "output": {
         |    "ema": {"$expMovingAvg": {"input": "$v",
         |      "alpha": 1.0}}}}}]""".stripMargin, "(0, 1)"),
      ("""[{"$setWindowFields": {"partitionBy": "$g",
         |  "sortBy": {"k": 1}, "output": {
         |    "ema": {"$expMovingAvg": {"input": "$v",
         |      "alpha": 0.1234567}}}}}]""".stripMargin,
        "parts-per-million"),
      ("""[{"$setWindowFields": {"partitionBy": "$g",
         |  "output": {"ema": {"$expMovingAvg": {"input": "$v",
         |    "N": 3}}}}}]""".stripMargin, "sortBy"),
      ("""[{"$setWindowFields": {"partitionBy": "$g",
         |  "sortBy": {"k": -1}, "output": {
         |    "ema": {"$expMovingAvg": {"input": "$v",
         |      "N": 3}}}}}]""".stripMargin, "ascending"))) {
      val e = intercept[IllegalArgumentException] {
        MqlPipeline.aggregate(docs, col("meta"), pipe).collect()
      }
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // fractional input raises per row
    val frac = Seq((1L, """{"g": "a", "k": 1, "v": 1.5}"""))
      .toDF("id", "meta")
    val e2 = intercept[Exception] {
      MqlPipeline.aggregate(frac, col("meta"),
        """[{"$setWindowFields": {"partitionBy": "$g",
          |  "sortBy": {"k": 1}, "output": {
          |    "ema": {"$expMovingAvg": {"input": "$v",
          |      "N": 3}}}}}]""".stripMargin).collect()
    }
    assert(e2.getMessage != null)
  }

  test("$vectorSearch (r17): exact cosine top-k with micro scores, " +
      "pre-filter, tie break; ANN/missing options loud") {
    val docs = Seq(
      (1L, """{"vid": 1, "emb": [1.0, 0.0], "grp": "a"}"""),
      (2L, """{"vid": 2, "emb": [0.0, 1.0], "grp": "a"}"""),
      (3L, """{"vid": 3, "emb": [1.0, 1.0], "grp": "a"}"""),
      (4L, """{"vid": 4, "emb": [-1.0, 0.0], "grp": "b"}"""),
      (5L, """{"vid": 5, "emb": [1.0, 0.0], "grp": "a"}"""),
      (6L, """{"vid": 6, "grp": "a"}""") // no vector → skipped
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(docs, col("meta"),
      """[
        | {"$vectorSearch": {"index": "i", "path": "emb",
        |   "queryVector": [1.0, 0.0], "limit": 3,
        |   "exact": true, "similarity": "cosine",
        |   "filter": {"grp": {"$eq": "a"}},
        |   "tieBreakField": "vid"}},
        | {"$project": {"vid": {"$toLong": "$vid"},
        |   "score": {"$meta": "vectorSearchScore"}}},
        | {"$sort": {"score": -1, "vid": 1}}
        |]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // cos vs [1,0]: vid1 = 1 (score 1e6), vid5 = 1 (tie → vid order),
    // vid3 = 1/√2 → cosµ 707107 → score (1e6+707107)/2 = 853553;
    // vid2 (cos 0 → 500000) loses to the top-3; vid4 filtered by grp
    assert(got == Seq((1L, 1000000L), (5L, 1000000L), (3L, 853553L)),
      got.mkString(","))
    // loudness: ANN (exact false/absent), missing similarity or
    // tieBreakField, unknown option, bad $meta name
    for ((pipe, frag) <- Seq(
      ("""[{"$vectorSearch": {"index": "i", "path": "emb",
         |  "queryVector": [1.0, 0.0], "limit": 3,
         |  "similarity": "cosine", "tieBreakField": "vid"}}]"""
        .stripMargin, "exact"),
      ("""[{"$vectorSearch": {"index": "i", "path": "emb",
         |  "queryVector": [1.0, 0.0], "limit": 3, "exact": true,
         |  "tieBreakField": "vid"}}]""".stripMargin, "similarity"),
      ("""[{"$vectorSearch": {"index": "i", "path": "emb",
         |  "queryVector": [1.0, 0.0], "limit": 3, "exact": true,
         |  "similarity": "cosine"}}]""".stripMargin, "tieBreakField"),
      ("""[{"$vectorSearch": {"index": "i", "path": "emb",
         |  "queryVector": [1.0, 0.0], "limit": 3, "exact": true,
         |  "similarity": "cosine", "tieBreakField": "vid",
         |  "banana": 1}}]""".stripMargin, "banana"))) {
      val e = intercept[IllegalArgumentException] {
        MqlPipeline.aggregate(docs, col("meta"), pipe).collect()
      }
      assert(e.getMessage.contains(frag), e.getMessage)
    }
  }

  test("fractional $sum literal is not truncated") {
    val got = run(
      """[{"$group": {"_id": null, "t": {"$sum": 2.5}}}]""")
      .head().getDouble(1)
    assert(got == 12.5) // 5 docs x 2.5
  }

  test("$sort on a string metadata field orders lexicographically") {
    val ids = run(
      """[{"$sort": {"grp": -1, "id": 1}}, {"$limit": 2},
        |  {"$project": {"id": 1}}]""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(5L, 3L)) // grp c first desc, then b (lowest id)
  }

  test("$addFields computes real columns; later stages resolve them typed") {
    val got = run(
      """[
        | {"$addFields": {
        |   "v2": {"$multiply": [{"$toLong": "$v"}, 2]},
        |   "tag": {"$concat": [{"$toUpper": "$grp"}, "-", "$grp"]}}},
        | {"$match": {"v2": {"$gte": 20}}},
        | {"$sort": {"v2": 1}},
        | {"$project": {"tag": 1, "v2": 1}}
        |]""".stripMargin).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    // v=10,20 in grp a -> v2=20,40; b's 10,14 filtered; c's 100 -> 200
    assert(got == Seq(("A-a", 20.0), ("A-a", 40.0), ("C-c", 200.0)))
  }

  test("computed $project mixes inclusion with expressions in entry order") {
    val got = run(
      """[
        | {"$project": {
        |   "id": 1,
        |   "half": {"$divide": [{"$toLong": "$v"}, 2]},
        |   "lbl": {"$toLower": {"$concat": ["G", "$grp"]}}}},
        | {"$sort": {"id": 1}}, {"$limit": 2}
        |]""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 5.0, "ga"), (2L, 10.0, "ga")))
  }

  test("$ifNull falls back on missing fields; arity violations raise") {
    val got = run(
      """[
        | {"$addFields": {
        |   "x": {"$ifNull": [{"$toLong": "$v"}, -1]},
        |   "y": {"$ifNull": [{"$toLong": "$absent"}, -1]}}},
        | {"$sort": {"id": 1}}, {"$limit": 1},
        | {"$project": {"x": 1, "y": 1}}
        |]""".stripMargin).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(got == Seq((10.0, -1.0))) // present field kept, absent -> fallback
    intercept[IllegalArgumentException] { // $switch remains unsupported
      run("""[{"$addFields": {"x": {"$switch": {"branches": []}}}}]""")
    }
    intercept[Exception] { // $subtract needs exactly two operands
      run("""[{"$addFields": {"x": {"$subtract": [1, 2, 3]}}}]""").collect()
    }
  }

  test("$first/$last/$push/$addToSet/$count accumulators after $sort") {
    val dup = Seq(
      (1L, """{"grp": "a", "v": 10}"""),
      (2L, """{"grp": "a", "v": 20}"""),
      (3L, """{"grp": "a", "v": 10}"""), // dup v: $push keeps, $addToSet drops
      (4L, """{"grp": "b", "v": 7}""")
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(dup, col("meta"),
      """[
        | {"$sort": {"id": 1}},
        | {"$group": {"_id": "$grp",
        |   "n": {"$count": {}},
        |   "first_v": {"$first": {"$toLong": "$v"}},
        |   "last_v": {"$last": {"$toLong": "$v"}},
        |   "vs": {"$push": {"$toLong": "$v"}},
        |   "set_v": {"$addToSet": {"$toLong": "$v"}}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Long](4), r.getSeq[Long](5))).toSeq
    assert(got == Seq(
      ("a", 3L, 10L, 10L, Seq(10L, 20L, 10L), Seq(10L, 20L)),
      ("b", 1L, 7L, 7L, Seq(7L), Seq(7L))))
  }

  test("$first/$last honor a DESCENDING $sort (max_by/min_by swap)") {
    val got = run(
      """[
        | {"$sort": {"id": -1}},
        | {"$group": {"_id": "$grp",
        |   "first_id": {"$first": "$id"}, "last_id": {"$last": "$id"}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((("a"), 2L, 1L), ("b", 4L, 3L), ("c", 5L, 5L)))
  }

  test("$first/$last tie contract: non-unique $sort key → some tied row, never a mix") {
    // every group's sort key ("k") is constant, so EVERY row ties: the
    // documented contract is "arbitrary among the ties, drawn from some
    // tied row" — assert set-stability, not a specific winner
    val tied = Seq(
      (1L, """{"grp": "a", "k": 1, "v": 10}"""),
      (2L, """{"grp": "a", "k": 1, "v": 20}"""),
      (3L, """{"grp": "b", "k": 2, "v": 5}"""),
      (4L, """{"grp": "b", "k": 2, "v": 7}""")
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(tied, col("meta"),
      """[
        | {"$sort": {"k": 1}},
        | {"$group": {"_id": "$grp",
        |   "f": {"$first": {"$toLong": "$v"}},
        |   "l": {"$last": {"$toLong": "$v"}}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val legal = Map("a" -> Set(10L, 20L), "b" -> Set(5L, 7L))
    assert(got.map(_._1) == Seq("a", "b"))
    got.foreach { case (g, f, l) =>
      assert(legal(g).contains(f), s"$$first of $g returned non-member $f")
      assert(legal(g).contains(l), s"$$last of $g returned non-member $l")
    }
    // a unique composite key restores determinism (the documented fix)
    val det = MqlPipeline.aggregate(tied, col("meta"),
      """[
        | {"$sort": {"k": 1, "id": 1}},
        | {"$group": {"_id": "$grp",
        |   "f": {"$first": {"$toLong": "$v"}},
        |   "l": {"$last": {"$toLong": "$v"}}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(det == Seq(("a", 10L, 20L), ("b", 5L, 7L)))
  }

  test("$push without $sort collects (order unspecified); $first raises") {
    val arr = run(
      """[{"$group": {"_id": null, "grps": {"$push": "$grp"}}}]""")
      .head().getSeq[String](1)
    assert(arr.sorted == Seq("a", "a", "b", "b", "c"))
    intercept[IllegalArgumentException] { // no defined document order
      run("""[{"$group": {"_id": null, "f": {"$first": "$grp"}}}]""")
    }
    intercept[IllegalArgumentException] { // mixed-direction sort key
      run("""[{"$sort": {"grp": 1, "id": -1}},
        |  {"$group": {"_id": null, "f": {"$first": "$grp"}}}]""".stripMargin)
    }
    intercept[IllegalArgumentException] { // $count takes an empty doc
      run("""[{"$group": {"_id": null, "n": {"$count": "$v"}}}]""")
    }
  }

  test("$sortByCount: frequency table, count desc, ties by _id asc") {
    // grp a and b both have 2 docs — the tie lands in _id order
    val got = run("""[{"$sortByCount": "$grp"}]""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("$bucket: lower-bound labels, default bucket, output accumulators") {
    val got = run(
      """[{"$bucket": {"groupBy": "$v",
        | "boundaries": [0, 10, 50], "default": -1,
        | "output": {"n": {"$sum": 1},
        |   "total": {"$sum": {"$toLong": "$v"}}}}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // v=5,7 -> [0,10); v=10,20 -> [10,50); v=100 -> default
    assert(got == Seq((-1L, 1L, 100L), (0L, 2L, 12L), (10L, 2L, 30L)))
    // absent output -> Mongo's implicit {count: {$sum: 1}}
    val counts = run(
      """[{"$bucket": {"groupBy": "$v",
        | "boundaries": [0, 1000]}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(counts == Seq((0L, 5L)))
    // fractional boundary promotes the label space to double
    val dbl = run(
      """[{"$bucket": {"groupBy": "$v",
        | "boundaries": [0.5, 1000.0]}}]""".stripMargin)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(dbl == Seq((0.5, 5L)))
  }

  test("$bucket: out-of-range without default fails; bad specs raise") {
    val e = intercept[Exception] {
      run("""[{"$bucket": {"groupBy": "$v",
        | "boundaries": [0, 50]}}]""".stripMargin)
        .collect()
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("outside boundaries") ||
      Option(e.getCause).exists(_.getMessage.contains("outside boundaries")))
    intercept[IllegalArgumentException] { // non-ascending
      run("""[{"$bucket": {"groupBy": "$v", "boundaries": [10, 10]}}]""")
    }
    intercept[IllegalArgumentException] { // string boundaries unsupported
      run("""[{"$bucket": {"groupBy": "$grp",
        | "boundaries": ["a", "z"]}}]""".stripMargin)
    }
    intercept[IllegalArgumentException] { // groupBy must be a field path
      run("""[{"$bucket": {"groupBy": 3, "boundaries": [0, 1]}}]""")
    }
  }

  test("$unionWith concatenates a sibling collection, by-name aligned") {
    import spark.implicits._
    val other = Seq(
      (100L, """{"grp": "z", "v": 1}""", "x"),
      (101L, """{"grp": "a", "v": 2}""", "y")
    ).toDF("id", "meta", "extra")
    val resolver: String => (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.Column) = {
      case "other" => (other, col("meta"))
      case n => fail(s"unexpected lookup: $n")
    }
    // short form: every foreign document appends; the current frame's
    // missing "extra" column null-fills (Mongo's absent-field shape)
    val all = MqlPipeline.aggregate(df, col("meta"),
      """[{"$unionWith": "other"}]""", resolver)
    assert(all.count() == 7)
    assert(all.columns.toSet == Set("id", "meta", "extra"))
    assert(all.filter(col("extra").isNull).count() == 5)
    // sub-pipeline form shapes the foreign side first; later stages see
    // the union (group spans both collections)
    val got = MqlPipeline.aggregate(df, col("meta"),
      """[
        | {"$match": {"grp": "a"}},
        | {"$unionWith": {"coll": "other",
        |   "pipeline": [{"$match": {"v": {"$gte": 2}}}]}},
        | {"$group": {"_id": "$grp", "n": {"$sum": 1}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin, resolver)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L)))
    // no resolver -> loud failure, same contract as $lookup
    intercept[IllegalArgumentException] {
      run("""[{"$unionWith": "other"}]""")
    }
  }

  test("$switch: first matching branch wins; default; loud no-match") {
    val got = run(
      """[{"$addFields": {"lbl": {"$switch": {"branches": [
        |    {"case": {"$gte": ["$v", 100]}, "then": "big"},
        |    {"case": {"$gte": ["$v", 10]}, "then": "mid"}],
        |   "default": "small"}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "lbl": 1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "mid"), (2L, "mid"), (3L, "small"),
      (4L, "small"), (5L, "big")))
    // no default + unmatched row → loud (Mongo errors too)
    val e = intercept[Exception] {
      run("""[{"$addFields": {"lbl": {"$switch": {"branches": [
        |    {"case": {"$gte": ["$v", 1000]}, "then": "big"}]}}}},
        |  {"$sort": {"id": 1}}]""".stripMargin).collect()
    }
    assert(e.getMessage.contains("no branch matched"))
    intercept[IllegalArgumentException] { // empty branches
      run("""[{"$addFields": {"x": {"$switch": {"branches": []}}}}]""")
    }
  }

  test("$dateTrunc: calendar units; unsupported options loud") {
    val dts = Seq(
      (1L, """{"d": "2024-03-15T14:45:30"}"""), // Friday
      (2L, """{"d": "2024-03-18T00:00:00"}""")  // Monday
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(dts, col("meta"),
      """[{"$addFields": {
        |   "wk": {"$dateToString": {"format": "%Y-%m-%d",
        |     "date": {"$dateTrunc": {"date": "$d", "unit": "week"}}}},
        |   "mo": {"$dateToString": {"format": "%Y-%m-%d",
        |     "date": {"$dateTrunc": {"date": "$d", "unit": "month"}}}},
        |   "hr": {"$dateToString": {"format": "%Y-%m-%dT%H:%M:%S",
        |     "date": {"$dateTrunc": {"date": "$d", "unit": "hour"}}}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "wk": 1, "mo": 1, "hr": 1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    // weeks start SUNDAY (Mongo's documented startOfWeek default —
    // r15 fixed the Monday/ISO divergence shipped earlier): Fri 3/15
    // → Sun 3/10; Mon 3/18 → Sun 3/17
    assert(got == Seq(
      (1L, "2024-03-10", "2024-03-01", "2024-03-15T14:00:00"),
      (2L, "2024-03-17", "2024-03-01", "2024-03-18T00:00:00")))
    // binSize bins anchor at 2000-01-01T00:00:00Z (r15): 6-hour bins,
    // a 10-year bin reaching back before the anchor, a monday week
    val binned = MqlPipeline.aggregate(dts, col("meta"),
      """[{"$addFields": {
        |   "h6": {"$dateToString": {"format": "%Y-%m-%dT%H:%M:%S",
        |     "date": {"$dateTrunc":
        |       {"date": "$d", "unit": "hour", "binSize": 6}}}},
        |   "y10": {"$dateToString": {"format": "%Y-%m-%d",
        |     "date": {"$dateTrunc":
        |       {"date": "$d", "unit": "year", "binSize": 10}}}},
        |   "m90": {"$dateToString": {"format": "%Y-%m-%dT%H:%M:%S",
        |     "date": {"$dateTrunc":
        |       {"date": "$d", "unit": "minute", "binSize": 90}}}},
        |   "wmon": {"$dateToString": {"format": "%Y-%m-%d",
        |     "date": {"$dateTrunc": {"date": "$d", "unit": "week",
        |       "startOfWeek": "monday"}}}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"h6": 1, "y10": 1, "m90": 1, "wmon": 1}}]"""
        .stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).toSeq
    // 14:45:30 → 6h bin 12:00; 2024 → decade bin 2020; 90-min bins
    // anchored at midnight-of-2000 (UTC days are multiples of 16
    // bins): 14:45 → 13:30; monday week of Fri 3/15 → Mon 3/11
    assert(binned(0) ==
      ("2024-03-15T12:00:00", "2020-01-01", "2024-03-15T13:30:00",
        "2024-03-11"), binned.toString)
    assert(binned(1) ==
      ("2024-03-18T00:00:00", "2020-01-01", "2024-03-18T00:00:00",
        "2024-03-18"), binned.toString)
    intercept[IllegalArgumentException] { // unknown unit
      MqlPipeline.aggregate(dts, col("meta"),
        """[{"$addFields": {"x": {"$dateTrunc":
          |  {"date": "$d", "unit": "fortnight"}}}}]""".stripMargin)
    }
    // week bins wider than 1: loud (anchor direction not pinnable)
    val wb = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(dts, col("meta"),
        """[{"$addFields": {"x": {"$dateTrunc":
          |  {"date": "$d", "unit": "week", "binSize": 2}}}}]"""
          .stripMargin)
    }
    assert(wb.getMessage.contains("binSize"), wb.getMessage)
    // startOfWeek off-unit: loud
    intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(dts, col("meta"),
        """[{"$addFields": {"x": {"$dateTrunc":
          |  {"date": "$d", "unit": "day",
          |   "startOfWeek": "monday"}}}}]""".stripMargin)
    }
  }

  test("mongoDateFormat: specifiers map, literals quote, unknown loud") {
    assert(MqlPipeline.mongoDateFormat("%Y-%m-%d") == "yyyy'-'MM'-'dd")
    assert(MqlPipeline.mongoDateFormat("%Y-%m-%dT%H:%M:%S")
      == "yyyy'-'MM'-'dd'T'HH':'mm':'ss")
    assert(MqlPipeline.mongoDateFormat("%H%%") == "HH'%'")
    intercept[IllegalArgumentException] {
      MqlPipeline.mongoDateFormat("%Q")
    }
    intercept[IllegalArgumentException] {
      MqlPipeline.mongoDateFormat("dangling%")
    }
  }

  test("$merge: pipeline output keyed-merged into a sibling frame " +
      "(replace/insert), modes validated loudly") {
    val target = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .withColumn("meta", to_json(struct(col("k"))))
    val src = Seq((2L, 200L), (3L, 30L)).toDF("k", "v")
      .withColumn("meta", to_json(struct(col("k"))))
    val resolver: String => (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.Column) = {
      case "tgt" => (target, col("meta"))
      case n => fail(s"unexpected lookup: $n")
    }
    val got = MqlPipeline.aggregate(src, col("meta"),
      """[{"$merge": {"into": "tgt", "on": "k",
        |   "whenMatched": "replace", "whenNotMatched": "insert"}}]"""
        .stripMargin, resolver)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 200L), (3L, 30L)))
    // whenMatched=fail raises on a matched key (Upsert contract through
    // the stage)
    val e = intercept[Exception] {
      MqlPipeline.aggregate(src, col("meta"),
        """[{"$merge": {"into": "tgt", "on": "k",
          |   "whenMatched": "fail"}}]""".stripMargin, resolver).collect()
    }
    assert(e.getMessage.contains("whenMatched=fail"))
    intercept[IllegalArgumentException] { // on-field must be real
      MqlPipeline.aggregate(src, col("meta"),
        """[{"$merge": {"into": "tgt", "on": "nope"}}]""", resolver)
    }
  }

  test("$size/$arrayElemAt expressions: counts, 0-based + negative " +
      "indexing, out-of-range null, non-array null") {
    val arrs = Seq(
      (1L, """{"tags": ["a", "b", "c"]}"""),
      (2L, """{"tags": ["x"]}"""),
      (3L, """{"tags": "not-an-array"}""")
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(arrs, col("meta"),
      """[{"$addFields": {
        |   "n": {"$size": "$tags"},
        |   "first": {"$arrayElemAt": ["$tags", 0]},
        |   "last": {"$arrayElemAt": ["$tags", -1]},
        |   "oob": {"$arrayElemAt": ["$tags", 5]}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "n": 1, "first": 1, "last": 1,
        |    "oob": 1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2), r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(
      (1L, 3L, "a", "c", null),
      (2L, 1L, "x", "x", null),
      (3L, -1L, null, null, null)))
  }

  test("unsupported stage and accumulator raise") {
    intercept[IllegalArgumentException] { // incomplete $lookup spec
      run("""[{"$lookup": {"from": "other"}}]""")
    }
    intercept[IllegalArgumentException] { // no collection resolver here
      run("""[{"$lookup": {"from": "other", "localField": "a",
        |  "foreignField": "b", "as": "c"}}]""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      run("""[{"$group": {"_id": null, "x": {"$mergeObjects": "$v"}}}]""")
    }
  }

  test("$lookup joins a sibling collection; $unwind flattens the matches") {
    val root = tmpDir("kaer-lookup")
    val k = new KaerSession(spark, root, HashingEmbedder(64))
    val users = k.createCollection("users")
    users.insert(Data()
      .withDocuments(Seq("u1", "u2", "u3"))
      .withMetadatas(Seq(
        Map[String, Any]("uid" -> 1, "name" -> "ann"),
        Map[String, Any]("uid" -> 2, "name" -> "bob"),
        Map[String, Any]("uid" -> 3, "name" -> "cee"))))
    val orders = k.createCollection("orders")
    orders.insert(Data()
      .withDocuments(Seq("o1", "o2", "o3"))
      .withMetadatas(Seq(
        Map[String, Any]("uid" -> 1, "item" -> "x"),
        Map[String, Any]("uid" -> 1, "item" -> "y"),
        Map[String, Any]("uid" -> 3, "item" -> "z"))))
    val joined = k.aggregate("users",
      """[{"$lookup": {"from": "orders", "localField": "uid",
        |    "foreignField": "uid", "as": "user_orders"}},
        |  {"$sort": {"_m_id": 1}}]""".stripMargin)
    val sizes = joined.select(org.apache.spark.sql.functions
        .size(org.apache.spark.sql.functions.col("user_orders")))
      .collect().map(_.getInt(0)).toSeq
    assert(sizes == Seq(2, 0, 1)) // ann 2 orders, bob none, cee 1
    // unwind the embedded docs and roll up per user
    val perUser = k.aggregate("users",
      """[{"$lookup": {"from": "orders", "localField": "uid",
        |    "foreignField": "uid", "as": "user_orders"}},
        |  {"$unwind": "$user_orders"},
        |  {"$group": {"_id": "$name", "n": {"$sum": 1}}},
        |  {"$sort": {"_id": 1}}]""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(perUser == Seq(("ann", 2L), ("cee", 1L)))
  }

  test("$setWindowFields: documentNumber, running sum, shift, " +
      "whole-partition default window") {
    val got = run(
      """[{"$setWindowFields": {
        |   "partitionBy": "$grp",
        |   "sortBy": {"id": 1},
        |   "output": {
        |     "seq": {"$documentNumber": {}},
        |     "run": {"$sum": {"$toLong": "$v"},
        |       "window": {"documents": ["unbounded", "current"]}},
        |     "prev": {"$shift": {"output": "$id", "by": -1,
        |       "default": -99}},
        |     "tot": {"$sum": {"$toLong": "$v"}}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "seq": 1, "run": 1, "prev": 1,
        |    "tot": 1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1, 10L, -99L, 30L), (2L, 2, 30L, 1L, 30L),
      (3L, 1, 5L, -99L, 12L), (4L, 2, 12L, 3L, 12L),
      (5L, 1, 100L, -99L, 100L)))
  }

  test("$setWindowFields N-accumulators (r18): $minN sliding frame, " +
      "$firstN frame order, $bottomN running own-sortBy; guards loud") {
    val df = Seq(
      (1L, """{"g": "a", "k": 1, "v": 5}"""),
      (2L, """{"g": "a", "k": 2, "v": 3}"""),
      (3L, """{"g": "a", "k": 3, "v": 8}"""),
      (4L, """{"g": "a", "k": 4, "v": 1}"""),
      (5L, """{"g": "b", "k": 1, "v": 7}""")
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(df, col("meta"),
      """[{"$setWindowFields": {
        |   "partitionBy": "$g",
        |   "sortBy": {"k": 1},
        |   "output": {
        |     "mn": {"$minN": {"input": {"$toLong": "$v"}, "n": 2},
        |       "window": {"documents": [-1, "current"]}},
        |     "fn": {"$firstN": {"input": {"$toLong": "$v"}, "n": 2},
        |       "window": {"documents": [-2, "current"]}},
        |     "bt": {"$bottomN": {"n": 2, "sortBy": {"v": 1},
        |       "output": {"$toLong": "$v"}},
        |       "window": {"documents": ["unbounded", "current"]}}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "mn": 1, "fn": 1, "bt": 1}}]"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList,
        r.getSeq[Long](2).toList, r.getSeq[Long](3).toList)).toSeq
    assert(got == Seq(
      (1L, List(5L), List(5L), List(5L)),
      (2L, List(3L, 5L), List(5L, 3L), List(3L, 5L)),
      (3L, List(3L, 8L), List(5L, 3L), List(5L, 8L)),
      (4L, List(1L, 8L), List(3L, 8L), List(5L, 8L)),
      (5L, List(7L), List(7L), List(7L))), got.mkString(","))
    // guards: firstN without sortBy, topN mixed sort directions
    for ((pipe, frag) <- Seq(
      ("""[{"$setWindowFields": {"partitionBy": "$g",
         |  "output": {"fn": {"$firstN": {"input": "$v",
         |    "n": 2}}}}}]""".stripMargin, "sortBy"),
      ("""[{"$setWindowFields": {"partitionBy": "$g",
         |  "sortBy": {"k": 1},
         |  "output": {"tp": {"$topN": {"n": 2,
         |    "sortBy": {"v": 1, "k": -1},
         |    "output": "$v"}}}}}]""".stripMargin, "uniform"))) {
      val e = intercept[IllegalArgumentException] {
        MqlPipeline.aggregate(df, col("meta"), pipe).collect()
      }
      assert(e.getMessage.contains(frag), e.getMessage)
    }
  }

  test("$setWindowFields $first/$push/$addToSet/$stdDevPop (r18): " +
      "frame endpoints, frame-order collect, sorted set, moment " +
      "stddev") {
    val df = Seq(
      (1L, """{"g": "a", "k": 1, "v": 5}"""),
      (2L, """{"g": "a", "k": 2, "v": 3}"""),
      (3L, """{"g": "a", "k": 3, "v": 8}"""),
      (4L, """{"g": "a", "k": 4, "v": 1}"""),
      (5L, """{"g": "b", "k": 1, "v": 7}""")
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(df, col("meta"),
      """[{"$setWindowFields": {
        |   "partitionBy": "$g",
        |   "sortBy": {"k": 1},
        |   "output": {
        |     "fs": {"$first": {"$toLong": "$v"},
        |       "window": {"documents": [-1, "current"]}},
        |     "ps": {"$push": {"$toLong": "$v"},
        |       "window": {"documents": [-1, "current"]}},
        |     "st": {"$addToSet": {"$toLong": "$v"},
        |       "window": {"documents": [-2, "current"]}},
        |     "sd": {"$stdDevPop": {"$toLong": "$v"}}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "fs": 1, "ps": 1, "st": 1,
        |    "sd": {"$round": ["$sd", 6]}}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toList, r.getSeq[Long](3).toList,
        r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 5L, List(5L), List(5L), 2.58602),
      (2L, 5L, List(5L, 3L), List(3L, 5L), 2.58602),
      (3L, 3L, List(3L, 8L), List(3L, 5L, 8L), 2.58602),
      (4L, 8L, List(8L, 1L), List(1L, 3L, 8L), 2.58602),
      (5L, 7L, List(7L), List(7L), 0.0)), got.mkString(","))
    // $first/$push without a sortBy stay loud
    val e = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(df, col("meta"),
        """[{"$setWindowFields": {"partitionBy": "$g",
          |  "output": {"fs": {"$first": "$v"}}}}]""".stripMargin)
        .collect()
    }
    assert(e.getMessage.contains("sortBy"), e.getMessage)
  }

  test("$setWindowFields: an output field named like an existing column " +
      "OVERWRITES it (Mongo field semantics), no duplicate ambiguity") {
    // the frame carries a real column "v"; the stage writes "v" — later
    // stages must see exactly one "v", holding the window result, and
    // the window input still reads the PRE-stage value
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "grp", "v")
      .withColumn("meta", to_json(struct(col("grp"))))
    val got = MqlPipeline.aggregate(df, col("meta"),
      """[{"$setWindowFields": {
        |   "partitionBy": "$grp",
        |   "sortBy": {"id": 1},
        |   "output": {"v": {"$sum": "$v"}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "v": 1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 30L), (2L, 30L), (3L, 5L)))
  }

  test("$setWindowFields: $rank leaves gaps on ties, $denseRank none; " +
      "bounded trailing window") {
    val ties = Seq(
      (1L, """{"grp": "a", "v": 10}"""),
      (2L, """{"grp": "a", "v": 10}"""),
      (3L, """{"grp": "a", "v": 20}""")
    ).toDF("id", "meta")
    val got = MqlPipeline.aggregate(ties, col("meta"),
      """[{"$setWindowFields": {
        |   "partitionBy": "$grp",
        |   "sortBy": {"v": -1},
        |   "output": {
        |     "rnk": {"$rank": {}},
        |     "drnk": {"$denseRank": {}}}}},
        |  {"$setWindowFields": {
        |   "partitionBy": "$grp",
        |   "sortBy": {"id": 1},
        |   "output": {
        |     "pair": {"$sum": {"$toLong": "$v"},
        |       "window": {"documents": [-1, 0]}}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "rnk": 1, "drnk": 1, "pair": 1}}
        |]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSeq
    // v desc: id 3 (v=20) rank 1; ids 1,2 (v=10) tie at rank 2 → next
    // would be 4 ($rank gap), denseRank 2 (no gap).
    // pair = this + previous doc's v in id order: 10, 20, 30
    assert(got == Seq((1L, 2, 2, 10L), (2L, 2, 2, 20L), (3L, 1, 1, 30L)))
  }

  test("$setWindowFields rejects rank without sortBy, time-unit and " +
      "descending range windows, unknown operators") {
    val rankNoSort = intercept[IllegalArgumentException] {
      run("""[{"$setWindowFields": {"partitionBy": "$grp",
            |  "output": {"r": {"$rank": {}}}}}]""".stripMargin).collect()
    }
    assert(rankNoSort.getMessage.contains("requires a sortBy"))
    val badUnit = intercept[IllegalArgumentException] {
      run("""[{"$setWindowFields": {"partitionBy": "$grp",
            |  "sortBy": {"id": 1},
            |  "output": {"s": {"$sum": {"$toLong": "$v"},
            |    "window": {"range": [-1, 0], "unit": "fortnight"}}}}}]"""
        .stripMargin).collect()
    }
    assert(badUnit.getMessage.contains("unsupported range-window unit"))
    val descRange = intercept[IllegalArgumentException] {
      run("""[{"$setWindowFields": {"partitionBy": "$grp",
            |  "sortBy": {"id": -1},
            |  "output": {"s": {"$sum": {"$toLong": "$v"},
            |    "window": {"range": [-1, 0]}}}}}]""".stripMargin).collect()
    }
    assert(descRange.getMessage.contains("ASCENDING"))
    // $stdDevPop graduated to a SUPPORTED operator in r18 — the
    // unknown-operator guard needs a name that stays unknown
    val unknown = intercept[IllegalArgumentException] {
      run("""[{"$setWindowFields": {"partitionBy": "$grp",
            |  "sortBy": {"id": 1},
            |  "output": {"x": {"$locfNoSuchOp": "$v"}}}}]""".stripMargin)
        .collect()
    }
    assert(unknown.getMessage.contains("unsupported window operator"))
  }

  test("$setWindowFields range window: value-keyed frame over the " +
      "ascending sortBy, peers included") {
    val got = run(
      """[{"$setWindowFields": {"partitionBy": "$grp",
        |  "sortBy": {"id": 1},
        |  "output": {"s": {"$sum": {"$toLong": "$v"},
        |    "window": {"range": [-1, 0]}}}}},
        | {"$sort": {"id": 1}},
        | {"$project": {"id": 1, "s": 1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 30L), (3L, 5L), (4L, 12L),
      (5L, 100L)))
  }

  test("$fill: locf carries last observed forward, leading null stays; " +
      "value fill; loud errors") {
    val gaps = Seq(
      (1L, """{"grp": "a"}""", null.asInstanceOf[java.lang.Double], "x"),
      (2L, """{"grp": "a"}""", java.lang.Double.valueOf(5.0), null.asInstanceOf[String]),
      (3L, """{"grp": "a"}""", null.asInstanceOf[java.lang.Double], "y"),
      (4L, """{"grp": "b"}""", null.asInstanceOf[java.lang.Double], "z")
    ).toDF("id", "meta", "v", "s")
    val got = MqlPipeline.aggregate(gaps, col("meta"),
      """[{"$fill": {"partitionBy": "$grp", "sortBy": {"id": 1},
        |   "output": {"v": {"method": "locf"},
        |     "s": {"value": "none"}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "v": 1, "s": 1}}]""".stripMargin)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getString(2))).toSeq
    // id 1: leading null in grp a stays null; id 3 carries 5.0 forward;
    // id 4 (grp b) has no prior observation — null
    assert(got == Seq((1L, None, "x"), (2L, Some(5.0), "none"),
      (3L, Some(5.0), "y"), (4L, None, "z")))

    // linear over a FLOAT target: loud integral-only contract (scale
    // to cents/micros first — IEEE division never reaches the oracle)
    val linear = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(gaps, col("meta"),
        """[{"$fill": {"sortBy": {"id": 1},
          |  "output": {"v": {"method": "linear"}}}}]""".stripMargin)
    }
    assert(linear.getMessage.contains("integral"), linear.getMessage)
    val metaTarget = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(gaps, col("meta"),
        """[{"$fill": {"sortBy": {"id": 1},
          |  "output": {"grp": {"value": "g"}}}}]""".stripMargin)
    }
    assert(metaTarget.getMessage.contains("real column"))
    val locfNoSort = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(gaps, col("meta"),
        """[{"$fill": {"output": {"v": {"method": "locf"}}}}]"""
          .stripMargin)
    }
    assert(locfNoSort.getMessage.contains("requires a sortBy"))
  }

  test("$fill linear: integer interpolation between bracketing " +
      "observations; leading/trailing nulls stay; loud descending") {
    val gaps = Seq(
      (0L, """{"grp": "a"}""", null.asInstanceOf[java.lang.Long]),
      (10L, """{"grp": "a"}""", java.lang.Long.valueOf(100L)),
      (14L, """{"grp": "a"}""", null.asInstanceOf[java.lang.Long]),
      (20L, """{"grp": "a"}""", java.lang.Long.valueOf(40L)),
      (25L, """{"grp": "a"}""", null.asInstanceOf[java.lang.Long]),
      (5L, """{"grp": "b"}""", java.lang.Long.valueOf(7L))
    ).toDF("id", "meta", "v")
    val got = MqlPipeline.aggregate(gaps, col("meta"),
      """[{"$fill": {"partitionBy": "$grp", "sortBy": {"id": 1},
        |   "output": {"v": {"method": "linear"}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "v": 1}}]""".stripMargin)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
      .sortBy(_._1)
    // id 14 brackets (10,100)-(20,40): 100 + (40-100)*4/10 = 76 exactly
    // (the cross-multiplied form: (100*6 + 40*4) DIV 10 = 76);
    // id 0 leading and id 25 trailing stay null; grp b untouched
    assert(got == Seq((0L, None), (5L, Some(7L)), (10L, Some(100L)),
      (14L, Some(76L)), (20L, Some(40L)), (25L, None)))
    // descending sortBy is loud (Mongo requires ascending for linear)
    val desc = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(gaps, col("meta"),
        """[{"$fill": {"sortBy": {"id": -1},
          |  "output": {"v": {"method": "linear"}}}}]""".stripMargin)
    }
    assert(desc.getMessage.contains("ascending"), desc.getMessage)
  }

  test("collation: strength 2 folds match + sort case; strength 3 is " +
      "identity; values keep original case; loud edges") {
    val cdf = Seq(
      (1L, """{"k": "Apple", "g": 1}"""),
      (2L, """{"k": "apple", "g": 1}"""),
      (3L, """{"k": "BANANA", "g": 2}"""),
      (4L, """{"k": "banana", "g": 2}"""),
      (5L, """{"k": "cherry", "g": 3}""")
    ).toDF("id", "meta")
    val ci = MqlPipeline.aggregateCollated(cdf, col("meta"),
      """[{"$match": {"k": {"$in": ["APPLE", "Banana"]}}},
        |  {"$sort": {"k": 1, "id": -1}},
        |  {"$project": {"id": 1, "k": "$k"}}]""".stripMargin,
      """{"locale": "en", "strength": 2}""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // case-folded match catches all four; sort by folded k, id desc;
    // ORIGINAL case survives to the output
    assert(ci == Seq((2L, "apple"), (1L, "Apple"),
      (4L, "banana"), (3L, "BANANA")))
    // strength 3 = Mongo default = plain codepoint compare
    val cs = MqlPipeline.aggregateCollated(cdf, col("meta"),
      """[{"$match": {"k": {"$in": ["APPLE", "banana"]}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1}}]""".stripMargin,
      """{"locale": "en", "strength": 3}""")
      .collect().map(_.getLong(0)).toSeq
    assert(cs == Seq(4L))
    // loud: unsupported locale/strength combos, $group under CI, $expr
    // (fr gained strength 3 in r17 — the root case level; UNMEASURED
    // locales like pl stay loud at every strength)
    val loc = intercept[IllegalArgumentException] {
      MqlPipeline.aggregateCollated(cdf, col("meta"),
        """[{"$match": {"k": "x"}}]""", """{"locale": "pl"}""")
    }
    assert(loc.getMessage.contains("locale"), loc.getMessage)
    // Nordic and Turkish locales are supported since r16 (tailoring
    // tables); an unmeasured locale stays loud
    val unknown = intercept[IllegalArgumentException] {
      MqlPipeline.aggregateCollated(cdf, col("meta"),
        """[{"$match": {"k": "x"}}]""",
        """{"locale": "pl", "strength": 1}""")
    }
    assert(unknown.getMessage.contains("locale"), unknown.getMessage)
    val frFold = Seq(
      (1L, """{"k": "déjà"}"""), (2L, """{"k": "DEJA"}"""),
      (3L, """{"k": "dija"}""")
    ).toDF("id", "meta")
    val fr1 = MqlPipeline.aggregateCollated(frFold, col("meta"),
      """[{"$match": {"k": "deja"}}, {"$sort": {"id": 1}},
        |  {"$project": {"id": 1}}]""".stripMargin,
      """{"locale": "fr", "strength": 1}""")
      .collect().map(_.getLong(0)).toSeq
    assert(fr1 == Seq(1L, 2L), fr1.toString)
    val grp = intercept[IllegalArgumentException] {
      MqlPipeline.aggregateCollated(cdf, col("meta"),
        """[{"$group": {"_id": "$k", "n": {"$sum": 1}}}]""",
        """{"locale": "en", "strength": 1}""")
    }
    assert(grp.getMessage.contains("collation"), grp.getMessage)
    val ex = intercept[IllegalArgumentException] {
      MqlPipeline.aggregateCollated(cdf, col("meta"),
        """[{"$match": {"$expr": {"$eq": ["$k", "apple"]}}}]""",
        """{"locale": "en", "strength": 2}""")
    }
    assert(ex.getMessage.contains("$expr"), ex.getMessage)
  }

  test("collation numericOrdering: digit runs compare numerically, " +
      "leading zeros equate, composes with strength 2; long runs loud") {
    val ndf = Seq(
      (1L, """{"k": "item2"}"""), (2L, """{"k": "ITEM10"}"""),
      (3L, """{"k": "item0003"}"""), (4L, """{"k": "item30b"}"""),
      (5L, """{"k": "zeta"}""")
    ).toDF("id", "meta")
    // numeric + CI: item2 < item0003(≡3) < ITEM10 < item30b; the range
    // [item2, item30b) excludes the upper bound and the non-matching
    // prefix "zeta"
    val got = MqlPipeline.aggregateCollated(ndf, col("meta"),
      """[{"$match": {"k": {"$gte": "ITEM2", "$lt": "item30b"}}},
        |  {"$sort": {"k": 1, "id": 1}},
        |  {"$project": {"id": 1, "k": "$k"}}]""".stripMargin,
      """{"locale": "en", "strength": 2, "numericOrdering": true}""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "item2"), (3L, "item0003"), (2L, "ITEM10")),
      got.toString)
    // numericOrdering WITHOUT case-insensitivity (default strength 3):
    // case still distinguishes, numbers still compare numerically
    val cs = MqlPipeline.aggregateCollated(ndf, col("meta"),
      """[{"$match": {"k": {"$gte": "item2", "$lte": "item31"}}},
        |  {"$sort": {"k": 1, "id": 1}},
        |  {"$project": {"id": 1}}]""".stripMargin,
      """{"locale": "en", "numericOrdering": true}""")
      .collect().map(_.getLong(0)).toSeq
    assert(cs == Seq(1L, 3L, 4L), cs.toString) // ITEM10 ≠ item-case
    // the key twins agree (literal side vs column side)
    assert(graft.filter.MqlFilter.numKeyLit("a007b12") ==
      "a" + "0" * 17 + "7b" + "0" * 16 + "12")
    assert(graft.filter.MqlFilter.numKeyLit("00") == "0" * 18)
    // >18-digit runs refuse on the literal side...
    val long = intercept[IllegalArgumentException] {
      graft.filter.MqlFilter.numKeyLit("x1234567890123456789")
    }
    assert(long.getMessage.contains("digit run"), long.getMessage)
    // ...and per row on the column side
    val colLong = intercept[Exception] {
      MqlPipeline.aggregateCollated(
        Seq((1L, """{"k": "v1234567890123456789"}""")).toDF("id", "meta"),
        col("meta"),
        """[{"$match": {"k": {"$gte": "v1"}}},
          |  {"$project": {"id": 1}}]""".stripMargin,
        """{"locale": "en", "numericOrdering": true}""")
        .collect()
    }
    def msgsN(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgsN(t.getCause)
    assert(msgsN(colLong).exists(_.contains("digit run")),
      msgsN(colLong).toString)
  }

  test("$densify: partition bounds fill per-group gaps, full bounds " +
      "span globally, explicit bounds are half-open") {
    val sparse = Seq(
      (1L, """{"m": 1}""", "a", 10L),
      (2L, """{"m": 1}""", "a", 40L),
      (3L, """{"m": 1}""", "b", 20L),
      (4L, """{"m": 1}""", "b", 30L)
    ).toDF("id", "meta", "grp", "v")
    def run(pipe: String) =
      MqlPipeline.aggregate(sparse, col("meta"), pipe)
        .select("grp", "v", "id").collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
    // partition: a spans 10..40 (gaps 20, 30); b spans 20..30 (no gap)
    val part = run(
      """[{"$densify": {"field": "v", "partitionByFields": ["grp"],
        |   "range": {"step": 10, "bounds": "partition"}}}]"""
        .stripMargin)
    assert(part == Seq(("a", 10L, 1L), ("a", 20L, -1L), ("a", 30L, -1L),
      ("a", 40L, 2L), ("b", 20L, 3L), ("b", 30L, 4L)))
    // full: BOTH groups get the global 10..40 grid
    val full = run(
      """[{"$densify": {"field": "v", "partitionByFields": ["grp"],
        |   "range": {"step": 10, "bounds": "full"}}}]""".stripMargin)
    assert(full == Seq(("a", 10L, 1L), ("a", 20L, -1L), ("a", 30L, -1L),
      ("a", 40L, 2L), ("b", 10L, -1L), ("b", 20L, 3L), ("b", 30L, 4L),
      ("b", 40L, -1L)))
    // explicit [0, 30): half-open — 0,10,20 generated where missing
    val explicit = run(
      """[{"$densify": {"field": "v", "partitionByFields": ["grp"],
        |   "range": {"step": 10, "bounds": [0, 30]}}}]""".stripMargin)
    assert(explicit == Seq(("a", 0L, -1L), ("a", 10L, 1L),
      ("a", 20L, -1L), ("a", 40L, 2L),
      ("b", 0L, -1L), ("b", 10L, -1L), ("b", 20L, 3L), ("b", 30L, 4L)))

    val badStep = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(sparse, col("meta"),
        """[{"$densify": {"field": "v",
          |  "range": {"step": 0.5, "bounds": "full"}}}]""".stripMargin)
    }
    assert(badStep.getMessage.contains("positive integer"))
    // a unit now means "TIMESTAMP field" — an integral field refuses
    val unitOnInt = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(sparse, col("meta"),
        """[{"$densify": {"field": "v",
          |  "range": {"step": 1, "bounds": "full", "unit": "hour"}}}]"""
          .stripMargin)
    }
    assert(unitOnInt.getMessage.contains("needs a TIMESTAMP field"))
    // calendar units are supported since r16 — on an integral field
    // they refuse with the TIMESTAMP requirement like any other unit
    val monthUnit = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(sparse, col("meta"),
        """[{"$densify": {"field": "v",
          |  "range": {"step": 1, "bounds": "full", "unit": "month"}}}]"""
          .stripMargin)
    }
    assert(monthUnit.getMessage.contains("needs a TIMESTAMP field"))
  }

  test("$densify with a day unit: per-partition timestamp grids at " +
      "min + k·day, generated rows null-padded") {
    import org.apache.spark.sql.functions.{timestamp_micros, unix_micros}
    val day = 86400000000L
    val t0 = 1700000000000000L
    val ev = Seq(
      ("a", t0, 1L), ("a", t0 + 3 * day, 2L), // gap: +1d, +2d
      ("b", t0 + day, 3L)                     // single point: no gap
    ).toDF("grp", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("meta", to_json(struct(col("event_id"))))
    val got = MqlPipeline.aggregate(ev, col("meta"),
      """[{"$densify": {"field": "ts", "partitionByFields": ["grp"],
        |  "range": {"step": 1, "unit": "day",
        |    "bounds": "partition"}}}]""".stripMargin)
      .select(col("grp"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .orderBy("grp", "us")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq(
      ("a", t0, 1L), ("a", t0 + day, -1L), ("a", t0 + 2 * day, -1L),
      ("a", t0 + 3 * day, 2L), ("b", t0 + day, 3L)))
  }

  test("$densify with a month unit (r16): calendar grid clamps each " +
      "point from the ORIGINAL day-of-month, time-of-day rides, gaps " +
      "generate; quarter/year step by 3/12 months; bad unit loud") {
    import org.apache.spark.sql.functions.{timestamp_micros, unix_micros}
    def usOf(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000L
    // Jan 31 10:30:45 with rows at months 0 and 4 (May 31) — the gaps
    // k=1..3 must clamp to Feb 28 / Mar 31 / Apr 30
    val ev = Seq(
      ("a", usOf("2023-01-31T10:30:45Z"), 1L),
      ("a", usOf("2023-05-31T10:30:45Z"), 2L),
      ("b", usOf("2023-02-15T00:00:00Z"), 3L) // single point: no gap
    ).toDF("grp", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("meta", to_json(struct(col("event_id"))))
    val got = MqlPipeline.aggregate(ev, col("meta"),
      """[{"$densify": {"field": "ts", "partitionByFields": ["grp"],
        |  "range": {"step": 1, "unit": "month",
        |    "bounds": "partition"}}}]""".stripMargin)
      .select(col("grp"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .orderBy("grp", "us")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq(
      ("a", usOf("2023-01-31T10:30:45Z"), 1L),
      ("a", usOf("2023-02-28T10:30:45Z"), -1L),
      ("a", usOf("2023-03-31T10:30:45Z"), -1L),
      ("a", usOf("2023-04-30T10:30:45Z"), -1L),
      ("a", usOf("2023-05-31T10:30:45Z"), 2L),
      ("b", usOf("2023-02-15T00:00:00Z"), 3L)), got.toSeq.toString)
    // quarter: Nov 30 2022 → Feb 28 2023 (clamp) → May 30 (day 30
    // exists in May — NOT a propagation of February's 28)
    val q = Seq(
      ("a", usOf("2022-11-30T06:00:00Z"), 1L),
      ("a", usOf("2023-05-30T06:00:00Z"), 2L)
    ).toDF("grp", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("meta", to_json(struct(col("event_id"))))
    val gotQ = MqlPipeline.aggregate(q, col("meta"),
      """[{"$densify": {"field": "ts", "partitionByFields": ["grp"],
        |  "range": {"step": 1, "unit": "quarter",
        |    "bounds": "partition"}}}]""".stripMargin)
      .select(unix_micros(col("ts")).as("us"))
      .orderBy("us").collect().map(_.getLong(0))
    assert(gotQ.toSeq == Seq(
      usOf("2022-11-30T06:00:00Z"), usOf("2023-02-28T06:00:00Z"),
      usOf("2023-05-30T06:00:00Z")), gotQ.toSeq.toString)
    // unknown unit is loud
    val e = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(ev, col("meta"),
        """[{"$densify": {"field": "ts", "partitionByFields": ["grp"],
          |  "range": {"step": 1, "unit": "fortnight",
          |    "bounds": "partition"}}}]""".stripMargin)
    }
    assert(e.getMessage.contains("unsupported $densify unit"))
    // explicit DATE-literal bounds (r16): [lo, hi) half-open, the grid
    // anchors at lo for every partition regardless of its own rows —
    // day unit from Jan 30, month unit clamping from Jan 31
    val gotB = MqlPipeline.aggregate(ev, col("meta"),
      """[{"$densify": {"field": "ts", "partitionByFields": ["grp"],
        |  "range": {"step": 1, "unit": "day",
        |    "bounds": ["2023-01-30", "2023-02-02T00:00:00"]}}}]"""
        .stripMargin)
      .filter(col("grp") === "b")
      .select(unix_micros(col("ts")).as("us"))
      .orderBy("us").collect().map(_.getLong(0))
    assert(gotB.toSeq == Seq(
      usOf("2023-01-30T00:00:00Z"), usOf("2023-01-31T00:00:00Z"),
      usOf("2023-02-01T00:00:00Z"),       // hi 02-02 EXCLUDED
      usOf("2023-02-15T00:00:00Z")), gotB.toSeq.toString)
    val gotBM = MqlPipeline.aggregate(ev, col("meta"),
      """[{"$densify": {"field": "ts", "partitionByFields": ["grp"],
        |  "range": {"step": 1, "unit": "month",
        |    "bounds": ["2023-01-31T06:00:00", "2023-04-30T06:00:00"]}}}]"""
        .stripMargin)
      .filter(col("grp") === "b")
      .select(unix_micros(col("ts")).as("us"))
      .orderBy("us").collect().map(_.getLong(0))
    assert(gotBM.toSeq == Seq(
      usOf("2023-01-31T06:00:00Z"), usOf("2023-02-15T00:00:00Z"),
      usOf("2023-02-28T06:00:00Z"),
      usOf("2023-03-31T06:00:00Z")), gotBM.toSeq.toString)
    // date-literal bounds without a unit stay loud — the field-type
    // guard fires first (a TIMESTAMP field without a unit is already
    // a shape error before the bounds are even read)
    val noUnit = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(ev, col("meta"),
        """[{"$densify": {"field": "ts",
          |  "range": {"step": 1,
          |    "bounds": ["2023-01-30", "2023-02-02"]}}}]""".stripMargin)
    }
    assert(noUnit.getMessage.contains("must be integral"))
  }

  test("$fill linear over a TIMESTAMP axis (r16): interpolation runs " +
      "on epoch-µs longs — exact integer weights, leading/trailing " +
      "nulls stay null") {
    import org.apache.spark.sql.functions.timestamp_micros
    def usOf(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000L
    val rows = Seq(
      (usOf("2023-01-01T00:00:00Z"), Some(100L)),
      (usOf("2023-01-02T00:00:00Z"), None), // 1/3 of the bracket
      (usOf("2023-01-04T00:00:00Z"), Some(400L)),
      (usOf("2023-01-05T00:00:00Z"), None)  // trailing: stays null
    ).toDF("us", "v")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("meta", to_json(struct(lit(1L).as("k"))))
    val got = MqlPipeline.aggregate(rows, col("meta"),
      """[{"$fill": {"sortBy": {"ts": 1},
        |  "output": {"v": {"method": "linear"}}}}]""".stripMargin)
      .orderBy("ts").select("v")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    // (100·(4−2) + 400·(2−1)) DIV (4−1) = 800/3 DIV = 200
    assert(got.toSeq == Seq(100L, 200L, 400L, -1L), got.toSeq.toString)
  }

  test("$graphLookup: BFS with cycle termination, min-depth dedup, " +
      "empty array for null starts") {
    val g = Seq(
      (1L, """{"m":1}""", java.lang.Long.valueOf(2L)),
      (2L, """{"m":1}""", java.lang.Long.valueOf(3L)),
      (3L, """{"m":1}""", java.lang.Long.valueOf(1L)), // 1→2→3→1 cycle
      (4L, """{"m":1}""", null.asInstanceOf[java.lang.Long])
    ).toDF("id", "meta", "next")
    val resolver: String => (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column) = {
      case "g" => (g.select("id", "next"), lit(null))
      case o => fail(s"unexpected: $o")
    }
    val got = MqlPipeline.aggregate(g, col("meta"),
      """[{"$graphLookup": {"from": "g", "startWith": "$next",
        |   "connectFromField": "next", "connectToField": "id",
        |   "as": "walk", "depthField": "d"}}]""".stripMargin, resolver)
      .select(col("id"), col("walk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(w => (w.getLong(0), w.getLong(2))).sortBy(_._2).toSeq)
      .toMap
    // from 1 (start 2): 2@0, 3@1, 1@2 — the cycle closes and STOPS
    assert(got(1L) == Seq((2L, 0L), (3L, 1L), (1L, 2L)))
    assert(got(2L) == Seq((3L, 0L), (1L, 1L), (2L, 2L)))
    // null start → empty walk, not null
    assert(got(4L) == Seq())
  }

  test("$graphLookup: explicit maxDepth bounds quietly; the conf safety " +
      "cap refuses a live frontier loudly") {
    val chain = Seq(
      (1L, """{"m":1}""", java.lang.Long.valueOf(2L)),
      (2L, """{"m":1}""", java.lang.Long.valueOf(3L)),
      (3L, """{"m":1}""", java.lang.Long.valueOf(4L)),
      (4L, """{"m":1}""", null.asInstanceOf[java.lang.Long])
    ).toDF("id", "meta", "next")
    val resolver: String => (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column) = {
      case "g" => (chain.select("id", "next"), lit(null))
      case o => fail(s"unexpected: $o")
    }
    val bounded = MqlPipeline.aggregate(chain, col("meta"),
      """[{"$graphLookup": {"from": "g", "startWith": "$next",
        |   "connectFromField": "next", "connectToField": "id",
        |   "as": "walk", "maxDepth": 0}}]""".stripMargin, resolver)
      .filter(col("id") === 1L)
      .select(size(col("walk"))).head().getInt(0)
    assert(bounded == 1) // depth 0 only: just doc 2
    spark.conf.set("graft.graphlookup.max_depth", "0")
    try {
      val cap = intercept[IllegalStateException] {
        MqlPipeline.aggregate(chain, col("meta"),
          """[{"$graphLookup": {"from": "g", "startWith": "$next",
            |   "connectFromField": "next", "connectToField": "id",
            |   "as": "walk"}}]""".stripMargin, resolver).collect()
      }
      assert(cap.getMessage.contains("frontier still live"))
    } finally spark.conf.unset("graft.graphlookup.max_depth")
  }

  test("$facet: one document, one canonically-sorted array per facet; " +
      "an empty sub-result is an empty array") {
    val got = run(
      """[{"$facet": {
        |   "per_grp": [
        |     {"$group": {"_id": "$grp", "n": {"$sum": 1}}},
        |     {"$sort": {"_id": 1}}],
        |   "none": [
        |     {"$match": {"v": {"$gt": 1000}}},
        |     {"$count": "n"}]}}]""".stripMargin)
    assert(got.columns.toSeq == Seq("per_grp", "none"))
    val row = got.head()
    val perGrp = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(perGrp == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
    assert(row.getSeq[org.apache.spark.sql.Row](1).isEmpty)
    assert(got.count() == 1)
  }

  test("$bucketAuto: equal-population split; tied boundary values land " +
      "together; empty buckets vanish; loud errors") {
    val vals = Seq(1L, 1L, 1L, 1L, 2L, 3L, 4L, 5L)
    val tied = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, s"""{"v": $v}""") }
      .toDF("id", "meta")
    val got = MqlPipeline.aggregate(tied, col("meta"),
      """[{"$bucketAuto": {"groupBy": "$v", "buckets": 4}}]""")
      .select(col("_id.min"), col("_id.max"), col("count"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
      .toSeq
    // ranks 2,4,6 of [1,1,1,1,2,3,4,5] → bounds 1,2,4; all the 1s land
    // in ONE bucket (assignment by value), the sub-1 bucket is empty
    // and absent
    assert(got == Seq((1.0, 1.0, 4L), (2.0, 3.0, 2L), (4.0, 5.0, 2L)))

    val gran = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(tied, col("meta"),
        """[{"$bucketAuto": {"groupBy": "$v", "buckets": 2,
          |  "granularity": "R5"}}]""".stripMargin)
    }
    assert(gran.getMessage.contains("granularity"))
    val zero = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(tied, col("meta"),
        """[{"$bucketAuto": {"groupBy": "$v", "buckets": 0}}]""")
    }
    assert(zero.getMessage.contains("buckets >= 1"))
  }

  test("$bucketAuto: ANY null/non-numeric groupBy value fails up front " +
      "(not only boundary-rank nulls)") {
    // one null among 8 values, buckets=2 → the null never lands on a
    // boundary rank, so the old in-scan check missed it and the null
    // silently joined bucket 0
    val withNull = (0 until 7).map(i => (i.toLong, s"""{"v": ${i + 1}}""")) :+
      (7L, """{"w": 9}""")
    val df = withNull.toDF("id", "meta")
    val e = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(df, col("meta"),
        """[{"$bucketAuto": {"groupBy": "$v", "buckets": 2}}]""")
    }
    assert(e.getMessage.contains("must be non-null numeric"))
    assert(e.getMessage.contains("1 of 8"))
  }

  test("$derivative/$integral: slopes between frame ends, trapezoid " +
      "running area, null rate on zero x-span") {
    val series = Seq(
      // grp a: (x, y) = (0,0) (2,4) (4,4) — slope 2 then 0;
      // areas 0, 4, 12
      (1L, "a", 0L, 0.0), (2L, "a", 2L, 4.0), (3L, "a", 4L, 4.0),
      // grp b: two points at the SAME x — zero span → null rate
      (4L, "b", 5L, 1.0), (5L, "b", 5L, 3.0)
    ).toDF("id", "grp", "x", "y")
      .withColumn("meta", to_json(struct(col("grp"))))
    val got = MqlPipeline.aggregate(series, col("meta"),
      """[{"$setWindowFields": {
        |   "partitionBy": "$grp",
        |   "sortBy": {"x": 1, "id": 1},
        |   "output": {
        |     "vel": {"$derivative": {"input": "$y"},
        |       "window": {"documents": [-1, 0]}},
        |     "area": {"$integral": {"input": "$y"},
        |       "window": {"documents": ["unbounded", "current"]}}}}},
        |  {"$sort": {"id": 1}},
        |  {"$project": {"id": 1, "vel": 1, "area": 1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getDouble(2))).toSeq
    assert(got == Seq(
      (1L, None, 0.0), (2L, Some(2.0), 4.0), (3L, Some(0.0), 12.0),
      (4L, None, 0.0), (5L, None, 0.0)), got.mkString(","))

    val badWin = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(series, col("meta"),
        """[{"$setWindowFields": {"partitionBy": "$grp",
          |  "sortBy": {"x": 1},
          |  "output": {"a": {"$integral": {"input": "$y"},
          |    "window": {"documents": [-2, 0]}}}}}]""".stripMargin)
    }
    assert(badWin.getMessage.contains("$integral supports"))
  }

  test("$median/$percentile: exact interpolation over the partition; " +
      "bounded windows refused") {
    val vals = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 10.0), (5L, "b", 7.0))
      .toDF("id", "grp", "v")
      .withColumn("meta", to_json(struct(col("grp"))))
    val got = MqlPipeline.aggregate(vals, col("meta"),
      """[{"$setWindowFields": {"partitionBy": "$grp",
        |   "output": {
        |     "med": {"$median": {"input": "$v",
        |       "method": "approximate"}},
        |     "pcts": {"$percentile": {"input": "$v", "p": [0.25, 1.0],
        |       "method": "approximate"}}}}},
        |  {"$sort": {"id": 1}}]""".stripMargin)
      .select(col("id"), col("med"), element_at(col("pcts"), 1),
        element_at(col("pcts"), 2))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    // grp a [1,2,3,10]: median (2+3)/2 = 2.5; p25 at rank 0.75 →
    // 1 + 0.75·(2−1) = 1.75; p100 = 10. grp b singleton: all 7
    assert(got == Seq((1L, 2.5, 1.75, 10.0), (2L, 2.5, 1.75, 10.0),
      (3L, 2.5, 1.75, 10.0), (4L, 2.5, 1.75, 10.0),
      (5L, 7.0, 7.0, 7.0)), got.mkString(","))

    val bounded = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(vals, col("meta"),
        """[{"$setWindowFields": {"partitionBy": "$grp",
          |  "sortBy": {"id": 1},
          |  "output": {"m": {"$median": {"input": "$v"},
          |    "window": {"documents": [-1, 0]}}}}}]""".stripMargin)
    }
    assert(bounded.getMessage.contains("whole-partition"))
  }

  test("the reference's internal pipeline through Collection.aggregate") {
    val root = tmpDir("kaer-pipe")
    val c = new KaerSession(spark, root, HashingEmbedder(64))
      .createCollection("c")
    c.insert(Data().withDocuments(Seq("x", "y", "z")))
    // db/db.go:146-148: ascending _m_id sort + limit 1 (its min-id form;
    // our recovery uses max, but the PIPELINE itself must express both)
    val minId = c.aggregate(
      """[{"$sort": {"_m_id": 1}}, {"$limit": 1},
        |  {"$project": {"_m_id": 1}}]""".stripMargin)
      .head().getLong(0)
    assert(minId == 1L)
    val maxId = c.aggregate(
      """[{"$sort": {"_m_id": -1}}, {"$limit": 1},
        |  {"$project": {"_m_id": 1}}]""".stripMargin)
      .head().getLong(0)
    assert(maxId == 3L)
  }

  // ---- array lambda + string expression families ----

  private lazy val arrDf = Seq(
    (1L, """{"vals": [1, 5, 9], "s": "  hello_world  "}"""),
    (2L, """{"vals": [], "s": "abc"}"""),
    (3L, """{"vals": [4], "s": "xyz"}""")
  ).toDF("id", "meta")

  private def runArr(pipeline: String) =
    MqlPipeline.aggregate(arrDf, col("meta"), pipeline)

  test("$map/$filter/$reduce: lambda vars over a VARIANT array; empty " +
      "array folds to the initial value") {
    val got = runArr(
      """[
        | {"$addFields": {
        |   "kept": {"$size": {"$filter": {"input": "$vals", "as": "x",
        |     "cond": {"$gte": ["$$x", 5]}}}},
        |   "sum2x": {"$toLong": {"$reduce": {
        |     "input": {"$map": {"input": "$vals",
        |       "in": {"$multiply": ["$$this", 2]}}},
        |     "initialValue": 0,
        |     "in": {"$add": ["$$value", "$$this"]}}}}}},
        | {"$sort": {"id": 1}},
        | {"$project": {"id": 1, "kept": 1, "sum2x": 1}}
        |]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 30L), (2L, 0L, 0L), (3L, 0L, 8L)))
  }

  test("$slice/$range/$concatArrays compose; $slice handles negatives") {
    val got = runArr(
      """[
        | {"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {
        |   "lastTwo": {"$toLong": {"$reduce": {
        |     "input": {"$slice": ["$vals", -2]}, "initialValue": 0,
        |     "in": {"$add": ["$$value", "$$this"]}}}},
        |   "gridSum": {"$toLong": {"$reduce": {
        |     "input": {"$concatArrays": [{"$range": [0, 6, 2]},
        |       {"$range": [10, 11]}]},
        |     "initialValue": 0, "in": {"$add": ["$$value", "$$this"]}}}}
        | }},
        | {"$project": {"id": 1, "lastTwo": 1, "gridSum": 1}}
        |]""".stripMargin).collect()
    // lastTwo = 5 + 9; gridSum = (0+2+4) + 10
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 14L, 16L)))
  }

  test("string battery: $split/$substrCP/$indexOfCP/$trim/$replaceAll/" +
      "$strLenCP against hand values") {
    val got = runArr(
      """[
        | {"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {
        |   "parts": {"$size": {"$split":
        |     [{"$trim": {"input": "$s"}}, "_"]}},
        |   "pre": {"$substrCP": [{"$trim": {"input": "$s"}}, 0, 5]},
        |   "idx": {"$indexOfCP": [{"$trim": {"input": "$s"}}, "world"]},
        |   "len": {"$strLenCP": {"$trim": {"input": "$s"}}},
        |   "repl": {"$replaceAll": {"input": {"$trim": {"input": "$s"}},
        |     "find": "_", "replacement": " "}}}},
        | {"$project": {"id": 1, "parts": 1, "pre": 1, "idx": 1,
        |   "len": 1, "repl": 1}}
        |]""".stripMargin).collect()(0)
    assert(got.getLong(1) == 2L)               // hello / world
    assert(got.getString(2) == "hello")
    assert(got.getLong(3) == 6L)               // 0-based index of "world"
    assert(got.getLong(4) == 11L)
    assert(got.getString(5) == "hello world")
  }

  test("$regexMatch: 'i' option folds case; unknown options are loud; " +
      "unknown lambda variable is loud") {
    val got = runArr(
      """[
        | {"$addFields": {"m": {"$toLong": {"$cond": [
        |   {"$regexMatch": {"input": "$s", "regex": "HELLO",
        |     "options": "i"}}, 1, 0]}}}},
        | {"$sort": {"id": 1}},
        | {"$project": {"id": 1, "m": 1}}
        |]""".stripMargin).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 0L), (3L, 0L)))
    val badOpt = intercept[IllegalArgumentException] {
      runArr("""[{"$addFields": {"m": {"$regexMatch":
        | {"input": "$s", "regex": "x", "options": "gm"}}}}]"""
        .stripMargin).collect()
    }
    assert(badOpt.getMessage.contains("'i' option"))
    val badVar = intercept[IllegalArgumentException] {
      runArr("""[{"$addFields": {"m": {"$map": {"input": "$vals",
        | "as": "x", "in": {"$add": ["$$y", 1]}}}}}]"""
        .stripMargin).collect()
    }
    assert(badVar.getMessage.contains("unknown pipeline variable"))
  }

  test("$out: without the scratch-root conf the stage refuses loudly " +
      "instead of writing somewhere surprising") {
    spark.conf.unset("graft.mql.out_dir")
    val e = intercept[IllegalArgumentException] {
      runArr("""[{"$out": "somewhere"}]""")
    }
    assert(e.getMessage.contains("graft.mql.out_dir"))
  }

  test("$let: vars evaluate in the OUTER scope (a var cannot see its " +
      "siblings — Mongo contract); nesting shadows") {
    val got = runArr(
      """[
        | {"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {"r": {"$toLong": {"$let": {
        |   "vars": {"a": 10},
        |   "in": {"$let": {
        |     "vars": {"a": {"$multiply": ["$$a", 2]}, "b": "$$a"},
        |     "in": {"$add": ["$$a", "$$b"]}}}}}}}},
        | {"$project": {"id": 1, "r": 1}}
        |]""".stripMargin).collect()(0)
    // inner vars see OUTER a=10: a' = 20, b = 10 → a' + b = 30
    assert(got.getLong(1) == 30L)
    // a var referencing its sibling in the same vars block is unknown
    val bad = intercept[IllegalArgumentException] {
      runArr("""[{"$addFields": {"r": {"$let": {
        | "vars": {"a": 1, "b": "$$a"}, "in": "$$b"}}}}]"""
        .stripMargin).collect()
    }
    assert(bad.getMessage.contains("unknown pipeline variable"))
  }

  test("$topN/$bottomN/$firstN/$lastN: own-sortBy vs pipeline order, " +
      "groups smaller than n return what exists, validation is loud") {
    val got = run(
      """[
        | {"$sort": {"id": 1}},
        | {"$group": {"_id": "$grp",
        |   "top2": {"$topN": {"n": 2, "sortBy": {"v": -1},
        |            "output": {"$toLong": "$v"}}},
        |   "bot2": {"$bottomN": {"n": 2, "sortBy": {"v": -1},
        |            "output": {"$toLong": "$v"}}},
        |   "f2": {"$firstN": {"n": 2, "input": {"$toLong": "$v"}}},
        |   "l2": {"$lastN": {"n": 2, "input": {"$toLong": "$v"}}}}},
        | {"$sort": {"_id": 1}}
        |]""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1),
        r.getSeq[Long](2), r.getSeq[Long](3), r.getSeq[Long](4))).toSeq
    assert(got == Seq(
      // grp a: v 10,20 -> top2 desc (20,10); bottom2 of desc = (20,10);
      // first/last by id order
      ("a", Seq(20L, 10L), Seq(20L, 10L), Seq(10L, 20L), Seq(10L, 20L)),
      ("b", Seq(7L, 5L), Seq(7L, 5L), Seq(5L, 7L), Seq(5L, 7L)),
      // grp c: single member, n=2 -> singleton arrays, no padding
      ("c", Seq(100L), Seq(100L), Seq(100L), Seq(100L))), got.toString)
    val noSort = intercept[Exception] {
      run("""[{"$group": {"_id": "$grp",
            |  "f": {"$firstN": {"n": 2, "input": "$v"}}}}]""".stripMargin)
        .collect()
    }
    assert(noSort.getMessage.contains("requires a prior $sort"),
      noSort.getMessage)
    val badN = intercept[Exception] {
      run("""[{"$sort": {"id": 1}}, {"$group": {"_id": "$grp",
            |  "t": {"$topN": {"n": 0, "sortBy": {"v": 1},
            |        "output": "$v"}}}}]""".stripMargin).collect()
    }
    assert(badN.getMessage.contains("must be positive"), badN.getMessage)
  }

  test("$lookup let/pipeline: both $eq operand orders join, the " +
      "uncorrelated $match pre-filters, unknown vars and non-equality " +
      "$expr are loud") {
    val local = Seq((1L, """{"g": "a"}"""), (2L, """{"g": "b"}"""))
      .toDF("id", "meta")
    val foreign = Seq("""{"g": "a", "v": 1}""", """{"g": "a", "v": 2}""",
      """{"g": "b", "v": 9}""").toDF("fmeta")
    def runl(p: String) = MqlPipeline.aggregate(local, col("meta"), p,
      _ => (foreign, col("fmeta")))
    val out = runl(
      """[
        | {"$lookup": {"from": "f", "let": {"x": "$g"},
        |   "pipeline": [
        |     {"$match": {"v": {"$lt": 9}}},
        |     {"$match": {"$expr": {"$eq": ["$g", "$$x"]}}}],
        |   "as": "m"}},
        | {"$project": {"id": 1, "n": {"$size": "$m"}}},
        | {"$sort": {"id": 1}}
        |]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // group a: two rows v<9; group b: its only row filtered out
    assert(out == Seq((1L, 2L), (2L, 0L)), out.toString)
    val badVar = intercept[Exception] {
      runl("""[{"$lookup": {"from": "f", "let": {"x": "$g"},
            |  "pipeline": [{"$match": {"$expr": {"$eq": ["$$y", "$g"]}}}],
            |  "as": "m"}}]""".stripMargin).collect()
    }
    assert(badVar.getMessage.contains("unknown $lookup let variable"),
      badVar.getMessage)
    val badExpr = intercept[Exception] {
      runl("""[{"$lookup": {"from": "f", "let": {"x": "$g"},
            |  "pipeline": [{"$match": {"$expr": {"$gt": ["$$x", "$g"]}}}],
            |  "as": "m"}}]""".stripMargin).collect()
    }
    assert(badExpr.getMessage.contains("$eq"), badExpr.getMessage)
  }

  test("$toLong($ifNull)/$toLong($cond) keep present VARIANT numbers — " +
      "the numeric view pushes into the branches") {
    val d = Seq((1L, """{"a": 7, "b": 2}"""), (2L, """{"b": 3}"""))
      .toDF("id", "meta")
    val got = MqlPipeline.aggregate(d, col("meta"),
      """[{"$project": {
        |  "v": {"$toLong": {"$ifNull": ["$a", 0]}},
        |  "c": {"$toLong": {"$cond": [{"$gte": ["$b", 3]}, "$b", "$a"]}}}},
        | {"$sort": {"v": -1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    // row 1: a present -> 7 (NOT the fallback); cond false -> $a = 7
    // row 2: a absent -> 0; cond true -> $b = 3
    assert(got == Seq((7L, 7L), (0L, 3L)), got.toString)
  }

  test("set operators: canonical ascending order, distinct elements, " +
      "numeric bracket over VARIANT arrays") {
    val got = runArr(
      """[
        | {"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {
        |   "u": {"$setUnion": ["$vals", "$vals"]},
        |   "pos": {"$indexOfArray": ["$vals", 5]},
        |   "none": {"$indexOfArray": ["$vals", 42]}}},
        | {"$project": {"id": 1, "u": 1, "pos": 1, "none": 1}}
        |]""".stripMargin).collect()(0)
    assert(got.getSeq[Double](1) == Seq(1.0, 5.0, 9.0))
    assert(got.getLong(2) == 1L)   // 0-based position of 5
    assert(got.getLong(3) == -1L)  // absent → -1
  }

  test("$redact: KEEP/PRUNE per document via nested $cond; $$DESCEND " +
      "loud; non-sentinel verdict raises per row") {
    val kept = run(
      """[{"$redact": {"$cond": [
        |    {"$gte": [{"$toLong": "$v"}, 7]},
        |    {"$cond": [{"$lt": [{"$toLong": "$v"}, 20]},
        |               "$$KEEP", "$$PRUNE"]},
        |    "$$PRUNE"]}},
        |  {"$project": {"id": 1}}, {"$sort": {"id": 1}}
        |]""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 4L)) // v=10 and v=7; 20/100 too big, 5 small
    // r13: $$DESCEND recurses ONE level — root DESCEND keeps scalar
    // fields and prunes embedded-object fields whose re-rooted verdict
    // is PRUNE; field order and untouched values survive the rewrite
    val nested = Seq(
      (1L, """{"level": 5, "a": 1, "sec": {"level": 1, "v": 7},""" +
        """ "pub": {"level": 9, "v": 8}}"""),
      (2L, """{"level": 1, "a": 2, "sec": {"level": 9, "v": 7}}"""),
      (3L, """{"level": 4, "a": 3, "pub": {"level": 3, "v": 6}}""")
    ).toDF("id", "meta")
    val redactExpr =
      """{"$redact": {"$cond": [
        |  {"$gte": [{"$toLong": "$level"}, 3]},
        |  "$$DESCEND", "$$PRUNE"]}}""".stripMargin
    val desc = MqlPipeline.aggregate(nested, col("meta"),
      s"""[$redactExpr,
         | {"$$project": {"id": 1,
         |   "secv": {"$$toLong": {"$$ifNull":
         |     [{"$$toLong": "$$sec.v"}, -1]}},
         |   "pubv": {"$$toLong": {"$$ifNull":
         |     [{"$$toLong": "$$pub.v"}, -1]}}}},
         | {"$$sort": {"id": 1}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2 pruned at root (level 1); doc 1 descends: sec (level 1)
    // pruned, pub (level 9) kept; doc 3: pub (level 3) kept
    assert(desc.toSeq == Seq((1L, -1L, 8L), (3L, -1L, 6L)),
      desc.mkString(","))
    // DESCEND on a LEAF subdoc ≡ KEEP (Mongo: nothing to recurse
    // into) — a bare $$DESCEND keeps everything on one-level docs
    val all = MqlPipeline.aggregate(nested, col("meta"),
      """[{"$redact": "$$DESCEND"}, {"$project": {"id": 1}},
        | {"$sort": {"id": 1}}]""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(all == Seq(1L, 2L, 3L), all.toString)
    // r14: DESCEND now recurses to bounded depth — a subdoc that
    // itself nests objects is REWRITTEN (inner pruned by its own
    // re-rooted verdict), and arrays of embedded documents get the
    // per-element treatment (pruned elements removed, scalars kept)
    val deep = Seq((1L,
      """{"level": 5, "a": 1, "sec": {"level": 4, "v": 2,""" +
        """ "inner": {"level": 1, "v": 3},""" +
        """ "pub2": {"level": 7, "v": 4}},""" +
        """ "arr": [{"level": 1, "v": 1}, {"level": 5, "v": 2}, 7]}"""))
      .toDF("id", "meta")
    val d2 = MqlPipeline.aggregate(deep, col("meta"),
      s"""[$redactExpr,
         | {"$$project": {"id": 1,
         |   "secv": {"$$toLong": {"$$ifNull":
         |     [{"$$toLong": "$$sec.v"}, -1]}},
         |   "innv": {"$$toLong": {"$$ifNull":
         |     [{"$$toLong": "$$sec.inner.v"}, -1]}},
         |   "p2v": {"$$toLong": {"$$ifNull":
         |     [{"$$toLong": "$$sec.pub2.v"}, -1]}},
         |   "na": {"$$size": "$$arr"}}}]""".stripMargin)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    // sec (level 4) descends: v kept, inner (level 1) pruned, pub2
    // (level 7, leaf) kept; arr loses its level-1 element, keeps the
    // level-5 doc and the scalar 7
    assert(d2.toSeq == Seq((1L, 2L, -1L, 4L, 2L)), d2.mkString(","))
    // (r15, ADVICE) a DESCEND subdoc whose ONLY nesting is a MIXED
    // array (scalars + objects → ARRAY<VARIANT>, no nested OBJECT< in
    // its schema) must NOT be treated as a leaf: the embedded object
    // gets its own re-rooted verdict (PRUNE here) instead of riding
    // along verbatim — the silent-visibility-widening case
    val mixedLeak = Seq((1L,
      """{"level": 5, "sub": {"level": 4, "keep": 1,""" +
        """ "arr": [1, {"level": 0, "secret": 9}, 2]}}"""))
      .toDF("id", "meta")
    val ml = MqlPipeline.aggregate(mixedLeak, col("meta"),
      s"""[$redactExpr,
         | {"$$project": {"id": 1,
         |   "na": {"$$size": "$$sub.arr"},
         |   "sec": {"$$toLong": {"$$ifNull":
         |     [{"$$toLong": {"$$arrayElemAt": ["$$sub.arr", 1]}},
         |      -1]}}}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the level-0 object is pruned OUT of the mixed array: 3 → 2
    // elements, and position 1 now holds the scalar 2
    assert(ml.toSeq == Seq((1L, 2L, 2L)), ml.mkString(","))
    // (r15) an INTERPRETABLE verdict runs the RedactWalk scale path:
    // depth is a runtime parameter, so 4 nested DESCENDs now rewrite
    // instead of raising — the level-1 leaf at the bottom prunes, the
    // rest survives
    val deep4 = Seq((1L,
      """{"level": 9, "s1": {"level": 9, "s2": {"level": 9,""" +
        """ "s3": {"level": 9, "s4": {"level": 1}}}}}"""))
      .toDF("id", "meta")
    val walked = MqlPipeline.aggregate(deep4, col("meta"),
      s"""[$redactExpr,
         | {"$$project": {"id": 1,
         |   "l3": {"$$toLong": {"$$ifNull":
         |     [{"$$toLong": "$$s1.s2.s3.level"}, -1]}},
         |   "l4": {"$$toLong": {"$$ifNull":
         |     [{"$$toLong": "$$s1.s2.s3.s4.level"}, -1]}}}}]"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(walked.toSeq == Seq((1L, 9L, -1L)), walked.mkString(","))
    def msgsD(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgsD(t.getCause)
    // ...a NON-interpretable DESCEND verdict ($switch is outside the
    // walk grammar) falls back to the plan-unrolled path, whose
    // plan-size depth cap still raises per row past depth 2
    val sw = intercept[Exception] {
      MqlPipeline.aggregate(deep4, col("meta"),
        """[{"$redact": {"$switch": {"branches": [
          |   {"case": {"$gte": [{"$toLong": "$level"}, 3]},
          |    "then": "$$DESCEND"}], "default": "$$PRUNE"}}}]"""
          .stripMargin).collect()
    }
    assert(msgsD(sw).exists(_.contains("nesting depth")),
      msgsD(sw).toString)
    // ...and the walk path's own RUNTIME cap stays loud: a document
    // nested past 64 levels raises instead of passing unredacted
    val deepJson = (1 to 70).foldLeft("""{"level": 9}""") { (inner, _) =>
      s"""{"level": 9, "s": $inner}""" }
    val capped = intercept[Exception] {
      MqlPipeline.aggregate(Seq((1L, deepJson)).toDF("id", "meta"),
        col("meta"), """[{"$redact": "$$DESCEND"}]""").collect()
    }
    assert(msgsD(capped).exists(_.contains("runtime nesting cap")),
      msgsD(capped).toString)
    val bad = intercept[Exception] {
      run("""[{"$redact": {"$cond": [{"$gte": [{"$toLong": "$v"}, 0]},
            |  "oops", "$$PRUNE"]}}]""".stripMargin).collect()
    }
    assert(bad.getMessage.contains("oops") ||
      Option(bad.getCause).exists(_.getMessage.contains("oops")),
      bad.getMessage)
  }

  test("$rankFusion: weighted integer RRF over two ranked legs; " +
      "unranked docs score from one leg; contract guards loud") {
    // ranks by v DESC: 5,2,1,4,3 ; by v ASC: 3,4,1,2,5
    def leg(dir: Int, lim: Int) =
      s"""[{"$$project": {"_id": {"$$toLong": "$$id"},
         |    "v": {"$$toLong": "$$v"}}},
         |  {"$$sort": {"v": $dir, "_id": 1}}, {"$$limit": $lim}]"""
        .stripMargin
    val fused = MqlPipeline.aggregate(df.withColumn("meta",
        to_json(struct(col("id"),
          get_json_object(col("meta"), "$.v").cast("long").as("v")))),
      col("meta"),
      s"""[{"$$rankFusion": {
         |   "input": {"pipelines": {
         |     "hi": ${leg(-1, 3)}, "lo": ${leg(1, 3)}}},
         |   "combination": {"weights": {"hi": 2}},
         |   "scoreDetails": true}}]""".stripMargin)
      .select("_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // hi top-3 = docs 5,2,1 (ranks 1,2,3); lo top-3 = 3,4,1
    def c(k: Long, w: Long = 1L) = w * (1000000000000L / (60L + k))
    assert(fused(5L) == c(1, 2))           // hi only, weight 2
    assert(fused(3L) == c(1))              // lo only
    assert(fused(1L) == c(3, 2) + c(3))    // both legs, rank 3 each
    assert(fused(2L) == c(2, 2) && fused(4L) == c(2))
    assert(fused.size == 5)                // union of the two top-3s
    val noLimit = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(df, col("meta"),
        s"""[{"$$rankFusion": {"input": {"pipelines": {
           |  "a": [{"$$project": {"_id": {"$$toLong": "$$id"}}},
           |        {"$$sort": {"_id": 1}}],
           |  "b": ${leg(1, 2)}}}}}]""".stripMargin).collect()
    }
    assert(noLimit.getMessage.contains("$limit"), noLimit.getMessage)
    val noId = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(df, col("meta"),
        s"""[{"$$rankFusion": {"input": {"pipelines": {
           |  "a": [{"$$project": {"k": {"$$toLong": "$$id"}}},
           |        {"$$sort": {"k": 1}}, {"$$limit": 2}],
           |  "b": ${leg(1, 2)}}}}}]""".stripMargin).collect()
    }
    assert(noId.getMessage.contains("_id"), noId.getMessage)
    val fracW = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(df, col("meta"),
        s"""[{"$$rankFusion": {
           |  "input": {"pipelines": {"a": ${leg(1, 2)},
           |                          "b": ${leg(-1, 2)}}},
           |  "combination": {"weights": {"a": 0.5}}}}]""".stripMargin)
          .collect()
    }
    assert(fracW.getMessage.contains("positive integers"),
      fracW.getMessage)
  }

  test("$dateAdd/$dateSubtract: fixed-length units compose exactly; " +
      "calendar units clamp; named-zone civil day arithmetic") {
    val got = run(
      """[
        | {"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {
        |   "due": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "2024-01-30T23:30:00",
        |       "unit": "day", "amount": 3}}}},
        |   "back": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateSubtract": {
        |       "startDate": {"$dateAdd": {
        |         "startDate": "2024-01-30T23:30:00",
        |         "unit": "week", "amount": 1}},
        |       "unit": "minute", "amount": 90}}}}}},
        | {"$project": {"due": 1, "back": 1}}
        |]""".stripMargin).collect()(0)
    assert(got.getString(0) == "2024-02-02 23:30:00") // +3d crosses month
    assert(got.getString(1) == "2024-02-06 22:00:00") // +7d then -90min
    // calendar units (r13): civil-date arithmetic with Mongo's
    // month-end clamp — Jan 31 + 1 month lands on Feb's last day
    // (leap-aware), Feb 29 + 1 year clamps to Feb 28, quarters are
    // 3-month steps, and time-of-day survives the clamp intact.
    val cal = run(
      """[
        | {"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {
        |   "m_leap": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "2024-01-31T10:15:00",
        |       "unit": "month", "amount": 1}}}},
        |   "m_nolp": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "2023-01-31T10:15:00",
        |       "unit": "month", "amount": 1}}}},
        |   "y_clmp": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "2024-02-29T05:00:01",
        |       "unit": "year", "amount": 1}}}},
        |   "q_back": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateSubtract": {
        |       "startDate": "2024-05-31T23:59:58",
        |       "unit": "quarter", "amount": 1}}}}}},
        | {"$project": {"m_leap": 1, "m_nolp": 1, "y_clmp": 1,
        |   "q_back": 1}}
        |]""".stripMargin).collect()(0)
    assert(cal.getString(0) == "2024-02-29 10:15:00", cal.toString)
    assert(cal.getString(1) == "2023-02-28 10:15:00", cal.toString)
    assert(cal.getString(2) == "2025-02-28 05:00:01", cal.toString)
    assert(cal.getString(3) == "2024-02-29 23:59:58", cal.toString)
    // named zones work since r15 (no transition near this date —
    // plain civil day subtraction in the EST frame)
    val tz = run(
      """[{"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {"x": {"$dateToString": {
        |   "format": "%Y-%m-%d %H:%M:%S",
        |   "date": {"$dateSubtract": {
        |     "startDate": "2024-01-30T00:00:00", "unit": "day",
        |     "amount": 1, "timezone": "America/New_York"}}}}}},
        | {"$project": {"x": 1}}]""".stripMargin).collect()(0)
    assert(tz.getString(0) == "2024-01-29 00:00:00", tz.toString)
  }

  test("date operators honor FIXED-offset timezones; named zones and " +
      "bad offsets stay loud (r14)") {
    // month arithmetic in the +05:30 frame: 2024-02-29 20:00 UTC is
    // already Mar 1 01:30 in +05:30, so +1 month lands Apr 1 01:30
    // local = Mar 31 20:00 UTC — TWO days later than the UTC-frame
    // answer (Feb 29 + 1m = Mar 29). The offset changes the answer,
    // not just the rendering.
    val got = run(
      """[
        | {"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {
        |   "m_tz": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "2024-02-29T20:00:00",
        |       "unit": "month", "amount": 1, "timezone": "+05:30"}}}},
        |   "m_utc": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "2024-02-29T20:00:00",
        |       "unit": "month", "amount": 1}}}},
        |   "m_neg": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateAdd": {"startDate": "2024-03-01T02:00:00",
        |       "unit": "month", "amount": 1, "timezone": "-08:00"}}}},
        |   "tr_d": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateTrunc": {"date": "2024-01-15T20:00:00",
        |       "unit": "day", "timezone": "+05:30"}}}},
        |   "lbl": {"$dateToString": {"format": "%Y-%m-%d %H:%M",
        |     "date": "2024-01-15T20:00:00", "timezone": "+05:30"}}}},
        | {"$project": {"m_tz": 1, "m_utc": 1, "m_neg": 1, "tr_d": 1,
        |   "lbl": 1}}
        |]""".stripMargin).collect()(0)
    assert(got.getString(0) == "2024-03-31 20:00:00", got.toString)
    assert(got.getString(1) == "2024-03-29 20:00:00", got.toString)
    // -08:00 frame: Mar 1 02:00 UTC = Feb 29 18:00 local; +1m =
    // Mar 29 18:00 local = Mar 30 02:00 UTC (UTC frame: Apr 1)
    assert(got.getString(2) == "2024-03-30 02:00:00", got.toString)
    // day trunc in +05:30: Jan 15 20:00 UTC = Jan 16 01:30 local →
    // local midnight Jan 16 = Jan 15 18:30 UTC
    assert(got.getString(3) == "2024-01-15 18:30:00", got.toString)
    assert(got.getString(4) == "2024-01-16 01:30", got.toString)
    // (r14b) the rest of the date family takes {date, timezone} too:
    // parts read the offset wall clock, $dateDiff counts boundaries in
    // the offset frame, $dateFromString reads a wall clock and returns
    // the UTC instant
    val fam = run(
      """[
        | {"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {
        |   "h": {"$toLong": {"$hour": {"date": "2024-01-15T20:45:00",
        |     "timezone": "+05:30"}}},
        |   "dom": {"$toLong": {"$dayOfMonth": {
        |     "date": "2024-01-15T20:45:00", "timezone": "+05:30"}}},
        |   "dd": {"$toLong": {"$dateDiff": {
        |     "startDate": "2024-01-15T07:00:00",
        |     "endDate": "2024-01-15T09:00:00",
        |     "unit": "day", "timezone": "-08:00"}}},
        |   "dd0": {"$toLong": {"$dateDiff": {
        |     "startDate": "2024-01-15T07:00:00",
        |     "endDate": "2024-01-15T09:00:00", "unit": "day"}}},
        |   "fs": {"$dateToString": {"format": "%Y-%m-%d %H:%M:%S",
        |     "date": {"$dateFromString": {
        |       "dateString": "2024-01-15T00:00:00",
        |       "timezone": "+05:30"}}}}}},
        | {"$project": {"h": 1, "dom": 1, "dd": 1, "dd0": 1, "fs": 1}}
        |]""".stripMargin).collect()(0)
    // 20:45 UTC = 02:15 local Jan 16 in +05:30
    assert(fam.getLong(0) == 2L && fam.getLong(1) == 16L, fam.toString)
    // 07:00→09:00 UTC crosses local midnight in -08:00 (23:00→01:00),
    // but no UTC day boundary
    assert(fam.getLong(2) == 1L && fam.getLong(3) == 0L, fam.toString)
    // +05:30 wall clock midnight = 18:30 UTC the previous day
    assert(fam.getString(4) == "2024-01-14 18:30:00", fam.toString)
    // out-of-envelope offsets and garbage zone ids stay loud; named
    // REGION ids work since r15 (the baked-ZoneRules device) — their
    // behavior is locked in the dedicated named-tz test below
    for (frag <- Seq(
      """{"$dateToString": {"date": "2024-01-01T00:00:00",
        |  "timezone": "America/Nowhere"}}""".stripMargin,
      """{"$dateAdd": {"startDate": "2024-01-01T00:00:00",
        |  "unit": "hour", "amount": 1, "timezone": "+19:00"}}"""
        .stripMargin)) {
      val e = intercept[IllegalArgumentException] {
        run(s"""[{"$$addFields": {"x": $frag}}]""").collect()
      }
      assert(e.getMessage.contains("timezone") ||
        e.getMessage.contains("offset"), e.getMessage)
    }
    // (r15) the ISO envelope is ±18:00 TOTAL: +18:30 is out, +18:00 in
    val over = intercept[IllegalArgumentException] {
      run("""[{"$addFields": {"x": {"$hour": {
            |  "date": "2024-01-01T00:00:00",
            |  "timezone": "+18:30"}}}}]""".stripMargin).collect()
    }
    assert(over.getMessage.contains("offset"), over.getMessage)
    assert(MqlPipeline.tzOffsetSeconds("+18:00") == 18L * 3600)
    assert(MqlPipeline.tzOffsetSeconds("-18:00") == -18L * 3600)
    // (r15) $dateFromString with BOTH a timezone option and an
    // embedded offset in the string raises (Mongo's conflict error —
    // honoring the embedded offset then shifting again would silently
    // double-shift); an offsetless string still parses
    val conflict = intercept[Exception] {
      run("""[{"$addFields": {"x": {"$dateFromString": {
            |  "dateString": "2024-01-01T00:00:00+02:00",
            |  "timezone": "+05:30"}}}},
            | {"$project": {"x": 1}}]""".stripMargin).collect()
    }
    def msgsC(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgsC(t.getCause)
    assert(msgsC(conflict).exists(_.contains("conflict")),
      msgsC(conflict).toString)
    val zConflict = intercept[Exception] {
      run("""[{"$addFields": {"x": {"$dateFromString": {
            |  "dateString": "2024-01-01T00:00:00Z",
            |  "timezone": "+05:30"}}}},
            | {"$project": {"x": 1}}]""".stripMargin).collect()
    }
    assert(msgsC(zConflict).exists(_.contains("conflict")),
      msgsC(zConflict).toString)
    // a bare date's "-01" day segment is NOT an offset — still parses
    val bare = run(
      """[{"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {"x": {"$dateToString": {
        |   "format": "%Y-%m-%d %H:%M:%S",
        |   "date": {"$dateFromString": {
        |     "dateString": "2024-03-01",
        |     "timezone": "+05:30"}}}}}},
        | {"$project": {"x": 1}}]""".stripMargin).collect()(0)
    assert(bare.getString(0) == "2024-02-29 18:30:00", bare.toString)
  }

  test("extended date parts and calendar $dateDiff (r15): ISO and " +
      "Sunday-anchored weeks, iso week-year boundary, millisecond, " +
      "boundary counts with startOfWeek; bad options loud") {
    def longs(fields: String, adds: String): Seq[Long] = run(
      s"""[{"$$match": {"id": {"$$eq": 1}}},
         | {"$$addFields": {$adds}},
         | {"$$project": {$fields}}]""".stripMargin)
      .collect()(0).toSeq.map(_.asInstanceOf[Long])
    // 2023-01-01 is a Sunday: dayOfWeek 1, isoDayOfWeek 7, isoWeek 52
    // of isoWeekYear 2022, Mongo week ($week, %U) = 1 (Jan 1 IS the
    // first Sunday); Jan 2 (Monday) stays week 1
    assert(longs(
      """"a": {"$toLong": "$a"}, "b": {"$toLong": "$b"},
        |"c": {"$toLong": "$c"}, "d": {"$toLong": "$d"},
        |"e": {"$toLong": "$e"}, "f": {"$toLong": "$f"}""".stripMargin,
      """"a": {"$dayOfWeek": "2023-01-01T10:00:00"},
        |"b": {"$isoDayOfWeek": "2023-01-01T10:00:00"},
        |"c": {"$isoWeek": "2023-01-01T10:00:00"},
        |"d": {"$isoWeekYear": "2023-01-01T10:00:00"},
        |"e": {"$week": "2023-01-01T10:00:00"},
        |"f": {"$dayOfYear": "2023-02-01T10:00:00"}""".stripMargin) ==
      Seq(1L, 7L, 52L, 2022L, 1L, 32L))
    // 2021-01-01 (Friday): %U week 0 (before the year's first Sunday);
    // millisecond from a fractional parse
    assert(longs(
      """"a": {"$toLong": "$a"}, "b": {"$toLong": "$b"}""",
      """"a": {"$week": "2021-01-01T10:00:00"},
        |"b": {"$millisecond": {"$dateFromString": {
        |  "dateString": "2024-01-01T00:00:00.987"}}}""".stripMargin) ==
      Seq(0L, 987L))
    // $dateDiff calendar boundaries: Dec 31 → Jan 1 crosses one year,
    // one quarter, one month boundary regardless of hour; week counts
    // move with startOfWeek (Dec 31 2023 is a Sunday: a sunday-start
    // week boundary sits exactly on it, a monday-start one does not)
    assert(longs(
      """"y": {"$toLong": "$y"}, "q": {"$toLong": "$q"},
        |"m": {"$toLong": "$m"}, "w": {"$toLong": "$w"},
        |"wm": {"$toLong": "$wm"}""".stripMargin,
      """"y": {"$dateDiff": {"startDate": "2023-12-31T23:00:00",
        |  "endDate": "2024-01-01T01:00:00", "unit": "year"}},
        |"q": {"$dateDiff": {"startDate": "2023-12-31T23:00:00",
        |  "endDate": "2024-01-01T01:00:00", "unit": "quarter"}},
        |"m": {"$dateDiff": {"startDate": "2023-12-31T23:00:00",
        |  "endDate": "2024-01-01T01:00:00", "unit": "month"}},
        |"w": {"$dateDiff": {"startDate": "2023-12-30T12:00:00",
        |  "endDate": "2023-12-31T12:00:00", "unit": "week"}},
        |"wm": {"$dateDiff": {"startDate": "2023-12-30T12:00:00",
        |  "endDate": "2023-12-31T12:00:00", "unit": "week",
        |  "startOfWeek": "monday"}}""".stripMargin) ==
      Seq(1L, 1L, 1L, 1L, 0L))
    // guards: startOfWeek off-unit, bad weekday name, unknown option
    for ((pipe, frag) <- Seq(
      ("""{"$dateDiff": {"startDate": "2023-01-01T00:00:00",
         |  "endDate": "2023-02-01T00:00:00", "unit": "month",
         |  "startOfWeek": "monday"}}""".stripMargin, "startOfWeek"),
      ("""{"$dateDiff": {"startDate": "2023-01-01T00:00:00",
         |  "endDate": "2023-02-01T00:00:00", "unit": "week",
         |  "startOfWeek": "someday"}}""".stripMargin, "startOfWeek"),
      ("""{"$dateDiff": {"startDate": "2023-01-01T00:00:00",
         |  "endDate": "2023-02-01T00:00:00", "unit": "day",
         |  "banana": 1}}""".stripMargin, "option"))) {
      val e = intercept[IllegalArgumentException] {
        run(s"""[{"$$addFields": {"x": $pipe}}]""").collect()
      }
      assert(e.getMessage.contains(frag), e.getMessage)
    }
  }

  test("named-tz sub-day $dateDiff (r17): wall-clock label counts " +
      "across the NY spring-forward gap and fall-back overlap") {
    def longs(fields: String, adds: String): Seq[Long] = run(
      s"""[{"$$match": {"id": {"$$eq": 1}}},
         | {"$$addFields": {$adds}},
         | {"$$project": {$fields}}]""".stripMargin)
      .collect()(0).toSeq.map(_.asInstanceOf[Long])
    def dd(s: String, e: String, u: String): String =
      s"""{"$$dateDiff": {"startDate": "$s", "endDate": "$e",
         |  "unit": "$u", "timezone": "America/New_York"}}""".stripMargin
    // spring forward 2023-03-12 07:00Z (02:00 EST -> 03:00 EDT):
    // 06:30Z = 01:30 EST, 07:30Z = 03:30 EDT — ONE physical hour, but
    // the skipped 02:xx labels still count: 2 hour boundaries, 120
    // minute boundaries. The SECOND unit ignores the timezone (r18,
    // Mongo's dateDiffSecond contract — raw epoch subtraction): 3600.
    assert(longs(
      """"h": {"$toLong": "$h"}, "m": {"$toLong": "$m"},
        |"s": {"$toLong": "$s"}""".stripMargin,
      s""""h": ${dd("2023-03-12T06:30:00", "2023-03-12T07:30:00", "hour")},
         |"m": ${dd("2023-03-12T06:30:00", "2023-03-12T07:30:00", "minute")},
         |"s": ${dd("2023-03-12T06:30:00", "2023-03-12T07:30:00", "second")}"""
        .stripMargin) == Seq(2L, 120L, 3600L))
    // fall back 2023-11-05 06:00Z (02:00 EDT -> 01:00 EST):
    // 04:30Z = 00:30 EDT, 06:30Z = 01:30 EST — TWO physical hours, the
    // repeated 01:xx hour counts once: 1 hour boundary, 60 minutes;
    // seconds stay physical: 7200
    assert(longs(
      """"h": {"$toLong": "$h"}, "m": {"$toLong": "$m"},
        |"s": {"$toLong": "$s"}""".stripMargin,
      s""""h": ${dd("2023-11-05T04:30:00", "2023-11-05T06:30:00", "hour")},
         |"m": ${dd("2023-11-05T04:30:00", "2023-11-05T06:30:00", "minute")},
         |"s": ${dd("2023-11-05T04:30:00", "2023-11-05T06:30:00", "second")}"""
        .stripMargin) == Seq(1L, 60L, 7200L))
    // off-transition sanity: a named zone behaves like its fixed
    // offset (13:00Z -> 15:10Z in July = EDT throughout)
    assert(longs(
      """"h": {"$toLong": "$h"}""",
      s""""h": ${dd("2023-07-01T13:00:00", "2023-07-01T15:10:00", "hour")}"""
    ) == Seq(2L))
  }

  test("$dateFromString format/onNull/onError (r15): %-format parse, " +
      "null and error routing, raise without onError, parse-only " +
      "specifiers loud") {
    def one(adds: String): String = run(
      s"""[{"$$match": {"id": {"$$eq": 1}}},
         | {"$$addFields": {"x": {"$$dateToString": {
         |   "format": "%Y-%m-%d %H:%M:%S", "date": $adds}}}},
         | {"$$project": {"x": 1}}]""".stripMargin)
      .collect()(0).getString(0)
    assert(one(
      """{"$dateFromString": {"dateString": "03/15/2024 14:30",
        |  "format": "%m/%d/%Y %H:%M"}}""".stripMargin) ==
      "2024-03-15 14:30:00")
    // format + fixed-offset timezone compose (wall clock → instant)
    assert(one(
      """{"$dateFromString": {"dateString": "03/15/2024 14:30",
        |  "format": "%m/%d/%Y %H:%M", "timezone": "+05:30"}}"""
        .stripMargin) == "2024-03-15 09:00:00")
    // unparseable → onError; null dateString → onNull
    assert(one(
      """{"$dateFromString": {"dateString": "nonsense",
        |  "format": "%m/%d/%Y %H:%M",
        |  "onError": "1999-12-31T23:59:59"}}""".stripMargin) ==
      "1999-12-31 23:59:59")
    assert(one(
      """{"$dateFromString": {"dateString": "$no_such_field",
        |  "onNull": "1970-01-01T00:00:00"}}""".stripMargin) ==
      "1970-01-01 00:00:00")
    // unparseable WITHOUT onError raises per row (Mongo's error —
    // the pre-r15 silent null was a quiet divergence)
    val e = intercept[Exception] {
      run("""[{"$match": {"id": {"$eq": 1}}},
            | {"$addFields": {"x": {"$dateFromString": {
            |   "dateString": "not a date"}}}},
            | {"$project": {"x": 1}}]""".stripMargin).collect()
    }
    def msgsF(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgsF(t.getCause)
    assert(msgsF(e).exists(_.contains("could not parse")),
      msgsF(e).toString)
    // %L/%j/%Z are render-only — parsing them is loud
    val lf = intercept[IllegalArgumentException] {
      run("""[{"$addFields": {"x": {"$dateFromString": {
            |  "dateString": "x", "format": "%H:%M:%S.%L"}}}}]"""
        .stripMargin)
    }
    assert(lf.getMessage.contains("render-only"), lf.getMessage)
    // unknown options loud
    intercept[IllegalArgumentException] {
      run("""[{"$addFields": {"x": {"$dateFromString": {
            |  "dateString": "x", "banana": 1}}}}]""".stripMargin)
    }
  }

  test("$millisecond with a timezone document keeps the sub-second " +
      "part (r16 — the zone shift rode second-truncating " +
      "unix_timestamp and zeroed it)") {
    def ms(tz: String): Long = run(
      s"""[{"$$match": {"id": {"$$eq": 1}}},
         | {"$$addFields": {"x": {"$$millisecond": {
         |   "date": {"$$dateFromString": {
         |     "dateString": "2024-01-01T00:00:00.987"}},
         |   "timezone": "$tz"}}}},
         | {"$$project": {"x": {"$$toLong": "$$x"}}}]""".stripMargin)
      .collect()(0).getLong(0)
    // millis are zone-invariant (offsets are whole minutes): same 987
    // under a fixed offset AND a named DST zone
    assert(ms("+05:30") == 987L)
    assert(ms("America/New_York") == 987L)
    // ... while the zone DOES move the whole-second parts (the shift
    // itself still happens): hour in +05:30 is 05, not 00
    val h = run(
      """[{"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {"x": {"$hour": {
        |   "date": "2024-01-01T00:00:00", "timezone": "+05:30"}}}},
        | {"$project": {"x": {"$toLong": "$x"}}}]""".stripMargin)
      .collect()(0).getLong(0)
    assert(h == 5L)
  }

  test("$dateFromString embedded-offset conflict outranks onError " +
      "(r16 — a string whose trailing offset breaks the format parse " +
      "must still raise, not route to onError)") {
    def msgsC(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgsC(t.getCause)
    val e = intercept[Exception] {
      run("""[{"$match": {"id": {"$eq": 1}}},
            | {"$addFields": {"x": {"$dateFromString": {
            |   "dateString": "2024-03-15T14:30:00+02:00",
            |   "format": "%Y-%m-%dT%H:%M:%S", "timezone": "+05:30",
            |   "onError": "1999-12-31T23:59:59"}}}},
            | {"$project": {"x": 1}}]""".stripMargin).collect()
    }
    assert(msgsC(e).exists(_.contains("explicit offset")), msgsC(e).toString)
    // a plain parse failure (no embedded offset) still routes to onError
    val ok = run(
      """[{"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {"x": {"$dateToString": {
        |   "format": "%Y-%m-%d %H:%M:%S",
        |   "date": {"$dateFromString": {
        |     "dateString": "nonsense",
        |     "format": "%Y-%m-%dT%H:%M:%S", "timezone": "+05:30",
        |     "onError": "1999-12-31T23:59:59"}}}}}},
        | {"$project": {"x": 1}}]""".stripMargin).collect()(0).getString(0)
    assert(ok == "1999-12-31 23:59:59", ok)
  }

  test("named-timezone (DST) date operators (r15/r17): offsets move " +
      "with the instant, gap shifts forward, overlap prefers the base " +
      "offset, sub-day $dateDiff counts wall-clock labels, " +
      "past-horizon instants stay loud") {
    def one(expr: String): String = run(
      s"""[{"$$match": {"id": {"$$eq": 1}}},
         | {"$$addFields": {"x": {"$$dateToString": {
         |   "format": "%Y-%m-%d %H:%M:%S", "date": $expr}}}},
         | {"$$project": {"x": 1}}]""".stripMargin)
      .collect()(0).getString(0)
    // rendering in the zone: EST in January, EDT in July (the whole
    // point — one zone id, two offsets)
    val jan = run(
      """[{"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {"x": {"$dateToString": {
        |   "format": "%Y-%m-%d %H:%M:%S",
        |   "date": "2023-01-15T12:00:00",
        |   "timezone": "America/New_York"}}}},
        | {"$project": {"x": 1}}]""".stripMargin).collect()(0).getString(0)
    assert(jan == "2023-01-15 07:00:00", jan) // UTC-5
    val jul = run(
      """[{"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {"x": {"$dateToString": {
        |   "format": "%Y-%m-%d %H:%M:%S",
        |   "date": "2023-07-15T12:00:00",
        |   "timezone": "America/New_York"}}}},
        | {"$project": {"x": 1}}]""".stripMargin).collect()(0).getString(0)
    assert(jul == "2023-07-15 08:00:00", jul) // UTC-4
    // $dateAdd day ACROSS spring-forward keeps the local wall clock:
    // 2023-03-11 21:00 EST (02:00 UTC Mar 12) + 1 day = Mar 12 21:00
    // EDT = 01:00 UTC Mar 13 — 23 physical hours, the DST-aware day
    val springDay = one(
      """{"$dateAdd": {"startDate": "2023-03-12T02:00:00",
        |  "unit": "day", "amount": 1,
        |  "timezone": "America/New_York"}}""".stripMargin)
    assert(springDay == "2023-03-13 01:00:00", springDay)
    // +1 day landing IN the gap: base 02:30 EST Mar 11 (07:30 UTC) →
    // local Mar 12 02:30 does not exist → shifts forward by the gap
    // to 03:30 EDT = 07:30 UTC (java.time's resolution)
    val gapDay = one(
      """{"$dateAdd": {"startDate": "2023-03-11T07:30:00",
        |  "unit": "day", "amount": 1,
        |  "timezone": "America/New_York"}}""".stripMargin)
    assert(gapDay == "2023-03-12 07:30:00", gapDay)
    // +1 day landing IN the overlap: base 01:30 EDT Nov 4 (05:30 UTC)
    // → local Nov 5 01:30 exists twice → the base offset (EDT) is
    // still valid → the EARLIER instant, 05:30 UTC
    val overDay = one(
      """{"$dateAdd": {"startDate": "2023-11-04T05:30:00",
        |  "unit": "day", "amount": 1,
        |  "timezone": "America/New_York"}}""".stripMargin)
    assert(overDay == "2023-11-05 05:30:00", overDay)
    // $dateFromString reads the zone's wall clock; a string INSIDE the
    // skipped hour shifts forward (02:30 → 03:30 EDT = 07:30 UTC), one
    // inside the repeated hour takes the earlier instant (01:30 EDT =
    // 05:30 UTC, not 01:30 EST = 06:30)
    val fsGap = one(
      """{"$dateFromString": {"dateString": "2023-03-12T02:30:00",
        |  "timezone": "America/New_York"}}""".stripMargin)
    assert(fsGap == "2023-03-12 07:30:00", fsGap)
    val fsOver = one(
      """{"$dateFromString": {"dateString": "2023-11-05T01:30:00",
        |  "timezone": "America/New_York"}}""".stripMargin)
    assert(fsOver == "2023-11-05 05:30:00", fsOver)
    // sub-day $dateDiff in a named zone (r17 — the r15 refusal
    // lifted): wall-clock label arithmetic; Jan 1 (UTC instant,
    // 19:00 EST local) → Jul 1 (20:00 EDT local) spans the spring
    // transition, so the label count is one MORE than the 4344
    // physical hours (the local clock jumps ahead across the gap)
    val subDay = run(
      """[{"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {"x": {"$toLong": {"$dateDiff": {
        |  "startDate": "2023-01-01T00:00:00",
        |  "endDate": "2023-07-01T00:00:00", "unit": "hour",
        |  "timezone": "America/New_York"}}}}},
        | {"$project": {"x": 1}}]""".stripMargin)
      .collect()(0).getLong(0)
    assert(subDay == 4345L, s"got $subDay")
    // past the baked horizon (2200 since r18): loud per row, never a
    // silently frozen last rule
    val horizon = intercept[Exception] {
      run("""[{"$match": {"id": {"$eq": 1}}},
            | {"$addFields": {"x": {"$dateAdd": {
            |   "startDate": "2199-12-31T12:00:00", "unit": "month",
            |   "amount": 1, "timezone": "America/New_York"}}}},
            | {"$project": {"x": 1}}]""".stripMargin).collect()
    }
    def msgsH(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgsH(t.getCause)
    assert(msgsH(horizon).exists(_.contains("horizon")),
      msgsH(horizon).toString)
  }

  test("$convert to date: ISO strings convert with onError/onNull " +
      "routing; numeric input refuses loudly (r14)") {
    val ok = run(
      """[
        | {"$match": {"id": {"$lte": 3}}},
        | {"$addFields": {"d": {"$convert": {
        |   "input": {"$cond": [{"$eq": ["$id", 2]},
        |     "garbage", "2024-06-15T08:30:00"]},
        |   "to": "date", "onError": "1999-12-31T23:59:59"}}}},
        | {"$addFields": {"lbl": {"$dateToString": {
        |   "format": "%Y-%m-%d %H:%M:%S", "date": "$d"}}}},
        | {"$project": {"id": {"$toLong": "$id"}, "lbl": 1}},
        | {"$sort": {"id": 1}}
        |]""".stripMargin).collect()
    assert(ok.map(_.getString(1)).toSeq == Seq(
      "2024-06-15 08:30:00", "1999-12-31 23:59:59",
      "2024-06-15 08:30:00"), ok.mkString("|"))
    // integral input (r17): Mongo's epoch-millis semantics via the
    // explicit millis constructor — id 1 → 1 ms after the epoch
    val ms = run(
      """[{"$match": {"id": {"$eq": 1}}},
        | {"$addFields": {"d": {"$convert": {
        |   "input": {"$toLong": "$v"}, "to": "date"}}}},
        | {"$addFields": {"lbl": {"$dateToString": {
        |   "format": "%Y-%m-%d %H:%M:%S", "date": "$d"}},
        |   "msec": {"$millisecond": "$d"}}},
        | {"$project": {"lbl": 1, "msec": {"$toLong": "$msec"}}}
        |]""".stripMargin).collect()(0)
    // v = 10 for id 1 → 10 ms after the epoch
    assert(ms.getString(0) == "1970-01-01 00:00:00" &&
      ms.getLong(1) == 10L, ms.toString)
    // a DOUBLE input stays loud (fractional-millis handling is not
    // pinnable): $toDouble breaks the integral structural proof
    val num = intercept[IllegalArgumentException] {
      run("""[{"$addFields": {"d": {"$convert": {
            |  "input": {"$toDouble": "$id"}, "to": "date"}}}}]"""
        .stripMargin).collect()
    }
    assert(num.getMessage.contains("INTEGRAL"), num.getMessage)
  }

  test("$convert: onError/onNull route, missing onError RAISES per " +
      "row, to-string loud") {
    val ok = run(
      """[
        | {"$addFields": {"v": {"$convert": {"input": "$grp",
        |   "to": "long", "onError": -1, "onNull": 0}}}},
        | {"$project": {"id": {"$toLong": "$id"},
        |   "v": {"$toLong": "$v"}}},
        | {"$sort": {"id": 1}}
        |]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // grp is 'a'/'b'/'c' — never numeric: every row takes onError
    assert(ok.map(_._2).forall(_ == -1L), ok.toString)
    val boom = intercept[Exception] {
      run("""[{"$addFields": {"v": {"$convert": {"input": "$grp",
            |  "to": "long"}}}}]""".stripMargin).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(boom).exists(_.contains("$convert")), msgs(boom).toString)
    // r13: to-string works on the provable integral/bool/string
    // bracket (digits / true/false / identity with onNull)...
    val strOk = run(
      """[
        | {"$addFields": {"vl": {"$convert": {"input": "$grp",
        |   "to": "long", "onError": -7}}}},
        | {"$project": {"id": {"$toLong": "$id"},
        |   "sl": {"$convert": {"input": "$vl", "to": "string"}},
        |   "sb": {"$convert": {"input": {"$gt": [{"$toLong": "$id"}, 3]},
        |     "to": "string"}},
        |   "ss": {"$convert": {"input": "$grp", "to": "string",
        |     "onNull": "missing"}}}},
        | {"$sort": {"id": 1}}
        |]""".stripMargin).collect()
    assert(strOk.forall(_.getString(1) == "-7"), strOk.mkString("|"))
    assert(strOk.map(r => (r.getLong(0), r.getString(2))).forall {
      case (id, sb) => sb == (if (id > 3) "true" else "false") },
      strOk.mkString("|"))
    assert(strOk.forall(r => Seq("a", "b", "c").contains(r.getString(3))),
      strOk.mkString("|"))
    // ...unprovable inputs stay loud (float formatting is
    // engine-divergent)
    val str = intercept[IllegalArgumentException] {
      run("""[{"$addFields": {"v": {"$convert": {"input":
            |  {"$multiply": [{"$toLong": "$id"}, 2]},
            |  "to": "string"}}}}]""".stripMargin)
    }
    assert(str.getMessage.contains("engine-divergent"), str.getMessage)
    // (r15) PROVABLY-double inputs pass through the exactly-integral
    // sub-bracket: integral values render as digits...
    val dOk = run(
      """[
        | {"$project": {"id": {"$toLong": "$id"},
        |   "ds": {"$convert": {"input": {"$toDouble": "$id"},
        |     "to": "string"}}}},
        | {"$sort": {"id": 1}}
        |]""".stripMargin).collect()
    assert(dOk.forall(r => r.getString(1) == r.getLong(0).toString),
      dOk.mkString("|"))
    // ...and a FRACTIONAL double raises per row with the bracket
    // reason (onError must NOT swallow it — Mongo's double→string
    // never errors, so onError would misreport a refusal)
    val frac = intercept[Exception] {
      run("""[{"$project": {"v": {"$convert": {"input":
            |  {"$toDouble": {"$divide": [{"$toLong": "$id"}, 2]}},
            |  "to": "string", "onError": "nope"}}}},
            | {"$sort": {"v": 1}}]""".stripMargin).collect()
    }
    def msgsF(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgsF(t.getCause)
    assert(msgsF(frac).exists(_.contains("integral")), msgsF(frac).toString)
  }

  test("$scoreFusion: minMaxScaler weighted average over two scored " +
      "legs; 'none' floors exactly on negatives; guards loud") {
    val base = df.withColumn("meta", to_json(struct(col("id"),
      get_json_object(col("meta"), "$.v").cast("long").as("v"))))
    def leg(scoreExpr: String, lim: Int) =
      s"""[{"$$project": {"_id": {"$$toLong": "$$id"},
         |    "_score": $scoreExpr}},
         |  {"$$sort": {"_score": -1, "_id": 1}},
         |  {"$$limit": $lim}]""".stripMargin
    // hi top-3 by v desc: 5(100), 2(20), 1(10) -> minmax over
    // {100,20,10}: 1000000 / 111111 / 0; lo top-3 by -v desc (v asc):
    // 3(-5), 4(-7), 1(-10) -> minmax over {-5,-7,-10}:
    // 1000000 / 600000 / 0. Weighted avg (hi 2, lo 1, W=3).
    val fused = MqlPipeline.aggregate(base, col("meta"),
      s"""[{"$$scoreFusion": {
         |   "input": {"pipelines": {
         |     "hi": ${leg("""{"$toLong": "$v"}""", 3)},
         |     "lo": ${leg("""{"$toLong": {"$subtract": [0, {"$toLong": "$v"}]}}""",
             3)}},
         |    "normalization": "minMaxScaler"},
         |   "combination": {"weights": {"hi": 2}},
         |   "scoreDetails": true}}]""".stripMargin)
    assert(fused.columns.toSeq ==
      Seq("_id", "hi_norm", "lo_norm", "score"))
    val rows = fused.select("_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq(5L -> 666666L, 3L -> 333333L,
      4L -> 200000L, 2L -> 74074L, 1L -> 0L))
    // "none": a doc scored -7 by one leg of two (W=2) must FLOOR to
    // -4, not truncate to -3 (the pmod device = DuckDB's //)
    val negFloor = MqlPipeline.aggregate(base, col("meta"),
      s"""[{"$$scoreFusion": {
         |   "input": {"pipelines": {
         |     "a": ${leg("""{"$toLong": {"$subtract": [0, {"$toLong": "$v"}]}}""",
             2)},
         |     "b": ${leg("""{"$toLong": "$v"}""", 1)}},
         |    "normalization": "none"}}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // a top-2: 3(-5), 4(-7); b top-1: 5(100)
    assert(negFloor(4L) == -4L) // floor(-7/2), not trunc -3
    assert(negFloor(3L) == -3L) // floor(-5/2)
    assert(negFloor(5L) == 50L)
    // sigmoid (r16): the baked-table normalization — v ∈ {10, 20, 5,
    // 7, 100} exercises the curve through BOTH legs (σ(±v):
    // 999954/45, 993307/6692, 999088/911) and the ±20 saturation
    // clamp (σ(100) ≡ σ(20) ≡ 999999 at the 10⁶ scale); fused
    // score = (3·σ(v) + σ(−v)) DIV 4 with both legs scoring all docs
    val sig = MqlPipeline.aggregate(base, col("meta"),
      s"""[{"$$scoreFusion": {
         |   "input": {"pipelines": {
         |     "a": ${leg("""{"$toLong": "$v"}""", 5)},
         |     "b": ${leg("""{"$toLong": {"$subtract": [0, {"$toLong": "$v"}]}}""",
           5)}},
         |    "normalization": "sigmoid"},
         |   "combination": {"weights": {"a": 3}}}}]""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sig.toSeq == Seq(2L -> 749999L, 5L -> 749999L,
      1L -> 749976L, 4L -> 749543L, 3L -> 746653L), sig.toSeq.toString)
    val noNorm = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(base, col("meta"),
        s"""[{"$$scoreFusion": {
           |  "input": {"pipelines": {
           |    "a": ${leg("""{"$toLong": "$v"}""", 2)},
           |    "b": ${leg("""{"$toLong": "$v"}""", 2)}}}}}]"""
          .stripMargin)
    }
    assert(noNorm.getMessage.contains("normalization"),
      noNorm.getMessage)
    val noScore = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(base, col("meta"),
        s"""[{"$$scoreFusion": {
           |  "input": {"pipelines": {
           |    "a": [{"$$project": {"_id": {"$$toLong": "$$id"}}},
           |          {"$$sort": {"_id": 1}}, {"$$limit": 2}],
           |    "b": ${leg("""{"$toLong": "$v"}""", 2)}},
           |   "normalization": "none"}}}]""".stripMargin)
    }
    assert(noScore.getMessage.contains("_score"), noScore.getMessage)
    val exprMethod = intercept[IllegalArgumentException] {
      MqlPipeline.aggregate(base, col("meta"),
        s"""[{"$$scoreFusion": {
           |  "input": {"pipelines": {
           |    "a": ${leg("""{"$toLong": "$v"}""", 2)},
           |    "b": ${leg("""{"$toLong": "$v"}""", 2)}},
           |   "normalization": "none"},
           |  "combination": {"method": "expression"}}}]""".stripMargin)
    }
    assert(exprMethod.getMessage.contains("avg"), exprMethod.getMessage)
  }
}
