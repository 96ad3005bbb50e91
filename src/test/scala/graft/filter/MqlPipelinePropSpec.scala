package graft.filter

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property fuzz for the pipeline translator: random
  * $match → $group → (having $match) → $sort pipelines evaluated by
  * Catalyst must agree with a direct in-memory evaluation — including
  * missing-field semantics (absent v contributes nothing to $sum/$max;
  * absent grp groups under the null _id, as Mongo groups missing keys). */
class MqlPipelinePropSpec extends SparkTestBase {
  import spark.implicits._

  // (id, Option[grp], Option[v]) — every presence combination occurs
  private val corpus: Seq[(Long, Option[String], Option[Long])] =
    (0L until 40L).map { i =>
      val grp = if (i % 7 == 6) None else Some(s"g${i % 4}")
      val v = if (i % 5 == 4) None else Some(i % 13)
      (i, grp, v)
    }

  private lazy val df = corpus.map { case (i, g, v) =>
    val fields = g.map(x => s""""grp": "$x"""").toSeq ++
      v.map(x => s""""v": $x""").toSeq
    (i, fields.mkString("{", ", ", "}"))
  }.toDF("id", "meta").cache()

  private case class Pipe(matchLt: Option[Long], havingMin: Option[Long]) {
    def json: String = {
      val m = matchLt.map(b => s"""{"$$match": {"v": {"$$lt": $b}}},""")
        .getOrElse("")
      val h = havingMin.map(b => s"""{"$$match": {"n": {"$$gte": $b}}},""")
        .getOrElse("")
      s"""[$m
         |{"$$group": {"_id": "$$grp", "n": {"$$sum": 1},
         |  "t": {"$$sum": {"$$toLong": "$$v"}},
         |  "mx": {"$$max": {"$$toLong": "$$v"}}}},
         |$h
         |{"$$sort": {"_id": 1}}]""".stripMargin
    }
    /** In-memory twin. Sums over no defined v are null (Spark sum
      * semantics; Mongo emits 0 for $sum — we assert Spark's contract,
      * which the gate oracle mirrors with CAST(sum(..))). */
    def eval: Seq[(Option[String], Long, Option[Long], Option[Long])] = {
      val rows = corpus.filter { case (_, _, v) =>
        matchLt.forall(b => v.exists(_ < b)) }
      rows.groupBy(_._2).toSeq.map { case (g, rs) =>
        val vs = rs.flatMap(_._3)
        (g, rs.size.toLong,
          if (vs.isEmpty) None else Some(vs.sum),
          if (vs.isEmpty) None else Some(vs.max))
      }.filter { case (_, n, _, _) => havingMin.forall(n >= _) }
        // BSON asc order: the null/missing group first, then lexicographic
        .sortBy { case (g, _, _, _) => (g.isDefined, g.getOrElse("")) }
    }
  }

  private val genPipe: Gen[Pipe] = for {
    m <- Gen.option(Gen.choose(1L, 14L))
    h <- Gen.option(Gen.choose(1L, 6L))
  } yield Pipe(m, h)

  test("random pipelines: Catalyst translation == in-memory model") {
    val prop = Prop.forAll(genPipe) { p =>
      val got = MqlPipeline.aggregate(df, col("meta"), p.json)
        .collect().map { r =>
          (Option(r.getString(0)), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))
        }.toSeq
      val want = p.eval
      if (got != want)
        println(s"MISMATCH ${p.json}:\n got=$got\n want=$want")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}

/** Second fuzz battery over an all-fields-present corpus: the
  * order-sensitive accumulators ($first/$last over a doc-order $sort)
  * and random $bucket boundary sets — the r7 stages — against direct
  * Scala evaluation. Deterministic seeds; presence/missing semantics
  * are the FIRST battery's job. */
class MqlPipelineAccumPropSpec extends SparkTestBase {
  import spark.implicits._
  import scala.util.Random

  private case class Doc(id: Long, grp: String, v: Long, w: Long)

  private val rnd = new Random(20260812L)
  private val docs: Seq[Doc] = (0L until 300L).map { i =>
    Doc(i, s"g${rnd.nextInt(6)}", rnd.nextInt(100).toLong,
      rnd.nextInt(1000).toLong)
  }

  private lazy val df = docs
    .map(d => (d.id, s"""{"grp": "${d.grp}", "v": ${d.v}, "w": ${d.w}}"""))
    .toDF("id", "meta").cache()

  test("random $match/$sort/$group pipelines agree with the in-memory model") {
    val r = new Random(4242L)
    for (round <- 1 to 25) {
      val lo = r.nextInt(80)
      val hi = lo + 5 + r.nextInt(40)
      val grps = (0 until 1 + r.nextInt(4)).map(_ => s"g${r.nextInt(6)}")
        .distinct
      val pipeline =
        s"""[
           | {"$$match": {"$$and": [
           |   {"v": {"$$gte": $lo}}, {"v": {"$$lt": $hi}},
           |   {"grp": {"$$in": [${grps.map(g => s""""$g"""").mkString(",")}]}}]}},
           | {"$$sort": {"id": 1}},
           | {"$$group": {"_id": "$$grp",
           |   "n": {"$$sum": 1},
           |   "t": {"$$sum": {"$$toLong": "$$w"}},
           |   "mx": {"$$max": {"$$toLong": "$$v"}},
           |   "fst": {"$$first": {"$$toLong": "$$id"}},
           |   "lst": {"$$last": {"$$toLong": "$$id"}}}},
           | {"$$sort": {"_id": 1}}
           |]""".stripMargin
      val kept = docs.filter(d =>
        d.v >= lo && d.v < hi && grps.contains(d.grp))
      val expect = kept.groupBy(_.grp).toSeq.sortBy(_._1).map {
        case (g, ds) =>
          val sorted = ds.sortBy(_.id)
          (g, ds.size.toLong, ds.map(_.w).sum, ds.map(_.v).max,
            sorted.head.id, sorted.last.id)
      }
      val got = MqlPipeline.aggregate(df, col("meta"), pipeline)
        .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getLong(4), x.getLong(5))).toSeq
      assert(got == expect,
        s"round $round lo=$lo hi=$hi grps=$grps\ngot   =$got\nexpect=$expect")
    }
  }

  test("random $setWindowFields (bounded sums, shifts, docnum) agree " +
      "with the in-memory model") {
    val r = new Random(991L)
    for (round <- 1 to 20) {
      val lo = -(1 + r.nextInt(3)) // trailing window [lo, 0]
      val unbounded = r.nextBoolean()
      val by = r.nextInt(5) - 2 // shift in [-2, 2]
      val win =
        if (unbounded) """{"documents": ["unbounded", "current"]}"""
        else s"""{"documents": [$lo, 0]}"""
      val pipeline =
        s"""[
           | {"$$setWindowFields": {
           |   "partitionBy": "$$grp",
           |   "sortBy": {"id": 1},
           |   "output": {
           |     "seq": {"$$documentNumber": {}},
           |     "run": {"$$sum": {"$$toLong": "$$v"}, "window": $win},
           |     "sh": {"$$shift": {"output": {"$$toLong": "$$v"},
           |       "by": $by, "default": -1}}}}},
           | {"$$sort": {"id": 1}},
           | {"$$project": {"id": 1, "seq": 1, "run": 1, "sh": 1}}
           |]""".stripMargin
      val expect = docs.groupBy(_.grp).values.flatMap { ds =>
        val sorted = ds.sortBy(_.id).toIndexedSeq
        sorted.zipWithIndex.map { case (d, i) =>
          val from = if (unbounded) 0 else math.max(0, i + lo)
          val run = (from to i).map(sorted(_).v).sum
          val j = i + by
          val sh =
            if (j >= 0 && j < sorted.length) sorted(j).v else -1L
          (d.id, i + 1, run, sh)
        }
      }.toSeq.sortBy(_._1)
      val got = MqlPipeline.aggregate(df, col("meta"), pipeline)
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2),
          x.getLong(3))).toSeq
      assert(got == expect,
        s"round $round lo=$lo unb=$unbounded by=$by\n" +
          s"got   =${got.take(8)}\nexpect=${expect.take(8)}")
    }
  }

  test("random $bucket boundaries agree with the in-memory histogram") {
    val r = new Random(777L)
    for (round <- 1 to 15) {
      val nb = 2 + r.nextInt(4)
      val bs = Seq.iterate(r.nextInt(20), nb + 1)(b =>
        b + 5 + r.nextInt(30))
      val pipeline =
        s"""[{"$$bucket": {"groupBy": "$$v",
           | "boundaries": [${bs.mkString(",")}], "default": -1,
           | "output": {"n": {"$$sum": 1},
           |   "t": {"$$sum": {"$$toLong": "$$w"}}}}}]""".stripMargin
      val expect = docs.groupBy { d =>
        bs.init.zip(bs.tail).collectFirst {
          case (a, b) if d.v >= a && d.v < b => a.toLong
        }.getOrElse(-1L)
      }.toSeq.sortBy(_._1).map { case (b, ds) =>
        (b, ds.size.toLong, ds.map(_.w).sum) }
      val got = MqlPipeline.aggregate(df, col("meta"), pipeline)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .toSeq
      assert(got == expect, s"round $round bs=$bs\ngot=$got\nexp=$expect")
    }
  }
}
