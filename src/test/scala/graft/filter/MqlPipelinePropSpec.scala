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
