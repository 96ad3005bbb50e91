package graft.filter

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.util.Random

/** Pipeline-level fuzz: random $match → $sort → $group → $sort
  * pipelines evaluated by the Catalyst translation must agree with a
  * direct in-memory evaluation over a fixed corpus — the same contract
  * MqlFilterPropSpec pins for single predicates, lifted to whole
  * pipelines (stage folding, accumulator translation, group-null
  * semantics). Deterministic seed; every field present in every doc so
  * the property tests the translator, not missing-field conventions
  * (those have their own directed specs). */
class MqlPipelinePropSpec extends SparkTestBase {
  import spark.implicits._

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
