package graft.api

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the positional/dotted update machinery: random
  * documents and random positional updates evaluated by
  * [[Collection.applyUpdateOps]] must agree with an INDEPENDENT
  * in-memory model (plain Scala maps/vectors — no Jackson navigation
  * shared with the implementation). Covers $set/$inc/$unset over
  * `arr.$[]`, `arr.$[ident]` (+arrayFilters), `arr.$` (query
  * first-match), nested `arr.$[i].field` paths and plain dotted
  * paths. Documents are integer-valued so equality is exact. */
class UpdateOpsPropSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ---- model document: top-level scalars + one array -----------------
  // doc = {a: Long, b: Long, arr: [Long...], rs: [{k: Long, v: Long}...]}
  case class Doc(a: Long, b: Long, arr: Vector[Long],
      rs: Vector[(Long, Long)]) {
    def json: String = {
      val rsJ = rs.map { case (k, v) => s"""{"k": $k, "v": $v}""" }
        .mkString("[", ",", "]")
      s"""{"a": $a, "b": $b, "arr": ${arr.mkString("[", ",", "]")},
         | "rs": $rsJ}""".stripMargin.replace("\n", "")
    }
  }

  private val genDoc: Gen[Doc] = for {
    a <- Gen.choose(-5L, 5L)
    b <- Gen.choose(-5L, 5L)
    arr <- Gen.listOfN(4, Gen.choose(-10L, 10L)).map(_.toVector)
    rs <- Gen.listOfN(3, for {
      k <- Gen.choose(0L, 3L); v <- Gen.choose(-10L, 10L)
    } yield (k, v)).map(_.toVector)
  } yield Doc(a, b, arr, rs)

  // ---- update under test + its model evaluation ----------------------
  sealed trait Upd {
    def json: String
    def afJson: String
    def queryJson: String
    def model(d: Doc): Option[Doc] // None = must throw (loud)
  }

  /** {$inc: {"arr.$[]": delta}} */
  case class IncAll(delta: Long) extends Upd {
    def json = s"""{"$$inc": {"arr.$$[]": $delta}}"""
    def afJson: String = null
    def queryJson = "{}"
    def model(d: Doc) = Some(d.copy(arr = d.arr.map(_ + delta)))
  }

  /** {$set: {"arr.$[low]": v}}, arrayFilters [{low: {$lt: t}}] */
  case class SetFiltered(t: Long, v: Long) extends Upd {
    def json = s"""{"$$set": {"arr.$$[low]": $v}}"""
    def afJson = s"""[{"low": {"$$lt": $t}}]"""
    def queryJson = "{}"
    def model(d: Doc) =
      Some(d.copy(arr = d.arr.map(x => if (x < t) v else x)))
  }

  /** {$inc: {"arr.$": delta}} with query {arr: {$gte: t}} — first
    * element >= t; loud when nothing matches. */
  case class IncFirst(t: Long, delta: Long) extends Upd {
    def json = s"""{"$$inc": {"arr.$$": $delta}}"""
    def afJson: String = null
    def queryJson = s"""{"arr": {"$$gte": $t}}"""
    def model(d: Doc) = {
      val i = d.arr.indexWhere(_ >= t)
      if (i < 0) None
      else Some(d.copy(arr = d.arr.updated(i, d.arr(i) + delta)))
    }
  }

  /** {$inc: {"rs.$[e].v": delta}}, arrayFilters [{"e.k": kk}] */
  case class IncNested(kk: Long, delta: Long) extends Upd {
    def json = s"""{"$$inc": {"rs.$$[e].v": $delta}}"""
    def afJson = s"""[{"e.k": $kk}]"""
    def queryJson = "{}"
    def model(d: Doc) = Some(d.copy(rs = d.rs.map { case (k, v) =>
      if (k == kk) (k, v + delta) else (k, v) }))
  }

  /** {$unset: {"arr.$[hi]": ""}} — array slots NULL, never shift. */
  case class UnsetFiltered(t: Long) extends Upd {
    def json = s"""{"$$unset": {"arr.$$[hi]": ""}}"""
    def afJson = s"""[{"hi": {"$$gte": $t}}]"""
    def queryJson = "{}"
    def model(d: Doc) = Some(d) // handled specially (null slots)
    def nulls(d: Doc): Set[Int] =
      d.arr.zipWithIndex.collect { case (x, i) if x >= t => i }.toSet
  }

  /** plain dotted $set creating intermediates */
  case class SetDotted(v: Long) extends Upd {
    def json = s"""{"$$set": {"m.x.y": $v}}"""
    def afJson: String = null
    def queryJson = "{}"
    def model(d: Doc) = Some(d)
  }

  private val genUpd: Gen[Upd] = Gen.oneOf(
    Gen.zip(Gen.choose(-3L, 3L)).map(t => IncAll(t)),
    for { t <- Gen.choose(-5L, 5L); v <- Gen.choose(90L, 99L) }
      yield SetFiltered(t, v),
    for { t <- Gen.choose(-8L, 12L); d <- Gen.choose(1L, 4L) }
      yield IncFirst(t, d),
    for { k <- Gen.choose(0L, 4L); d <- Gen.choose(1L, 5L) }
      yield IncNested(k, d),
    Gen.choose(-5L, 9L).map(UnsetFiltered(_)),
    Gen.choose(1L, 7L).map(SetDotted(_)))

  test("random positional updates: applyUpdateOps == independent model") {
    val prop = Prop.forAll(genDoc, genUpd) { (d, u) =>
      val got =
        try Some(Collection.applyUpdateOps(d.json, u.json,
          u.afJson, u.queryJson))
        catch { case _: IllegalArgumentException => None }
      (u, got) match {
        case (_, None) =>
          // only the no-first-match case may throw
          u.model(d).isEmpty
        case (uf: UnsetFiltered, Some(j)) =>
          val n = mapper.readTree(j)
          val arr = n.get("arr")
          val want = uf.nulls(d)
          (0 until arr.size()).forall { i =>
            if (want(i)) arr.get(i).isNull
            else arr.get(i).asLong() == d.arr(i)
          } && arr.size() == d.arr.size
        case (sd: SetDotted, Some(j)) =>
          val n = mapper.readTree(j)
          n.path("m").path("x").path("y").asLong() == sd.v &&
            n.get("a").asLong() == d.a
        case (_, Some(j)) =>
          val want = u.model(d).get
          val n = mapper.readTree(j)
          val arrOk = {
            val arr = n.get("arr")
            arr.size() == want.arr.size &&
              want.arr.indices.forall(i =>
                arr.get(i).asLong() == want.arr(i))
          }
          val rsOk = {
            val rs = n.get("rs")
            rs.size() == want.rs.size &&
              want.rs.indices.forall { i =>
                rs.get(i).get("k").asLong() == want.rs(i)._1 &&
                  rs.get(i).get("v").asLong() == want.rs(i)._2
              }
          }
          val scalarsOk = n.get("a").asLong() == want.a &&
            n.get("b").asLong() == want.b
          if (!(arrOk && rsOk && scalarsOk))
            println(s"MISMATCH doc=${d.json} upd=${u.json} got=$j")
          arrOk && rsOk && scalarsOk
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
