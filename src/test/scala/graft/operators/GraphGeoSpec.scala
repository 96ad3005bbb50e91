package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-model specs for the graph-motif and spatial operators — tiny
  * inputs with answers computable by eye, covering exactly the cases
  * the blocking devices could get wrong: hub orientation, complete
  * subgraphs, cell-boundary pairs, and the radius boundary itself. */
class GraphGeoSpec extends SparkTestBase {
  import spark.implicits._

  private def tri(edges: (Long, Long)*): Seq[(Long, Long, Long)] =
    Relational.trianglesOver(edges.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("triangles: star hub plus one attached triangle — the hub's " +
      "degree never explodes the wedge join, exactly one triangle") {
    // hub 1 connects to 2..6; only (2,3) closes a triangle
    val got = tri((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (1L, 5L),
      (1L, 6L))
    assert(got == Seq((1L, 2L, 3L)))
  }

  test("triangles: K4 yields all four triangles, each exactly once") {
    val got = tri((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(got == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L),
      (2L, 3L, 4L)))
  }

  test("triangles: a path has none") {
    assert(tri((1L, 2L), (2L, 3L), (3L, 4L)).isEmpty)
  }

  private def pairs(pts: (Long, Long, Long)*): Seq[(Long, Long, Long)] =
    Geo.geoJoinOver(pts.toDF("id", "x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("geo join: radius boundary inclusive, cross-cell pairs found " +
      "via the neighborhood, far pairs absent") {
    // R = 2000. (1,2): d=1500 same-cell-ish; (2,5): d=200 but the
    // points straddle the cell-0/cell-1 boundary — only the 3×3
    // neighborhood finds it; (1,4): d=2121 > R excluded;
    // (1,5): d=2100 > R; (2,4): d=1500; (1,3)/(2,3)/(3,x): far.
    val got = pairs(
      (1L, 0L, 0L), (2L, 1500L, 0L), (3L, 9000L, 0L),
      (4L, 1500L, 1500L), (5L, 2100L, 0L))
    assert(got == Seq(
      (1L, 2L, 1500L * 1500L),
      (2L, 4L, 1500L * 1500L),
      (2L, 5L, 600L * 600L),
      (4L, 5L, 600L * 600L + 1500L * 1500L)))
  }

  test("geo join: a pair at exactly the radius is included (<= R²)") {
    val got = pairs((1L, 0L, 0L), (2L, 2000L, 0L))
    assert(got == Seq((1L, 2L, 2000L * 2000L)))
  }

  test("geo join: a point-mass cell fails loudly with remediation, " +
      "never a silent quadratic expansion") {
    val p = spark.range(10001).toDF("id")
      .select(col("id"), lit(500L).as("x"), lit(500L).as("y"))
    val e = intercept[Exception] { Geo.geoJoinOver(p).collect() }
    assert(e.getMessage.contains("geo cell overflow"), e.getMessage)
  }

  test("kcore: a K4 clique survives a 3-core peel, a pendant chain " +
      "hanging off it is stripped") {
    import spark.implicits._
    // K4 on 1-4 (every degree 3) + chain 4-5-6 (degrees 1-2, peel off)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val got = Relational.kcorePeel(edges, k = 3, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("kcore: cascading peel — each round exposes the next fringe " +
      "(a path graph needs its length in rounds to vanish)") {
    import spark.implicits._
    // path 1-2-3-4-5 under k=2: ends peel first, then the next ends
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val after1 = Relational.kcorePeel(path, k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(after1 == Seq(2L, 3L, 4L)) // ends 1, 5 peeled
    val after2 = Relational.kcorePeel(path, k = 2, rounds = 2)
      .collect()
    assert(after2.isEmpty) // 2-3-4 path's ends go next, nothing is left
  }
}
