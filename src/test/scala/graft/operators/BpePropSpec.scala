package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the subtle non-SQL-obvious kernels added in
  * r9/r10: the BPE merge fold (greedy LEFTMOST-NON-OVERLAPPING — the
  * exact semantics the unrolled DuckDB oracle re-derives positionally)
  * and the three real media codecs (PNG/WAV/Y4M), whose decode of a
  * planted payload must equal the analytic formulas for ANY id — the
  * same contract the oracle gates check on the corpus's actual ids. */
class BpePropSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference imperative implementation of the BPE apply step. */
  private def refMerge(syms: Seq[String], a: String, b: String)
      : Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("mergeFold == imperative greedy merge for random sequences") {
    val symGen = Gen.oneOf("a", "b", "ab", "c")
    val caseGen = for {
      n <- Gen.choose(0, 12)
      syms <- Gen.listOfN(n, symGen)
      a <- symGen
      b <- symGen
    } yield (syms, a, b)
    // 300 random cases, evaluated in ONE Spark pass per (a, b) group
    val cases = Gen.listOfN(300, caseGen).sample.get.zipWithIndex
    cases.groupBy { case ((_, a, b), _) => (a, b) }.foreach {
      case ((a, b), group) =>
        val df = group.map { case ((syms, _, _), i) => (i, syms) }
          .toDF("i", "syms")
          .select(col("i"), Bpe.mergeFold(col("syms"), a, b).as("m"))
        val got = df.collect()
          .map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
        group.foreach { case ((syms, _, _), i) =>
          assert(got(i) == refMerge(syms, a, b),
            s"syms=$syms a=$a b=$b: got ${got(i)}, " +
              s"want ${refMerge(syms, a, b)}")
        }
    }
  }

  test("PNG codec: decode(synth(id)) == pixel formulas for random ids") {
    val prop = Prop.forAll(Gen.choose(0L, 1000000L)) { id =>
      val (w, h, sr, sg, sb) = Multimodal.PngCodec.decode(
        Multimodal.PngCodec.synthPng(id))
      val ew = 16 + (id % 32).toInt
      val eh = 16 + ((id / 32) % 32).toInt
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until eh; x <- 0 until ew) {
        er += (x * 31 + y * 17 + id) % 256
        eg += (x + y * 13 + id * 7) % 256
        eb += (x * 5 + y + id * 3) % 256
      }
      w == ew && h == eh && sr == er && sg == eg && sb == eb
    }
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(30), prop).passed)
  }

  test("WAV codec: decode(synth(id)) == waveform formulas for random ids") {
    val prop = Prop.forAll(Gen.choose(0L, 1000000L)) { id =>
      val (sr, n, sumAbs) = Multimodal.WavCodec.decode(
        Multimodal.WavCodec.synthWav(id))
      val en = 256 + (id % 256).toInt
      val esr = 8000 + (id % 4).toInt * 4000
      val esum = (0 until en)
        .map(t => math.abs(Multimodal.WavCodec.synthAmp(id, t)).toLong)
        .sum
      sr == esr && n == en && sumAbs == esum
    }
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(50), prop).passed)
  }

  test("Y4M codec: decode(synth(id)) == luma formulas for random ids") {
    val prop = Prop.forAll(Gen.choose(0L, 1000000L)) { id =>
      val (w, h, nf, sumY) = Multimodal.Y4mCodec.decode(
        Multimodal.Y4mCodec.synthY4m(id))
      val ew = 16 + (id % 16).toInt
      val eh = 16 + ((id / 16) % 16).toInt
      val ef = 2 + (id % 3).toInt
      var es = 0L
      for (f <- 0 until ef; y <- 0 until eh; x <- 0 until ew)
        es += Multimodal.Y4mCodec.synthLuma(id, f, x, y)
      w == ew && h == eh && nf == ef && sumY == es
    }
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(50), prop).passed)
  }
}
