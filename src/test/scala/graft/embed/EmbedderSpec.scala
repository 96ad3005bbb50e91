package graft.embed

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** The column path and the driver path MUST be bit-equal (the reference's
  * stored-vs-query embedding contract) — including non-ASCII input,
  * truncation at the 512-codepoint cap, and empty/degenerate strings. */
class EmbedderSpec extends SparkTestBase {
  import spark.implicits._

  private val emb = HashingEmbedder(64)

  private val corpus = Seq(
    "hello world",
    "Hello, WORLD! 42",
    "", "   ", "!!!",
    "İstanbul ığüşöç DİYARBAKIR", // Turkish dotted/dotless i
    "naïve café résumé",
    "😀 emoji 🚀 pad", // supplementary chars
    "a" * 511 + "XYZ", // straddles the 512-codepoint cap
    ("tok " * 400).trim, // > 512 chars, many tokens
    "key agg row scan slow fast table value part hash"
  )

  test("column path == driver path, bit-for-bit") {
    val viaColumn = corpus.toDF("t")
      .withColumn("v", emb.embed(col("t")))
      .select("t", "v").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).toArray).toMap
    corpus.foreach { t =>
      assert(java.util.Arrays.equals(viaColumn(t), emb.embedOne(t)),
        s"diverged on: $t")
    }
  }

  test("dimension and normalization") {
    corpus.foreach { t =>
      val v = emb.embedOne(t)
      assert(v.length == 64)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(n == 0.0 || math.abs(n - 1.0) < 1e-6, s"norm $n for: $t")
    }
  }

  test("tokenless text embeds to the zero vector") {
    assert(emb.embedOne("!!! ???").forall(_ == 0.0f))
  }

  test("truncation: chars past the 512-codepoint cap are ignored") {
    val base = "a" * 512
    assert(java.util.Arrays.equals(
      emb.embedOne(base + " completely different suffix"),
      emb.embedOne(base)))
  }

  test("null-safe column path") {
    val out = Seq((1, Option.empty[String]), (2, Some("x")))
      .toDF("id", "t").withColumn("v", emb.embed(col("t")))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(!out(1).isNullAt(1))
  }

  test("embedder id is stable and dim-scoped") {
    assert(emb.id == "hashing-md5-v1-d64")
    assert(HashingEmbedder(128).id == "hashing-md5-v1-d128")
  }
}
