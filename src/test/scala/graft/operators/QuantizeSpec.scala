package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}

class QuantizeSpec extends SparkTestBase {

  test("int8 reconstruction error is within half a quantization step") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val sc = Quantize.scaleOf(col("embedding"))
    val deq = Quantize.dequantize(
      Quantize.quantizeI8(col("embedding"), sc), sc)
    val maxErr = e.select(sc.as("scale"),
        zip_with(col("embedding"), deq,
          (a, b) => abs(a.cast("double") - b)).as("errs"))
      .select(max(array_max(col("errs")) / (col("scale") / 127.0)))
      .head().getDouble(0)
    // |v - deq| <= 0.5 * (scale/127) + fp slack
    assert(maxErr <= 0.5 + 1e-9, s"maxErr=$maxErr steps")
  }

  test("quantized column is genuinely int8 (tinyint array)") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.select(Quantize.quantizeI8(col("embedding"),
      Quantize.scaleOf(col("embedding"))).as("q"))
    assert(q.schema("q").dataType
      .asInstanceOf[ArrayType].elementType == ByteType)
    val bounds = q.select(max(array_max(col("q"))).as("mx"),
      min(array_min(col("q"))).as("mn")).head()
    assert(bounds.getByte(0) <= 127 && bounds.getByte(1) >= -127)
  }

  test("PQ: codes store as 8 tinyints in [0,16); gate plan returns 10") {
    // run the registered pipeline once; inspect its persisted code table
    val got = Quantize.pqAdcTopk(spark, sf0001)
    assert(got.count() == 10)
    val codes = spark.read.parquet(
      graft.core.Scratch.dir("pq", sf0001))
    val codeFields = codes.schema.fields.filter(_.name.startsWith("c"))
    assert(codeFields.length == 8 &&
      codeFields.forall(_.dataType == ByteType))
    val mx = codes.select(greatest(
      codeFields.map(f => max(col(f.name))): _*)).head().getByte(0)
    val mn = codes.select(least(
      codeFields.map(f => min(col(f.name))): _*)).head().getByte(0)
    assert(mn >= 0 && mx < 16, s"codes out of range: [$mn, $mx]")
    // every corpus vector got exactly one row of codes
    assert(codes.count() ==
      spark.read.parquet(s"$sf0001/embeddings.parquet").count())
  }

  test("PQ ADC ranking is deterministic and far above chance recall") {
    import graft.functions.VectorFunctions.l2Sq
    // brute-force exact top-10 for the gate's query vector
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val n = e.count()
    val qv = e.filter(col("vec_id") === 77)
      .select(col("embedding").as("qv"))
    val exact = e.crossJoin(broadcast(qv)).filter(col("vec_id") =!= 77)
      .withColumn("d", l2Sq(col("embedding"), col("qv")))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = Quantize.pqAdcTopk(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0))
    // the synthetic near-uniform embeddings are PQ's worst case (same
    // as the IVF recall sweep in BASELINE.md — distances concentrate,
    // 8 bytes of code can't fully discriminate), so the 50-candidate
    // ADC stage recovers PART of the exact top-10, not all. The honest
    // property: recall is far above the ~50/n chance line (random 50
    // candidates would hit ~10*50/n of the top-10), and the ranking is
    // bit-deterministic (the oracle gate replays the identical math).
    val recall = pq.toSet.intersect(exact).size
    val chance = 10.0 * 50.0 / n
    assert(recall >= math.max(2, math.ceil(2 * chance).toInt),
      s"recall@10=$recall not above chance ($chance) for n=$n")
    val again = Quantize.pqAdcTopk(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0))
    assert(pq.sameElements(again), "PQ pipeline must be deterministic")
  }

  test("pqTrainKmeans: M per-subspace codebooks of K subDim-vectors; " +
      "training never worsens SSE vs the seed codebook") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val M = 8; val SubDim = 8; val K = 16
    val books = Quantize.pqTrainKmeans(e, M, SubDim, K, iters = 3)
    assert(books.length == M)
    assert(books.forall(b => b.length == K && b.forall(_.length == SubDim)))
    // SSE of a codebook over subspace m's subvectors (nearest codeword)
    val byId = e.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val vecs = byId.map(_._2)
    def sse(book: Array[Array[Double]], m: Int): Double =
      vecs.map { v =>
        val sub = v.slice(m * SubDim, (m + 1) * SubDim)
        book.map(c => sub.zip(c).map { case (a, b) =>
          (a - b) * (a - b) }.sum).min
      }.sum
    // the seed book is kmeansFit's init: the K lowest-id subvectors —
    // Lloyd iterations only ever reduce (or keep) the quantization SSE
    val seedBooks = Array.tabulate(M)(m =>
      vecs.take(K).map(_.slice(m * SubDim, (m + 1) * SubDim)))
    for (m <- 0 until M)
      assert(sse(books(m), m) <= sse(seedBooks(m), m) + 1e-6,
        s"subspace $m: trained SSE worse than seed")
  }

  test("zero vector quantizes to zeros and dequantizes to zeros") {
    import spark.implicits._
    val z = Seq(Seq.fill(8)(0.0f)).toDF("embedding")
    val sc = Quantize.scaleOf(col("embedding"))
    val r = z.select(Quantize.dequantize(
      Quantize.quantizeI8(col("embedding"), sc), sc).as("d"))
      .head().getSeq[Double](0)
    assert(r.forall(_ == 0.0), r)
  }
}
