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
