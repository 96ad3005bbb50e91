package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** MLlib alternative paths beside the engine's hand-rolled ones — the
  * production options SURVEY §1.1/§7 name:
  * `BucketedRandomProjectionLSH` for ANN join (vs the md5-hyperplane LSH
  * the oracle-gated queries use) and `sampleBy` for stratified sampling
  * (vs the hash-deterministic gate query). Neither is SQL-oracle-
  * replicable (MLlib RNG), so both are spec-verified: recall against the
  * exact answer, proportions + seed-determinism respectively. */
class MlLshSpec extends SparkTestBase {

  test("BucketedRandomProjectionLSH approxSimilarityJoin recalls planted near-dups") {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // planted: exact copies of every 5th vector, id-offset
    val corpus = e.select(col("vec_id").as("id"), col("embedding"))
      .unionAll(e.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000).as("id"), col("embedding")))
      .withColumn("features",
        array_to_vector(col("embedding").cast("array<double>")))
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0).setNumHashTables(4).setSeed(42)
      .setInputCol("features").setOutputCol("hashes")
      .fit(corpus)
    val pairs = model.approxSimilarityJoin(corpus, corpus, 0.01, "dist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = e.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0))
      .map(i => (i, i + 100000)).toSet
    val recall = planted.count(pairs.contains).toDouble / planted.size
    assert(recall == 1.0, s"recall $recall, missing ${planted diff pairs}")
    // determinism: same seed, same pairs
    val model2 = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0).setNumHashTables(4).setSeed(42)
      .setInputCol("features").setOutputCol("hashes")
      .fit(corpus)
    val pairs2 = model2.approxSimilarityJoin(corpus, corpus, 0.01, "dist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == pairs2)
  }

  test("sampleBy: per-stratum fractions honored, seed-deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val fractions = Map("en" -> 0.5, "fr" -> 0.2, "de" -> 1.0)
    val s1 = docs.stat.sampleBy("lang", fractions, seed = 7L)
    val s2 = docs.stat.sampleBy("lang", fractions, seed = 7L)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(s2.select("doc_id").collect().map(_.getLong(0)).sorted),
      "same seed must select identical rows")
    val got = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, frac) <- fractions if base.contains(lang)) {
      val rate = got.getOrElse(lang, 0L).toDouble / base(lang)
      assert(math.abs(rate - frac) < 0.15,
        s"$lang: sampled at $rate, wanted ~$frac")
    }
    // strata not in the fraction map are excluded entirely
    assert((got.keySet -- fractions.keySet).isEmpty)
  }
}
