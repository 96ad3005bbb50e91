package graft.core

/** User-facing engine configuration — parity with the reference's TOML
  * config surface (/root/reference/config/config.go:7-59): a defaults
  * struct, a parse-file-over-defaults loader, and the embedder
  * model→dimension map (config.go:59, `CohereModel2Dim`).
  *
  * What maps where: `persist_dir` keeps its meaning (collection storage
  * root); the Postgres/FerretDB connection block has no analogue (this
  * engine has no subprocesses — Catalyst replaces the delegated stack);
  * the HNSW block (m, ef_construction) becomes the IVF tuning pair
  * (nlist, nprobe) plus the KMeans iteration count, which are this
  * engine's equivalent index dials.
  *
  * Format: java.util.Properties (`key = value` lines) rather than TOML —
  * zero extra dependencies and the same layered-over-defaults semantics
  * as the reference's ParseFrom.
  */
final case class GraftConfig(
    persistDir: String = "/tmp/graft-kaer",
    embedderModel: String = "hashing-md5-v1",
    embedDim: Int = 64,
    ivfNlist: Int = 16,
    ivfNprobe: Int = 4,
    kmeansIters: Int = 3,
    // embedding-LSH dedup selectivity dials: each of `dedupBands` band
    // spaces holds 2^bits buckets, so expected bucket size ≈ N / 2^bits —
    // the dial that keeps the in-bucket quadratic expansion bounded as
    // the corpus grows (see GraftConfig.autoBitsPerBand)
    dedupBitsPerBand: Int = 8,
    dedupBands: Int = 2) {
  require(embedDim > 0 && ivfNlist > 0 && ivfNprobe > 0 && kmeansIters > 0 &&
    dedupBitsPerBand > 0 && dedupBands > 0,
    "config values must be positive")
  require(dedupBitsPerBand <= 30, "dedup_bits_per_band must fit an int bucket")
}

object GraftConfig {

  /** Embedder model → vector dimension, the reference's CohereModel2Dim
    * (config.go:59) extended with the offline default model. Unknown
    * models fail loudly at session open (the reference instead panics
    * later with a dimension mismatch deep in the insert path). */
  val Model2Dim: Map[String, Int] = Map(
    "hashing-md5-v1" -> 64,
    "multilingual-22-12" -> 768,
    "small" -> 1024,
    "large" -> 4096)

  def dimFor(model: String): Int =
    Model2Dim.getOrElse(model,
      throw new IllegalArgumentException(
        s"unknown embedder model: $model (known: " +
          s"${Model2Dim.keys.toSeq.sorted.mkString(", ")})"))

  /** Defaults — the analogue of the reference's `defaultCfg`. */
  def default: GraftConfig = GraftConfig()

  /** Bits-per-band sized to the corpus: with bucket count 2^bits per
    * band, expected bucket membership ≈ N / 2^bits, so holding buckets
    * near `targetBucket` needs bits ≥ log2(N / targetBucket). Floored at
    * the default 8 (the measured sweet spot for ≤100k corpora) — the
    * remedy for the measured failure mode where a fixed band space
    * saturates and bucket size grows linearly with the corpus. */
  def autoBitsPerBand(corpusRows: Long, targetBucket: Long = 1000L): Int = {
    require(targetBucket > 0, "targetBucket must be positive")
    // integer derivation of ceil(log2(N / target)): smallest b with
    // 2^b * target >= N. Exact at power-of-two boundaries, where the
    // floating-point log-ratio form could overshoot by one bit
    // (log returning 10.0000000000000002 for a true 10).
    val m = (math.max(corpusRows, 1L) + targetBucket - 1) / targetBucket
    val needed =
      if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(30, math.max(default.dedupBitsPerBand, needed))
  }

  /** Layer a properties file over the defaults (reference ParseFrom
    * semantics: absent keys keep defaults; a missing file IS the
    * defaults). Recognized keys: persist_dir, embedder_model, embed_dim,
    * ivf_nlist, ivf_nprobe, kmeans_iters, dedup_bits_per_band,
    * dedup_bands. `embed_dim` defaults to the model's map entry when a
    * model is given without a dimension. */
  def parseFrom(path: String): GraftConfig = {
    val p = new java.util.Properties()
    val f = new java.io.File(path)
    if (f.isFile) {
      val in = new java.io.FileInputStream(f)
      try p.load(in) finally in.close()
    }
    val d = default
    def str(k: String, dv: String) = Option(p.getProperty(k)).getOrElse(dv)
    def int(k: String, dv: Int) =
      Option(p.getProperty(k)).map(_.trim.toInt).getOrElse(dv)
    val model = str("embedder_model", d.embedderModel)
    GraftConfig(
      persistDir = str("persist_dir", d.persistDir),
      embedderModel = model,
      embedDim = int("embed_dim",
        Model2Dim.getOrElse(model, d.embedDim)),
      ivfNlist = int("ivf_nlist", d.ivfNlist),
      ivfNprobe = int("ivf_nprobe", d.ivfNprobe),
      kmeansIters = int("kmeans_iters", d.kmeansIters),
      dedupBitsPerBand = int("dedup_bits_per_band", d.dedupBitsPerBand),
      dedupBands = int("dedup_bands", d.dedupBands))
  }
}
