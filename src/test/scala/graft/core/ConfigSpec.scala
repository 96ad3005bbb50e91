package graft.core

import graft.SparkTestBase

/** Config surface parity: defaults, file-over-defaults layering, the
  * model→dim map, and the config-driven session boot. */
class ConfigSpec extends SparkTestBase {

  test("defaults mirror the reference's defaultCfg shape") {
    val d = GraftConfig.default
    assert(d.persistDir.nonEmpty)
    assert(d.embedderModel == "hashing-md5-v1")
    assert(d.embedDim == 64 && d.ivfNlist == 16 && d.ivfNprobe == 4)
  }

  test("parseFrom layers file values over defaults; missing file = defaults") {
    val dir = tmpDir("config")
    val f = new java.io.File(dir, "graft.properties")
    java.nio.file.Files.write(f.toPath,
      """persist_dir = /tmp/custom-root
        |ivf_nlist = 32
        |""".stripMargin.getBytes)
    val cfg = GraftConfig.parseFrom(f.getPath)
    assert(cfg.persistDir == "/tmp/custom-root")
    assert(cfg.ivfNlist == 32)
    assert(cfg.ivfNprobe == GraftConfig.default.ivfNprobe) // kept default
    val absent = GraftConfig.parseFrom(s"$dir/nope.properties")
    assert(absent == GraftConfig.default)
  }

  test("embedder model resolves its dimension; unknown model fails loudly") {
    assert(GraftConfig.dimFor("multilingual-22-12") == 768)
    assert(GraftConfig.dimFor("large") == 4096)
    intercept[IllegalArgumentException] { GraftConfig.dimFor("gpt-999") }
    // a model name in the file pulls its dim from the map
    val dir = tmpDir("config-model")
    val f = new java.io.File(dir, "m.properties")
    java.nio.file.Files.write(f.toPath,
      "embedder_model = small\n".getBytes)
    assert(GraftConfig.parseFrom(f.getPath).embedDim == 1024)
  }

  test("config-driven KaerSession boot uses persist_dir and model dim") {
    import graft.api.{Data, KaerSession}
    val root = tmpDir("config-boot")
    val k = KaerSession(spark,
      GraftConfig.default.copy(persistDir = root))
    val c = k.createCollection("c")
    c.insert(Data().withDocuments(Seq("hello config")))
    assert(c.count() == 1)
    // the collection sidecar carries the model-derived dim
    assert(Meta.read(spark, s"$root/c").get.dim == 64)
    // contradictory (model, dim) pair is rejected at boot
    intercept[IllegalArgumentException] {
      KaerSession(spark, GraftConfig.default.copy(embedDim = 128))
    }
  }

  test("config with embed_endpoint boots the HTTP embedder end-to-end") {
    import graft.api.{Data, KaerSession}
    import graft.embed.StubEmbedServer
    val server = new StubEmbedServer(32, expectKey = Some("k123"),
      model = "remote-m")
    try {
      val root = tmpDir("config-http-boot")
      val dir = tmpDir("config-http")
      val f = new java.io.File(dir, "remote.toml")
      java.nio.file.Files.write(f.toPath,
        s"""[db]
           |persist_dir = '$root'
           |
           |[cohere]
           |model = "remote-m"
           |api_key = "k123"
           |endpoint = "${server.url}"
           |
           |[embed]
           |dim = 32
           |""".stripMargin.getBytes)
      val cfg = GraftConfig.parseFrom(f.getPath)
      assert(cfg.embedEndpoint == server.url)
      assert(cfg.embedApiKey == "k123")
      val k = KaerSession(spark, cfg)
      val c = k.createCollection("remote")
      c.insert(Data().withDocuments(Seq("alpha", "beta", "gamma")))
      // the stored vectors traveled over HTTP (batched), not hashing
      assert(server.requestCount >= 1)
      assert(server.batches.toArray(Array.empty[Seq[String]])
        .flatten.toSet == Set("alpha", "beta", "gamma"))
      // query-side embedding goes through the SAME transport, so
      // stored-vs-query vectors are bit-equal → self-match at distance 0
      val hit = c.query("alpha", 1).collect()(0)
      assert(hit.getAs[String]("_m_doc") == "alpha")
      assert(hit.getAs[Double]("_distance") < 1e-6)
    } finally server.close()
  }

  test("invalid numeric values are rejected") {
    intercept[IllegalArgumentException] { GraftConfig(ivfNlist = 0) }
    intercept[IllegalArgumentException] { GraftConfig(embedDim = -1) }
    intercept[IllegalArgumentException] { GraftConfig(dedupBitsPerBand = 0) }
    intercept[IllegalArgumentException] { GraftConfig(dedupBands = -2) }
    intercept[IllegalArgumentException] { GraftConfig(dedupBitsPerBand = 31) }
  }

  test("dedup LSH dials parse from file and layer over defaults") {
    assert(GraftConfig.default.dedupBitsPerBand == 8 &&
      GraftConfig.default.dedupBands == 2)
    val dir = tmpDir("config-dedup")
    val f = new java.io.File(dir, "d.properties")
    java.nio.file.Files.write(f.toPath,
      "dedup_bits_per_band = 12\ndedup_bands = 3\n".getBytes)
    val cfg = GraftConfig.parseFrom(f.getPath)
    assert(cfg.dedupBitsPerBand == 12 && cfg.dedupBands == 3)
  }

  test("text MinHash dials parse; k must divide evenly into bands") {
    assert(GraftConfig.default.minhashK == 12 &&
      GraftConfig.default.textBands == 4)
    val dir = tmpDir("config-text")
    val f = new java.io.File(dir, "t.properties")
    java.nio.file.Files.write(f.toPath,
      "minhash_k = 16\ntext_bands = 8\n".getBytes)
    val cfg = GraftConfig.parseFrom(f.getPath)
    assert(cfg.minhashK == 16 && cfg.textBands == 8)
    intercept[IllegalArgumentException] {
      GraftConfig(minhashK = 10, textBands = 4) // 10 % 4 != 0
    }
    intercept[IllegalArgumentException] { GraftConfig(minhashK = 96) }
  }

  test("TOML config: sections flatten, aliases map, unknown keys ignored") {
    val dir = tmpDir("config-toml")
    val f = new java.io.File(dir, "graft.toml")
    // same shape as the reference's config.toml.example
    // (/root/reference/config/config.toml.example): a title, a [cohere]
    // block, a [db] block with connection keys this engine has no
    // analogue for, and index dials — plus this engine's own sections
    java.nio.file.Files.write(f.toPath,
      """title = "engine config"   # top-level key, ignored
        |
        |[cohere]
        |api_key = "not-a-real-key"
        |model = "multilingual-22-12"
        |
        |[db]
        |persist_dir = '/tmp/toml-root'
        |postgres_username = "postgres"
        |postgres_port = 5432
        |ferretdb_tcp = "localhost:8080"
        |
        |[ivf]
        |nlist = 64        # trailing comment
        |nprobe = 8
        |
        |[dedup]
        |bits_per_band = 12
        |bands = 3
        |""".stripMargin.getBytes)
    val cfg = GraftConfig.parseFrom(f.getPath)
    assert(cfg.persistDir == "/tmp/toml-root")
    assert(cfg.embedderModel == "multilingual-22-12")
    assert(cfg.embedDim == 768) // pulled from the model map
    assert(cfg.ivfNlist == 64 && cfg.ivfNprobe == 8)
    assert(cfg.dedupBitsPerBand == 12 && cfg.dedupBands == 3)
    assert(cfg.kmeansIters == GraftConfig.default.kmeansIters)
  }

  test("TOML parser: strings, escapes, comments, malformed input") {
    assert(GraftConfig.parseToml(
      """a = "x \" y \\ z"
        |b = 'lit "quoted"'
        |c = 1_000
        |d = true
        |e = -2.5
        |""".stripMargin) == Map("a" -> "x \" y \\ z",
        "b" -> "lit \"quoted\"", "c" -> "1000", "d" -> "true",
        "e" -> "-2.5"))
    // '#' inside a quoted string is content, not a comment
    assert(GraftConfig.parseToml("k = \"a # b\"  # real comment")
      == Map("k" -> "a # b"))
    // out-of-scope and malformed constructs fail loudly with a line number
    for (bad <- Seq("k = [1, 2]", "k = 1979-05-27", "[t", "[[arr]]",
        "just a line", "k = \"unterminated", "k =")) {
      val e = intercept[IllegalArgumentException] {
        GraftConfig.parseToml(bad) }
      assert(e.getMessage.contains("line 1"), s"for: $bad → ${e.getMessage}")
    }
    // duplicate keys are an error, matching TOML semantics
    intercept[IllegalArgumentException] {
      GraftConfig.parseToml("a = 1\na = 2\n") }
    // malformed int surfaces the config key, not a bare NumberFormat
    val dir = tmpDir("config-toml-bad")
    val f = new java.io.File(dir, "bad.toml")
    java.nio.file.Files.write(f.toPath, "[ivf]\nnlist = \"8x\"\n".getBytes)
    val e = intercept[IllegalArgumentException] {
      GraftConfig.parseFrom(f.getPath) }
    assert(e.getMessage.contains("ivf_nlist"))
  }

  test("autoBitsPerBand holds expected bucket size near the target") {
    // small corpora keep the default floor (binds while N <= 16·2^8)
    assert(GraftConfig.autoBitsPerBand(0L) == 8)
    assert(GraftConfig.autoBitsPerBand(4096L) == 8)
    // past the floor: bits = ceil(log2(N / 16)) — expected bucket
    // membership N / 2^bits stays <= the 16 target as N grows (the
    // target sets the verify bill: candidate pairs are quadratic in
    // membership — see the sf10 measurements on autoBitsPerBand)
    assert(GraftConfig.autoBitsPerBand(8192L) == 9)
    assert(GraftConfig.autoBitsPerBand(220000L) == 14) // the sf10 rung
    assert(GraftConfig.autoBitsPerBand(1000000L) == 16)
    assert(GraftConfig.autoBitsPerBand(1000000000L) == 26)
    for (n <- Seq(500000L, 4000000L, 123456789L)) {
      val bits = GraftConfig.autoBitsPerBand(n)
      assert(n.toDouble / (1L << bits) <= 16.0)
    }
    // capped so band values fit an int bucket
    assert(GraftConfig.autoBitsPerBand(Long.MaxValue / 2) == 30)
  }
}
