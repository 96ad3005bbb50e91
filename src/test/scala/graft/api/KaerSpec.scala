package graft.api

import graft.SparkTestBase
import graft.core.Meta
import graft.embed.HashingEmbedder

/** The collection API end-to-end: the literal main.go:35-52 scenario,
  * insert validation, id watermarking across reopen (the intent of the
  * reference's recovery path, db/db.go:209-226 — max, not its min-id
  * bug), and DDL semantics. */
class KaerSpec extends SparkTestBase {

  private def newSession(root: String) =
    new KaerSession(spark, root, HashingEmbedder(64))

  test("main.go scenario: filter ∧ top-1 returns the attr1==1 doc") {
    val r = graft.operators.KaerQuery
      .mainGoScenario(spark, tmpDir("kaer-maingo")).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("_m_doc") == "hello, world")
  }

  test("insert validates parallel-array lengths (ErrFieldLengthMismatch)") {
    val k = newSession(tmpDir("kaer-len"))
    val c = k.createCollection("c")
    intercept[FieldLengthMismatch] {
      c.insert(Data().withDocuments(Seq("a", "b"))
        .withMetadatas(Seq(Map("x" -> 1))))
    }
  }

  test("ids are dense, monotone, and survive reopen (watermark recovery)") {
    val root = tmpDir("kaer-recover")
    val k1 = newSession(root)
    val c1 = k1.createCollection("c")
    c1.insert(Data().withDocuments(Seq("one", "two", "three")))
    c1.insert(Data().withDocuments(Seq("four")))
    assert(c1.count() == 4)

    // fresh session handle over the same directory — recovery path
    val k2 = newSession(root)
    val c2 = k2.getCollection("c")
    c2.insert(Data().withDocuments(Seq("five", "six")))
    val ids = c2.df.select("_m_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(1L to 6L))

    // sidecar watermark agrees with the data
    val meta = Meta.read(spark, s"$root/c").get
    assert(meta.lastId == 6L && meta.rows == 6L)
  }

  test("sidecar survives a lost meta file (max(_m_id) fallback)") {
    val root = tmpDir("kaer-fallback")
    val k1 = newSession(root)
    val c1 = k1.createCollection("c")
    c1.insert(Data().withDocuments(Seq("a", "b")))
    // simulate a torn sidecar: drop it, keep the data
    Meta.drop(spark, s"$root/c")
    Meta.write(spark, s"$root/c",
      graft.core.CollectionMeta("c", 0L, 64, "hashing-md5-v1-d64", 0L))
    val c2 = newSession(root).getCollection("c")
    c2.insert(Data().withDocuments(Seq("cc")))
    val ids = c2.df.select("_m_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(1L to 3L), s"got ${ids.mkString(",")}")
    // the stale sidecar's row count must be re-synced from data on the
    // recovery path, not carried forward as 0
    val meta = Meta.read(spark, s"$root/c").get
    assert(meta.rows == 3L, s"sidecar rows=${meta.rows}")
    assert(meta.lastId == 3L)
  }

  test("query respects filter, k, distance order, and emits _distance") {
    val k = newSession(tmpDir("kaer-query"))
    val c = k.createCollection("c")
    c.insert(Data()
      .withDocuments(Seq("alpha beta", "alpha beta gamma", "delta epsilon"))
      .withMetadatas(Seq(Map("g" -> 1), Map("g" -> 1), Map("g" -> 2))))
    val out = c.query("alpha beta", 2, """{"g": {"$eq": 1}}""").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("_m_doc") == "alpha beta") // exact match first
    val d0 = out(0).getAs[Double]("_distance")
    val d1 = out(1).getAs[Double]("_distance")
    assert(d0 <= d1 && d0 < 1e-6)
  }

  test("drop removes data and getCollection then raises CollectionNotFound") {
    val root = tmpDir("kaer-drop")
    val k = newSession(root)
    k.createCollection("c").insert(Data().withDocuments(Seq("x")))
    k.dropCollection("c")
    intercept[CollectionNotFound] { k.getCollection("c") }
    assert(newSession(root).listCollections().isEmpty)
  }

  test("createCollection is idempotent (reopen, not truncate)") {
    val root = tmpDir("kaer-idem")
    val k = newSession(root)
    k.createCollection("c").insert(Data().withDocuments(Seq("x")))
    val again = newSession(root).createCollection("c")
    assert(again.count() == 1)
  }
}
