package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass implementations of the md5-derived text/vector hashes.
  *
  * The same semantics exist as composed built-ins (TextFunctions history /
  * the DuckDB oracles), but Spark's higher-order functions
  * (transform/aggregate/filter) evaluate INTERPRETED, per element, per
  * lambda — the md5-heavy operators spent 10-60s per bench query in
  * expression-tree walking. These are proper Catalyst `Expression`s with
  * `doGenCode`: whole-stage codegen emits a single static call into the
  * tight JVM loops below (thread-local MessageDigest, zero Column
  * machinery). 10-40× on the bench, same bits out.
  *
  * Every function is bit-compatible with its oracle twin:
  * md5 of UTF-8 bytes, lowercase hex, lexicographic mins, index-order
  * IEEE-754 double folds.
  */
object TextHash {

  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  /** md5 as 32 lowercase-hex ASCII bytes. */
  private def md5HexBytes(input: Array[Byte]): Array[Byte] = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(input)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** md5 as a 32-char lowercase hex String (thread-local digest) — for
    * callers needing hex slices rather than [[hash60]]'s long. */
  def md5HexString(input: Array[Byte]): String =
    new String(md5HexBytes(input), "US-ASCII")

  /** Value of the first 15 hex chars of md5 = top 60 bits of the first 8
    * digest bytes — TextFunctions.md5Hash60 / the oracle's
    * ('0x' || substr(md5(x),1,15))::BIGINT. */
  def hash60(input: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(input)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** MinHash signature: per seed 0..k-1, the lexicographic min of
    * md5hex("{seed}:" + shingle). Empty input → k nulls (array_min of an
    * empty transform is null — oracle parity). */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    // null shingles are skipped — the composed form hashes them to null
    // and array_min ignores nulls
    val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var j0 = 0
    while (j0 < n) {
      if (!shingles.isNullAt(j0))
        buf += shingles.getUTF8String(j0).getBytes
      j0 += 1
    }
    if (buf.isEmpty) return new GenericArrayData(new Array[Any](k))
    val shingleBytes = buf.toArray
    val m = shingleBytes.length
    val out = new Array[Any](k)
    var seed = 0
    while (seed < k) {
      val prefix = (seed.toString + ":").getBytes("US-ASCII")
      var min: Array[Byte] = null
      var i = 0
      while (i < m) {
        val cat = new Array[Byte](prefix.length + shingleBytes(i).length)
        System.arraycopy(prefix, 0, cat, 0, prefix.length)
        System.arraycopy(shingleBytes(i), 0, cat, prefix.length,
          shingleBytes(i).length)
        val hex = md5HexBytes(cat)
        if (min == null || compareHex(hex, min) < 0) min = hex
        i += 1
      }
      out(seed) = UTF8String.fromBytes(min)
      seed += 1
    }
    new GenericArrayData(out)
  }

  private def compareHex(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return a(i) - b(i)
      i += 1
    }
    0
  }

  /** 60-bit SimHash over the DISTINCT tokens: bit j set iff the majority
    * of token hash60s have bit j set (ties → 0). */
  def simhash60(tokens: ArrayData): Long = {
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](60)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      if (t != null && seen.add(t)) {
        val h = hash60(t.getBytes)
        var j = 0
        while (j < 60) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) r |= 1L << j
      j += 1
    }
    r
  }

  /** Fused SimHash signature + banding: one md5 pass over the distinct
    * tokens emits the 60-bit signature AND its `nBands` `bandBits`-bit
    * band values together — the banding-in-Column-space form evaluates
    * [[simhash60]] once per consumer projection, which doubles the md5
    * work in the pair query's explode. */
  def simhashBands(tokens: ArrayData, bandBits: Int,
      nBands: Int): InternalRow = {
    val sig = simhash60(tokens)
    val mask = (1L << bandBits) - 1
    val bands = new Array[Any](nBands)
    var b = 0
    while (b < nBands) { bands(b) = (sig >>> (b * bandBits)) & mask; b += 1 }
    InternalRow(sig, new GenericArrayData(bands))
  }

  /** Document fingerprint: min hash60 over code-point n-grams of the
    * lowered text; whole-text hash when shorter than n. Lowering uses
    * UTF8String.toLowerCase — the SAME routine as the `lower` built-in. */
  def fingerprint(text: UTF8String, n: Int): Long = {
    val lowered = text.toLowerCase
    val cp = lowered.numChars()
    if (cp < n) return hash60(lowered.getBytes)
    var min = Long.MaxValue
    var i = 1
    while (i <= cp - n + 1) {
      val h = hash60(lowered.substringSQL(i, n).getBytes)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Language markers (canonical copy — TextFunctions.langMarkers points
    * here so the column API, this native path, and the oracle generators
    * share one definition). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "en", "que", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "zh" -> Seq("de0", "shi4", "zai4", "le0", "he2", "you3", "wo3")
  )

  private val langTable: Array[(UTF8String, Array[UTF8String])] =
    langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      (UTF8String.fromString(lang), ms.map(UTF8String.fromString).toArray)
    }.toArray

  private val und = UTF8String.fromString("und")

  /** argmax of distinct-marker hits, ties to the first language in code
    * order, "und" on zero hits — identical to the fold in the column
    * version and the oracle's CASE chain. */
  def langId(tokens: ArrayData): UTF8String = {
    val toks = new java.util.HashSet[UTF8String]()
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) toks.add(tokens.getUTF8String(i))
      i += 1
    }
    var best = und
    var bestCnt = 0
    var l = 0
    while (l < langTable.length) {
      val (lang, markers) = langTable(l)
      var cnt = 0
      var m = 0
      while (m < markers.length) {
        if (toks.contains(markers(m))) cnt += 1
        m += 1
      }
      if (cnt > bestCnt) { best = lang; bestCnt = cnt }
      l += 1
    }
    best
  }

  private val space = UTF8String.fromString(" ")

  /** Word n-grams of a token array, space-joined, in order, with
    * duplicates kept — the native twin of
    * `transform(sequence(...), i => concat_ws(" ", slice(toks, i, n)))`,
    * which Spark evaluates interpreted per element. Shorter-than-n input
    * → empty array. */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val nt = toks.numElements()
    if (nt < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](nt - n + 1)
    var i = 0
    while (i <= nt - n) {
      // concat_ws semantics: null tokens are skipped, not empty-joined
      val parts = new Array[UTF8String](n)
      var j = 0
      var kept = 0
      while (j < n) {
        if (!toks.isNullAt(i + j)) {
          parts(kept) = toks.getUTF8String(i + j); kept += 1
        }
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts.take(kept): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass MinHash over word n-grams: tokens → distinct space-joined
    * n-gram shingles → (k-element md5-hex signature, 60-bit shingle-hash
    * set). Fuses what the composed form spent three interpreted HOF
    * passes on (transform+slice shingling, array_distinct, per-seed
    * minhash) and lets downstream joins carry 8-byte longs instead of
    * shingle strings. Oracle twin: list_distinct of the gram STRINGS,
    * hash60 applied per gram in list order — hash collisions (2^-60)
    * merge identically in both engines.
    *
    * Returns struct(sig: array<string>, sh: array<long>); sh is empty
    * (sig all-null) when there are fewer than n tokens.
    */
  def minhashShingles(toks: ArrayData, n: Int, k: Int): InternalRow = {
    val nt = toks.numElements()
    val grams = new java.util.LinkedHashSet[UTF8String]()
    if (nt >= n) {
      var i = 0
      while (i <= nt - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        var kept = 0
        while (j < n) {
          if (!toks.isNullAt(i + j)) {
            parts(kept) = toks.getUTF8String(i + j); kept += 1
          }
          j += 1
        }
        grams.add(UTF8String.concatWs(space, parts.take(kept): _*))
        i += 1
      }
    }
    val m = grams.size()
    val gramBytes = new Array[Array[Byte]](m)
    val shOut = new Array[Any](m)
    val it = grams.iterator()
    var g = 0
    while (it.hasNext) {
      gramBytes(g) = it.next().getBytes
      shOut(g) = hash60(gramBytes(g))
      g += 1
    }
    val sigOut = new Array[Any](k)
    var seed = 0
    while (seed < k) {
      val prefix = (seed.toString + ":").getBytes("US-ASCII")
      var min: Array[Byte] = null
      var i = 0
      while (i < m) {
        val buf = new Array[Byte](prefix.length + gramBytes(i).length)
        System.arraycopy(prefix, 0, buf, 0, prefix.length)
        System.arraycopy(gramBytes(i), 0, buf, prefix.length,
          gramBytes(i).length)
        val hex = md5HexBytes(buf)
        if (min == null || compareHex(hex, min) < 0) min = hex
        i += 1
      }
      sigOut(seed) = if (min == null) null else UTF8String.fromBytes(min)
      seed += 1
    }
    InternalRow(new GenericArrayData(sigOut), new GenericArrayData(shOut))
  }

  /** Stubbed media encoder (Multimodal.mediaVec's native twin): component
    * i = (hash60(text ++ ":" ++ i) mod 2001 − 1000)/1000 as float — one
    * digest loop instead of a 16-element interpreted `transform` HOF
    * (16 md5s/row through expression-tree walking was mm_embed_knn's
    * whole cost). Bit-equal: same md5 bytes, same Long→Double→Float
    * rounding order as the composed form and the DuckDB oracle. */
  def mediaVec(text: UTF8String, dim: Int): ArrayData = {
    val base = text.getBytes
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      val suffix = (":" + i).getBytes("US-ASCII")
      val buf = new Array[Byte](base.length + suffix.length)
      System.arraycopy(base, 0, buf, 0, base.length)
      System.arraycopy(suffix, 0, buf, base.length, suffix.length)
      out(i) = ((hash60(buf) % 2001 - 1000) / 1000.0).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane LSH for embeddings: md5-seeded ±1 sign matrix.
    * Rows are generated on demand for ANY index (the seed is the index),
    * so bits-per-band × bands is a runtime dial, not a compile-time cap —
    * at larger corpus scale the dedup config raises selectivity without a
    * code change. */
  val HyperBits = 16
  val HyperDim = 64
  private val hpCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()
  def hyperplane(j: Int): Array[Double] =
    hpCache.computeIfAbsent(j, j2 => Array.tabulate(HyperDim) { i =>
      if ((hash60(s"hp:$j2:$i".getBytes("UTF-8")) & 1L) == 1L) 1.0 else -1.0
    })
  /** The default 16-row matrix — what the DuckDB oracle inlines. */
  lazy val hyperplanes: Array[Array[Double]] =
    Array.tabulate(HyperBits)(hyperplane)

  /** Band values: projection onto each hyperplane (index-order double
    * fold, exactly the oracle's list_sum), sign bit, packed little-endian
    * per band of `bitsPerBand`, `nBands` bands. */
  def hyperBands(emb: ArrayData, bitsPerBand: Int, nBands: Int): ArrayData = {
    val dim = math.min(emb.numElements(), HyperDim)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = emb.getFloat(i).toDouble; i += 1 }
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var bv = 0
      var k = 0
      while (k < bitsPerBand) {
        val signs = hyperplane(b * bitsPerBand + k)
        var acc = 0.0
        i = 0
        while (i < dim) { acc += v(i) * signs(i); i += 1 }
        if (acc > 0) bv |= 1 << k
        k += 1
      }
      out(b) = bv
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused trained-language-ID kernels (r15 — the sf10 audit's last
  * watch-list item): the composed featurize/score chains
  * (`transform(charNgrams(t,3), pmod(md5Hash60('lid:'||g), B))` and
  * `aggregate(fs, zeros, zip_with(acc, slice(flatLUT, f·L+1, L), +))`)
  * evaluate INTERPRETED per gram — per-element boxing plus a 5-slot
  * array slice+zip allocation per trigram. These one-pass loops are
  * bit-identical (same md5 bytes, same long sums, same first-max
  * tie-break) and run inside whole-stage codegen. */
object LidKernels {
  private val lidPrefix = "lid:".getBytes("US-ASCII")
  private val und = UTF8String.fromString("und")

  /** Trigram hash buckets of the text: for each 3-codepoint window w,
    * `hash60("lid:" + w) % buckets` — exactly the composed
    * `pmod(md5Hash60(concat('lid:', g)), buckets)` over
    * `charNgrams(t, 3)` (hash60 is non-negative, so % == pmod). */
  def grams(text: UTF8String, buckets: Int): ArrayData = {
    val nChars = text.numChars()
    if (nChars < 3) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](nChars - 2)
    var i = 0
    while (i < nChars - 2) {
      val g = text.substring(i, i + 3).getBytes
      val cat = new Array[Byte](lidPrefix.length + g.length)
      System.arraycopy(lidPrefix, 0, cat, 0, lidPrefix.length)
      System.arraycopy(g, 0, cat, lidPrefix.length, g.length)
      out(i) = (TextHash.hash60(cat) % buckets).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Argmax language over the bucket-major flat weight table: each
    * gram f adds flat[f·L .. f·L+L), prediction = langs[first index of
    * the max] (the lex-smallest tie-break — langs is sorted), no grams
    * → "und". Bit-identical to the composed aggregate/zip_with form. */
  def argmax(fs: ArrayData, flat: Array[Long],
      langs: Array[UTF8String]): UTF8String = {
    val n = fs.numElements()
    if (n == 0) return und
    val nL = langs.length
    val acc = new Array[Long](nL)
    var i = 0
    while (i < n) {
      val base = fs.getInt(i) * nL
      var j = 0
      while (j < nL) { acc(j) += flat(base + j); j += 1 }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < nL) { if (acc(j) > acc(best)) best = j; j += 1 }
    langs(best)
  }
}

/** [[LidKernels.grams]] as an expression (static-call codegen). */
case class LidGramsExpr(child: Expression, buckets: Int)
    extends TextHashUnary {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    LidKernels.grams(input.asInstanceOf[UTF8String], buckets)
  override protected def staticCall(c: String): String =
    s"graft.expr.LidKernels.grams($c, $buckets)"
  override protected def withNewChildInternal(c: Expression): LidGramsExpr =
    copy(child = c)
}

/** [[LidKernels.argmax]] as an expression; the weight table and the
  * sorted language list ride a codegen reference object. */
case class LidArgmaxExpr(child: Expression, flat: Array[Long],
    langs: Array[UTF8String]) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    LidKernels.argmax(input.asInstanceOf[ArrayData], flat, langs)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val fRef = ctx.addReferenceObj("lidFlat", flat, "long[]")
    val lRef = ctx.addReferenceObj("lidLangs", langs,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.LidKernels.argmax($c, $fRef, $lRef);")
  }
  override protected def withNewChildInternal(c: Expression): LidArgmaxExpr =
    copy(child = c)
}

/** Base for the unary hash expressions: deterministic, null-safe, with
  * codegen emitting one static call into [[TextHash]]. */
abstract class TextHashUnary extends UnaryExpression {
  /** Java source for the static call; `c` is the child's generated value. */
  protected def staticCall(c: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall(c))
  override def nullable: Boolean = child.nullable
}

case class MinHashSig(child: Expression, k: Int) extends TextHashUnary {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhash(input.asInstanceOf[ArrayData], k)
  override protected def staticCall(c: String): String =
    s"graft.expr.TextHash.minhash($c, $k)"
  override protected def withNewChildInternal(n: Expression): MinHashSig =
    copy(child = n)
}

case class SimHash60(child: Expression) extends TextHashUnary {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash60(input.asInstanceOf[ArrayData])
  override protected def staticCall(c: String): String =
    s"graft.expr.TextHash.simhash60($c)"
  override protected def withNewChildInternal(n: Expression): SimHash60 =
    copy(child = n)
}

case class SimHashBands(child: Expression, bandBits: Int, nBands: Int)
    extends TextHashUnary {
  override def dataType: DataType = StructType(Seq(
    StructField("sig", LongType),
    StructField("bands", ArrayType(LongType, containsNull = false))))
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhashBands(input.asInstanceOf[ArrayData], bandBits, nBands)
  override protected def staticCall(c: String): String =
    s"graft.expr.TextHash.simhashBands($c, $bandBits, $nBands)"
  override protected def withNewChildInternal(n: Expression): SimHashBands =
    copy(child = n)
}

case class FingerprintHash(child: Expression, n: Int) extends TextHashUnary {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHash.fingerprint(input.asInstanceOf[UTF8String], n)
  override protected def staticCall(c: String): String =
    s"graft.expr.TextHash.fingerprint($c, $n)"
  override protected def withNewChildInternal(n2: Expression): FingerprintHash =
    copy(child = n2)
}

case class LangIdHash(child: Expression) extends TextHashUnary {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextHash.langId(input.asInstanceOf[ArrayData])
  override protected def staticCall(c: String): String =
    s"graft.expr.TextHash.langId($c)"
  override protected def withNewChildInternal(n: Expression): LangIdHash =
    copy(child = n)
}

case class WordNgramsExpr(child: Expression, n: Int)
    extends TextHashUnary {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.wordNgrams(input.asInstanceOf[ArrayData], n)
  override protected def staticCall(c: String): String =
    s"graft.expr.TextHash.wordNgrams($c, $n)"
  override protected def withNewChildInternal(c: Expression): WordNgramsExpr =
    copy(child = c)
}

case class MinHashShingleSig(child: Expression, n: Int, k: Int)
    extends TextHashUnary {
  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(StringType, containsNull = true)),
    StructField("sh", ArrayType(LongType, containsNull = false))))
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashShingles(input.asInstanceOf[ArrayData], n, k)
  override protected def staticCall(c: String): String =
    s"graft.expr.TextHash.minhashShingles($c, $n, $k)"
  override protected def withNewChildInternal(c: Expression): MinHashShingleSig =
    copy(child = c)
}

case class MediaVecHash(child: Expression, dim: Int) extends TextHashUnary {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.mediaVec(input.asInstanceOf[UTF8String], dim)
  override protected def staticCall(c: String): String =
    s"graft.expr.TextHash.mediaVec($c, $dim)"
  override protected def withNewChildInternal(n: Expression): MediaVecHash =
    copy(child = n)
}

case class HyperBandValues(child: Expression, bitsPerBand: Int, nBands: Int)
    extends TextHashUnary {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.hyperBands(input.asInstanceOf[ArrayData], bitsPerBand, nBands)
  override protected def staticCall(c: String): String =
    s"graft.expr.TextHash.hyperBands($c, $bitsPerBand, $nBands)"
  override protected def withNewChildInternal(n: Expression): HyperBandValues =
    copy(child = n)
}
