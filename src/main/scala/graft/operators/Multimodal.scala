package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video treated as opaque
  * `binary` payloads with typed metadata, processed by batch-shaped
  * per-partition functions — the Scala/Dataset analogue of `mapInPandas`
  * (typed `Dataset[T]` + `mapPartitions` over fixed-size batches, which is
  * how an Arrow-batched UDF presents per batch).
  *
  * IMAGE decode is REAL: [[PngCodec]] round-trips planted synthetic
  * PNGs through javax.imageio (public, in-JVM, lossless) and the oracle
  * checks the decoded pixel stats analytically ([[mmDecodeReal]]).
  * AUDIO decode is REAL for PCM WAV: [[WavCodec]] hand-encodes and
  * chunk-walks the RIFF container byte-for-byte ([[mmDecodeWav]]).
  * VIDEO decode is REAL for raw-frame YUV4MPEG2: [[Y4mCodec]] walks
  * FRAME markers and reads every luma byte ([[mmDecodeY4m]]).
  * Compressed codecs (JPEG-in-motion, MP3/AAC, H.264) are not in this
  * container, so THAT decode path remains a stub — a clearly-marked deterministic fake
  * ([[FakeCodec]]) deriving dimensions/frames from md5 of the payload. Everything around it is
  * real and tested: binary schema, typed metadata, batch iteration
  * shape, partition-parallel execution, and an md5-derived feature
  * pipeline the DuckDB oracle replicates bit-for-bit.
  *
  * Scale shape: strictly per-row map work — no shuffle anywhere except
  * the presentation sort; at 100 TB this runs at scan speed and the batch
  * size bounds peak memory per task exactly like an Arrow batch would.
  *
  * The media corpus derives from `documents.parquet` (payload = UTF-8
  * bytes of `text`, modality = doc_id mod 3) — deterministic and
  * expressible on the oracle side (the corpus is ASCII, checked, so
  * char-substr == byte-substr in both engines).
  */
object Multimodal {

  /** Input row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, modality: String,
      payload: Array[Byte])

  /** Decoded/feature output — integers only (hash-stable). */
  final case class MediaFeatures(media_id: Long, modality: String,
      n_bytes: Long, width: Long, height: Long, n_frames: Long, fp: Long)

  /** Sampled "frame": byte-range slice of the payload + its fingerprint. */
  final case class FrameSample(media_id: Long, frame_idx: Long, fp: Long)

  /** Arrow-batch-shaped chunk size for the per-partition loop. */
  val BatchSize = 64

  /** Shared hashing convention (graft.expr.TextHash): thread-local
    * digest, no per-row MessageDigest allocation — this family is
    * documented as running at scan speed, so the per-row constant
    * matters. */
  private def md5Hex(bytes: Array[Byte]): String =
    graft.expr.TextHash.md5HexString(bytes)

  /** javax.imageio defaults to DISK-backed cache streams — a temp file
    * created and deleted per encode/decode, which dominates a
    * thousands-of-small-images pass (measured 11 s → ~3 s on the JPEG
    * gate). In-memory payloads never need it; flip once per JVM. The
    * codecs call this from executor code so the setting lands on every
    * executor JVM, not just the driver. */
  @transient private lazy val imageIoNoCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)
  private[operators] def ensureFastImageIo(): Unit = imageIoNoCache

  /** THE DECODE STUB: a deterministic fake standing in for a real codec
    * (libjpeg/ffmpeg are not in this container). Derives plausible
    * dimensions and frame counts from the payload fingerprint. Swap this
    * object for a real codec and nothing else changes. */
  object FakeCodec {
    def decode(modality: String, payload: Array[Byte]): (Long, Long, Long) = {
      val fp = md5Hex(payload)
      val w = 16 + java.lang.Long.parseLong(fp.take(15), 16) % 2048
      val h = 16 + java.lang.Long.parseLong(fp.slice(15, 30), 16) % 2048
      modality match {
        case "image" => (w, h, 1L)
        case "audio" => (0L, 0L, 0L)
        case _       => (w, h, 1 + java.lang.Long.parseLong(
          fp.slice(15, 30), 16) % 240) // video
      }
    }
  }

  /** Decoded image stats — REAL codec output ([[mmDecodeReal]]). */
  final case class ImageFeatures(media_id: Long, width: Long, height: Long,
      mean_r: Long, mean_g: Long, mean_b: Long)

  /** A REAL image codec: javax.imageio PNG decode (public, in-JVM,
    * deterministic — PNG is lossless so pixel values round-trip
    * exactly). Returns width/height and per-channel pixel sums. Payloads
    * that are not PNGs (no magic) fall back to [[FakeCodec]] semantics
    * upstream — this object only sees real images. */
  object PngCodec {
    val Magic: Array[Byte] =
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)

    def isPng(payload: Array[Byte]): Boolean =
      payload.length >= 4 && payload.take(4).sameElements(Magic)

    /** Deterministic synthetic image for media id: dims derive from the
      * id, pixel (x,y) channels are small integer formulas — so an
      * engine with no codec (the DuckDB oracle) can compute the decoded
      * stats analytically while THIS side proves a real encode→decode
      * round trip. */
    def synthPng(id: Long): Array[Byte] = {
      val w = 16 + (id % 32).toInt
      val h = 16 + ((id / 32) % 32).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 31 + y * 17 + id) % 256).toInt
          val g = ((x + y * 13 + id * 7) % 256).toInt
          val b = ((x * 5 + y + id * 3) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      ensureFastImageIo()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode a PNG payload → (width, height, sumR, sumG, sumB). */
    def decode(payload: Array[Byte]): (Int, Int, Long, Long, Long) = {
      ensureFastImageIo()
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "not a decodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      (w, h, sr, sg, sb)
    }
  }

  /** Decoded audio stats — REAL container parse ([[mmDecodeWav]]). */
  final case class AudioFeatures(media_id: Long, sample_rate: Long,
      n_samples: Long, mean_amp: Long)

  /** A REAL audio codec for PCM WAV: the RIFF/fmt/data container is a
    * public, fully-deterministic byte layout, so both the ENCODER (the
    * canonical 44-byte header + 16-bit little-endian samples) and the
    * DECODER (chunk walk + sample read-back) are exact — no codec
    * library needed. Like [[PngCodec]], the planted waveform derives
    * from integer formulas so the oracle computes the decoded stats
    * analytically while this side proves the byte-level round trip. */
  object WavCodec {
    def isWav(payload: Array[Byte]): Boolean =
      payload.length >= 12 &&
        payload.take(4).sameElements("RIFF".getBytes) &&
        payload.slice(8, 12).sameElements("WAVE".getBytes)

    /** Sample t of media id: ((t·31 + id·7) mod 4001) − 2000 — integer,
      * |amp| ≤ 2000, exact in a 16-bit sample. */
    def synthAmp(id: Long, t: Int): Int =
      (((t * 31L + id * 7L) % 4001L) - 2000L).toInt

    /** Deterministic synthetic mono PCM16 WAV for media id: 256–511
      * samples, sample rate 8/12/16/20 kHz — both derived from the id. */
    def synthWav(id: Long): Array[Byte] = {
      val n = 256 + (id % 256).toInt
      val sr = 8000 + (id % 4).toInt * 4000
      val data = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(data)
      def le32(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
      }
      def le16(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      }
      out.writeBytes("RIFF"); le32(36 + n * 2); out.writeBytes("WAVE")
      out.writeBytes("fmt "); le32(16); le16(1) /* PCM */ ; le16(1)
      le32(sr); le32(sr * 2); le16(2); le16(16)
      out.writeBytes("data"); le32(n * 2)
      var t = 0
      while (t < n) { le16(synthAmp(id, t) & 0xffff); t += 1 }
      data.toByteArray
    }

    /** The raw sample read-back (same RIFF walk as [[decode]]) — for
      * the windowed-energy pass, which needs every sample in order. */
    def decodeSamples(payload: Array[Byte]): Array[Short] = {
      require(isWav(payload), "not a RIFF/WAVE payload")
      def u32(o: Int) = (payload(o) & 0xff).toLong |
        ((payload(o + 1) & 0xff).toLong << 8) |
        ((payload(o + 2) & 0xff).toLong << 16) |
        ((payload(o + 3) & 0xff).toLong << 24)
      var off = 12
      val out = Array.newBuilder[Short]
      while (off + 8 <= payload.length) {
        val id = new String(payload.slice(off, off + 4), "US-ASCII")
        val len = u32(off + 4).toInt
        if (id == "data") {
          var p = off + 8
          val end = math.min(off + 8 + len, payload.length)
          while (p + 1 < end) {
            out += ((payload(p) & 0xff) |
              ((payload(p + 1) & 0xff) << 8)).toShort
            p += 2
          }
        }
        off += 8 + len + (len & 1)
      }
      out.result()
    }

    /** Parse a PCM WAV → (sampleRate, nSamples, Σ|amp|). Walks the
      * chunk list (so writers that insert LIST/fact chunks still
      * parse), requires PCM16 mono. */
    def decode(payload: Array[Byte]): (Int, Long, Long) = {
      require(isWav(payload), "not a RIFF/WAVE payload")
      def u16(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
      def u32(o: Int) = (payload(o) & 0xff).toLong |
        ((payload(o + 1) & 0xff).toLong << 8) |
        ((payload(o + 2) & 0xff).toLong << 16) |
        ((payload(o + 3) & 0xff).toLong << 24)
      var off = 12
      var sr = -1
      var sum = 0L
      var n = 0L
      while (off + 8 <= payload.length) {
        val id = new String(payload.slice(off, off + 4), "US-ASCII")
        val len = u32(off + 4).toInt
        if (id == "fmt ") {
          require(u16(off + 8) == 1 && u16(off + 10) == 1,
            "expected PCM mono")
          require(u16(off + 8 + 14) == 16, "expected 16-bit samples")
          sr = u32(off + 12).toInt
        } else if (id == "data") {
          var p = off + 8
          val end = math.min(off + 8 + len, payload.length)
          while (p + 1 < end) {
            val s = u16(p).toShort // sign via 16-bit wrap
            sum += math.abs(s.toLong)
            n += 1
            p += 2
          }
        }
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
      require(sr > 0 && n > 0, "missing fmt/data chunk")
      (sr, n, sum)
    }
  }

  /** Decoded video stats — REAL container parse ([[mmDecodeY4m]]). */
  final case class VideoFeatures(media_id: Long, width: Long, height: Long,
      n_frames: Long, mean_y: Long)

  /** A REAL video codec for the YUV4MPEG2 (.y4m) raw-frame container —
    * the public uncompressed interchange format (ffmpeg/mjpegtools):
    * a textual stream header, then `FRAME\n` + raw planes per frame.
    * Planted frames use C444 (three full-size planes) with
    * formula-derived luma, so the decode walk is byte-exact and the
    * oracle computes frame stats analytically — the same honest-real
    * device as [[PngCodec]]/[[WavCodec]]. Compressed video stays with
    * [[FakeCodec]]. */
  object Y4mCodec {
    private val Magic = "YUV4MPEG2 ".getBytes("US-ASCII")

    def isY4m(payload: Array[Byte]): Boolean =
      payload.length >= Magic.length &&
        payload.take(Magic.length).sameElements(Magic)

    /** Luma of (frame f, pixel x,y) for media id — integer formula. */
    def synthLuma(id: Long, f: Int, x: Int, y: Int): Int =
      ((x * 7L + y * 11L + f * 13L + id) % 256L).toInt

    /** Deterministic synthetic y4m: dims and frame count derive from
      * the id; chroma planes constant 128 (grey). */
    def synthY4m(id: Long): Array[Byte] = {
      val w = 16 + (id % 16).toInt
      val h = 16 + ((id / 16) % 16).toInt
      val frames = 2 + (id % 3).toInt
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n"
        .getBytes("US-ASCII"))
      var f = 0
      while (f < frames) {
        out.write("FRAME\n".getBytes("US-ASCII"))
        var y = 0
        while (y < h) { // Y plane
          var x = 0
          while (x < w) { out.write(synthLuma(id, f, x, y)); x += 1 }
          y += 1
        }
        var i = 0 // U then V planes, constant grey
        while (i < 2 * w * h) { out.write(128); i += 1 }
        f += 1
      }
      out.toByteArray
    }

    /** Parse → (width, height, nFrames, ΣY). Reads the stream header's
      * W/H/C tokens, then walks FRAME markers summing the luma plane. */
    def decode(payload: Array[Byte]): (Int, Int, Long, Long) = {
      require(isY4m(payload), "not a YUV4MPEG2 payload")
      val nl = payload.indexOf('\n'.toByte)
      require(nl > 0, "missing stream header terminator")
      val header = new String(payload, 0, nl, "US-ASCII")
      val toks = header.split(' ').toSeq
      def tok(p: String): Option[String] =
        toks.find(_.startsWith(p)).map(_.drop(1))
      val w = tok("W").get.toInt
      val h = tok("H").get.toInt
      require(toks.contains("C444"), "expected C444 planes")
      var off = nl + 1
      var frames = 0L
      var sumY = 0L
      val frameMark = "FRAME".getBytes("US-ASCII")
      while (off + frameMark.length <= payload.length) {
        require(payload.slice(off, off + frameMark.length)
          .sameElements(frameMark), s"bad FRAME marker at $off")
        val fnl = payload.indexOf('\n'.toByte, off)
        off = fnl + 1
        var i = 0
        while (i < w * h) { sumY += payload(off + i) & 0xff; i += 1 }
        off += 3 * w * h // Y + U + V
        frames += 1
      }
      require(frames > 0, "no frames")
      (w, h, frames, sumY)
    }
  }

  /** The media corpus as a typed Dataset. */
  def corpus(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    // resplit: decode/fingerprint per-row work; see Inputs.resplit
    Inputs.resplit(s, s.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Decode (stubbed) + feature-extract, batch-at-a-time per partition. */
  def decodeFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, frames) = FakeCodec.decode(r.modality, r.payload)
          MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
            w, h, frames,
            java.lang.Long.parseLong(md5Hex(r.payload).take(15), 16))
        }
      }
    }
  }

  /** Frame sampling: up to 4 evenly-strided byte-range "frames" per media
    * item (for video; 1 for image; none for audio), each fingerprinted. */
  def sampleFrames(rows: Dataset[MediaRow]): Dataset[FrameSample] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { r =>
          val nFrames = r.modality match {
            case "video" => 4L; case "image" => 1L; case _ => 0L
          }
          val n = r.payload.length
          (0L until math.min(nFrames, n.toLong)).map { i =>
            val from = (i * n / math.max(nFrames, 1L)).toInt
            val until = ((i + 1) * n / math.max(nFrames, 1L)).toInt
            FrameSample(r.media_id, i,
              java.lang.Long.parseLong(
                md5Hex(r.payload.slice(from, until)).take(15), 16))
          }
        }
      }
    }
  }

  def mmDecode(s: SparkSession, dir: String): DataFrame =
    decodeFeatures(corpus(s, dir)).toDF().orderBy("media_id")

  /** REAL image decode under the gate: every doc plants one deterministic
    * synthetic PNG ([[PngCodec.synthPng]] — encoded with javax.imageio on
    * executors, a genuine binary-payload corpus), then a second
    * batch-shaped pass DECODES the bytes back ([[PngCodec.decode]]) and
    * extracts width/height/per-channel means. The DuckDB oracle computes
    * the same stats analytically from the pixel formulas — so the hash
    * only matches if the PNG encode→decode round trip actually ran and
    * read back every pixel. Same per-row scale shape as [[mmDecode]]:
    * no shuffle except the presentation sort. */
  def mmDecodeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pngs = Inputs.resplit(s, s.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map(id =>
        MediaRow(id, "image", PngCodec.synthPng(id)))))
    pngs.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      require(PngCodec.isPng(r.payload), s"media ${r.media_id}: not a PNG")
      val (w, h, sr, sg, sb) = PngCodec.decode(r.payload)
      val n = w.toLong * h
      ImageFeatures(r.media_id, w, h, sr / n, sg / n, sb / n)
    })).toDF().orderBy("media_id")
  }

  /** REAL audio decode under the gate — the WAV twin of
    * [[mmDecodeReal]]: every doc plants a deterministic synthetic PCM16
    * WAV (encoded byte-by-byte on executors), a second batch-shaped
    * pass walks the RIFF chunks back and reads every sample, and the
    * oracle computes sample count / rate / mean |amplitude|
    * analytically from the waveform formula. Per-row map work only. */
  def mmDecodeWav(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wavs = Inputs.resplit(s, s.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map(id =>
        MediaRow(id, "audio", WavCodec.synthWav(id)))))
    wavs.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      require(WavCodec.isWav(r.payload), s"media ${r.media_id}: not WAV")
      val (sr, n, sumAbs) = WavCodec.decode(r.payload)
      AudioFeatures(r.media_id, sr, n, sumAbs / n)
    })).toDF().orderBy("media_id")
  }

  /** REAL video-container decode under the gate — the y4m twin of
    * [[mmDecodeReal]]/[[mmDecodeWav]]: plant a deterministic raw-frame
    * YUV4MPEG2 stream per doc, walk the FRAME markers back summing
    * every luma byte; dims/frame-count/mean-luma hash-checked against
    * the analytic formulas. Per-row map work only. */
  def mmDecodeY4m(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vids = Inputs.resplit(s, s.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map(id =>
        MediaRow(id, "video", Y4mCodec.synthY4m(id)))))
    vids.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      require(Y4mCodec.isY4m(r.payload), s"media ${r.media_id}: not y4m")
      val (w, h, frames, sumY) = Y4mCodec.decode(r.payload)
      VideoFeatures(r.media_id, w, h, frames,
        sumY / (w.toLong * h * frames))
    })).toDF().orderBy("media_id")
  }

  /** COMPRESSED-codec decode under the gate — JPEG through
    * javax.imageio, the one compressed format the bare JVM ships a
    * real codec for. JPEG is LOSSY: decoded pixel values are
    * codec-defined, not analytically derivable, so the gate hashes
    * only the spec-exact fields (dimensions — which survive any
    * conforming round trip) plus a sanity band on the decoded luma
    * (the planted mid-grey flat image must decode to mid-grey ± JPEG
    * ringing, asserted engine-side, not hashed). Proves the real
    * compressed encode→decode path executes on executors. */
  def mmDecodeJpeg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val jpegs = Inputs.resplit(s, s.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { id =>
        val w = 16 + (id % 24).toInt
        val h = 16 + ((id / 24) % 24).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val grey = (96 + id % 64).toInt // flat mid-grey per id
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (grey << 16) | (grey << 8) | grey)
            x += 1
          }
          y += 1
        }
        ensureFastImageIo()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        MediaRow(id, "image", bos.toByteArray)
      }))
    jpegs.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      ensureFastImageIo()
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"media ${r.media_id}: JPEG decode failed")
      // lossy-band sanity: a flat grey image decodes to that grey ± 2
      val grey = (96 + r.media_id % 64).toInt
      val mid = img.getRGB(img.getWidth / 2, img.getHeight / 2) & 0xff
      require(math.abs(mid - grey) <= 2,
        s"media ${r.media_id}: grey $grey decoded to $mid")
      (r.media_id, img.getWidth.toLong, img.getHeight.toLong)
    })).toDF("media_id", "width", "height").orderBy("media_id")
  }

  /** Windowed audio energy over REAL decoded WAVs — the feature pass an
    * audio pipeline runs before VAD/segmentation: fixed 128-sample
    * windows (plus the trailing partial — real pipelines keep it), per
    * window the sample count, Σ|amp| and max|amp| — exact integers, so
    * the whole distributed result sits under the oracle hash (the
    * oracle derives every sample from the planted waveform formula; the
    * engine reads them back through the RIFF chunk walk — agreement
    * proves the byte-level decode ran). Per-row map work fanning out to
    * O(n/128) window rows; no shuffle except the presentation sort. */
  final case class AudioWindow(media_id: Long, win_idx: Long,
      n_samples: Long, sum_abs: Long, max_abs: Long)

  val AudioWin = 128

  def mmAudioWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wavs = Inputs.resplit(s, s.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map(id =>
        MediaRow(id, "audio", WavCodec.synthWav(id)))))
    wavs.mapPartitions(_.grouped(BatchSize).flatMap(_.flatMap { r =>
      val samples = WavCodec.decodeSamples(r.payload)
      samples.grouped(AudioWin).zipWithIndex.map { case (win, i) =>
        AudioWindow(r.media_id, i.toLong, win.length.toLong,
          win.map(v => math.abs(v.toLong)).sum,
          win.map(v => math.abs(v.toLong)).max)
      }
    })).toDF().orderBy("media_id", "win_idx")
  }

  /** Perceptual difference-hash (dHash) over REAL decoded PNGs — the
    * image near-duplicate detector (the visual twin of SimHash): decode
    * → 8×8 block-mean grid → 56-bit left<right comparison hash →
    * banded hamming join. The planted corpus derives each image from a
    * BASE gradient (media_id DIV 8) plus a per-variant brightness
    * shift — a global shift moves both sides of every comparison
    * equally, so true variants collapse to hamming 0, which is exactly
    * the invariance dHash is built for; variant 7 additionally brightens
    * one pixel, flipping at most the one comparison its block feeds.
    * The oracle computes every hash analytically from the pixel
    * formulas — agreement proves the real PNG encode→decode→block-sum
    * walk ran on executors. */
  object PhashCodec {
    val Dim = 32      // 32×32 px → 8×8 blocks of 4×4
    val Bits = 56     // 8 rows × 7 adjacent-column comparisons

    /** Gray value of pixel (x, y) for media id (base + variant). The
      * gradient COEFFICIENTS derive from the base through prime
      * multipliers, so distinct bases produce decorrelated comparison
      * patterns (hamming ≈ 28 of 56 between bases — a shared-slope
      * formula would make the true pair set itself quadratic, which is
      * a broken fixture for a near-dup operator). */
    def synthGray(id: Long, x: Int, y: Int): Int = {
      val b = id / 8
      val v = (id % 8).toInt
      val a1 = 3 + (b * 7919L) % 131
      val a2 = 2 + (b * 104729L) % 127
      val g0 = ((x * a1 + y * a2 + b * 29L) % 200L).toInt + v
      if (v == 7 && x == 0 && y == 0) g0 + 48 else g0
    }

    def synthPng(id: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(Dim, Dim,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < Dim) {
        var x = 0
        while (x < Dim) {
          val g = synthGray(id, x, y)
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      ensureFastImageIo()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** REAL decode → dHash: PNG bytes → pixel read-back → 4×4 block
      * sums → bit k = r·7+c set iff block(r,c) < block(r,c+1). Sums
      * compare exactly like means (equal denominators), so the hash is
      * pure integer. */
    def dhash(payload: Array[Byte]): Long = {
      ensureFastImageIo()
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null && img.getWidth == Dim && img.getHeight == Dim,
        "not a 32x32 image payload")
      val bs = Array.ofDim[Long](8, 8)
      var y = 0
      while (y < Dim) {
        var x = 0
        while (x < Dim) {
          bs(y / 4)(x / 4) += img.getRGB(x, y) & 0xff // gray channel
          x += 1
        }
        y += 1
      }
      var h = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 7) {
          if (bs(r)(c) < bs(r)(c + 1)) h |= 1L << (r * 7 + c)
          c += 1
        }
        r += 1
      }
      h
    }
  }

  /** Near-duplicate image pairs by perceptual hash: hamming(dHash) ≤ 3,
    * found through the 4×14-bit band pigeonhole (≤3 differing bits
    * leave at least one of 4 bands untouched — recall 1 by
    * construction, the dedup_simhash_pairs device on the visual
    * modality). Scale: the hash pass is per-row map work at scan
    * speed; candidate generation is a band equi-join — quadratic work
    * confined to in-bucket, NEVER an all-pairs product (the oracle,
    * which runs at fixture scale, does the honest O(n²) to prove the
    * banding lost nothing). */
  def mmPhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Band DISTINCT hashes, not rows (r16 — the sf10 adjudication
    // probe): perceptual hashes of a near-dup-rich corpus have heavy
    // equal-hash classes (sf10: 8.3k images share the flat-image
    // hash), and banding per ROW multiplied every class through the
    // band join — 627M raw candidate rows for a 62k-hash space. The
    // hash space rides the band join alone; id GROUPS expand after the
    // hamming verify (cross-hash classes via two narrow join-backs,
    // same-hash classes via one equi-self-join that IS the output).
    // Work is now decode (linear) + band join over distinct hashes +
    // output materialization — the last is irreducible (the pair set
    // is the answer). Checkpointed: the hash frame is reused three
    // times and its lineage is the PNG decode pass.
    val hashes = Inputs
      .resplit(s, s.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { id =>
        (id, PhashCodec.dhash(PhashCodec.synthPng(id)))
      })).toDF("media_id", "h")
      .localCheckpoint()
    val dh = hashes.select("h").distinct()
    // TWO-LEVEL banding (r16): one level saturates — a perceptual-hash
    // space has degenerate band values (bv=0 from flat image regions:
    // ~10k of the sf10 corpus's 62k distinct hashes share it in every
    // band), and an equi-self-join evaluates each such bucket's O(k²)
    // pairs in ONE task (a join key cannot be split). Level 2 applies
    // the pigeonhole again INSIDE the bucket: a ≤3-bit pair differs in
    // ≤3 of the remaining 42 bits, so at least one of FOUR sub-chunks
    // (11/11/10/10 bits) of those 42 is untouched — key (band, bv,
    // chunk, sv) keeps recall 1 while splitting every mega-bucket
    // ~2^10 ways. 16 band rows per hash instead of 4; candidate volume
    // and the serial hot task both collapse.
    def rem(i: Int): org.apache.spark.sql.Column = {
      val low = (1L << (14 * i)) - 1
      (col("h").bitwiseAND(lit(low)))
        .bitwiseOR(shiftright(col("h"), 14).bitwiseAND(lit(~low)))
    }
    val chunkOff = Seq(0, 11, 22, 32)
    val chunkLen = Seq(11, 11, 10, 10)
    val bands = dh.select(col("h"),
      explode(array((for (i <- 0 until 4; c <- 0 until 4) yield
        struct(lit(i).as("bi"),
          shiftright(col("h"), 14 * i).bitwiseAND(lit(0x3FFFL))
            .as("bv"),
          lit(c).as("ci"),
          shiftright(rem(i), chunkOff(c))
            .bitwiseAND(lit((1L << chunkLen(c)) - 1)).as("sv"))): _*))
        .as("bk"))
    // hamming filter BEFORE the dedup shuffle: bit_count is codegen'd
    // map-side work, so the multi-key duplicates that reach the
    // exchange are only the ≤3-hamming survivors, never the raw
    // in-bucket collision volume
    val hp = bands.as("x").join(bands.as("y"),
        col("x.bk") === col("y.bk") && col("x.h") < col("y.h"))
      .select(col("x.h").as("ha"), col("y.h").as("hb"),
        bit_count(col("x.h").bitwiseXOR(col("y.h"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= 3)
      .dropDuplicates("ha", "hb")
    val cross = hp
      .join(hashes.select(col("h").as("ha"), col("media_id").as("ia")),
        "ha")
      .join(hashes.select(col("h").as("hb"), col("media_id").as("ib")),
        "hb")
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("hamming"))
    // Same-hash classes expand by TRIANGULAR BLOCKS, never one join
    // key: a plain self-join on h emits a k-member class's k²/2 pairs
    // inside ONE task (sf10: the flat-image class alone is 8.3k
    // members → 34M pairs, ~15 s serial — the gate's actual
    // bottleneck, and at larger corpora a single wedged executor).
    // Number each class once (cheap window), cut it into 1024-member
    // blocks, and join on (h, blockA, blockB) — every block PAIR is
    // its own shuffle key, so the quadratic emission parallelizes
    // ~(k/1024)²/2-way while producing the identical pair set.
    import org.apache.spark.sql.expressions.Window
    val numbered = hashes
      .withColumn("idx",
        (row_number().over(Window.partitionBy("h")
          .orderBy("media_id")) - 1).cast("long"))
      .withColumn("blk", shiftright(col("idx"), 10).cast("int"))
    val maxBlk = numbered
      .groupBy("h").agg(max(col("blk")).as("mblk"))
    val pSide = numbered.join(maxBlk, "h")
      .select(col("h"), col("media_id").as("ia"), col("idx").as("xa"),
        col("blk").as("ba"),
        explode(sequence(col("blk"), col("mblk"))).as("bb"))
    val qSide = numbered
      .select(col("h"), col("media_id").as("ib"), col("idx").as("xb"),
        explode(sequence(lit(0), col("blk"))).as("ba"),
        col("blk").as("bb"))
    val same = pSide.join(qSide, Seq("h", "ba", "bb"))
      .filter(col("xa") < col("xb"))
      .select(col("ia").as("a"), col("ib").as("b"), lit(0L).as("hamming"))
    cross.unionAll(same)
      .orderBy("a", "b")
  }

  /** Media-embedding similarity: a STUBBED media encoder (md5-derived
    * 16-dim vector standing in for a CLIP/CLAP model — same stub policy
    * as [[FakeCodec]]) feeding the engine's standard brute-force top-k.
    * Closes the multimodal loop decode → embed → similarity-search with
    * every Spark-side piece real (schema, broadcastable query vector,
    * TakeOrderedAndProject) and only the encoder faked, deterministically
    * enough for the oracle to replicate bit-for-bit. */
  private val EmbedDim = 16

  /** payload → float vector: component i = (hash60(text ":i") mod 2001
    * − 1000) / 1000 as float — both engines round the same double.
    * Native codegen'd expression ([[graft.expr.MediaVecHash]]): the
    * composed `transform` HOF ran 16 md5s/row interpreted, the exact
    * pattern the text family already replaced (TextHashExpressions
    * header). */
  private def mediaVec(payloadText: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(graft.expr.MediaVecHash(expression(payloadText), EmbedDim))
  }

  def mmEmbedKnn(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.l2Sq
    val m = corpus(s, dir).toDF()
      .select(col("media_id"), col("modality"),
        mediaVec(decode(col("payload"), "UTF-8")).as("v"))
    val q = m.filter(col("media_id") === 42).select(col("v")).head()
      .getSeq[Float](0)
    val qlit = array(q.map(lit(_)): _*)
    m.filter(col("media_id") =!= 42)
      .withColumn("d", l2Sq(col("v"), qlit))
      .orderBy(col("d").asc, col("media_id").asc)
      .limit(10)
      .select(col("media_id"), col("modality"))
  }

  def mmFrames(s: SparkSession, dir: String): DataFrame =
    sampleFrames(corpus(s, dir)).toDF()
      .orderBy("media_id", "frame_idx")

  private val corpusSql =
    """SELECT doc_id AS media_id,
      |  (['image','audio','video'])[(doc_id % 3 + 1)::INT] AS modality,
      |  text AS payload, length(text) AS n
      |FROM documents""".stripMargin

  private val embedKnnOracle: String = {
    def comp(expr: String) =
      s"(((('0x' || substr(md5($expr), 1, 15))::BIGINT % 2001) - 1000) / 1000.0)::FLOAT"
    s"""WITH corpus AS ($corpusSql),
       |v AS (SELECT media_id, modality,
       |  [${comp("payload || ':' || (i - 1)")}
       |   for i in generate_series(1, $EmbedDim)] AS v
       |  FROM corpus),
       |q AS (SELECT v AS qv FROM v WHERE media_id = 42)
       |SELECT media_id, modality FROM v, q
       |WHERE media_id != 42
       |ORDER BY list_sum([(v[i]::DOUBLE - qv[i]::DOUBLE)
       |    * (v[i]::DOUBLE - qv[i]::DOUBLE)
       |    for i in generate_series(1, $EmbedDim)]) ASC, media_id ASC
       |LIMIT 10""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "mm_embed_knn" -> embedKnnOracle,
    "mm_audio_windows" ->
      // the waveform formula windowed analytically — agrees only if
      // the sample read-back preserved order and sign
      s"""WITH ids AS (SELECT doc_id AS media_id,
         |    256 + doc_id % 256 AS n FROM documents),
         |sm AS (SELECT media_id, t, t // $AudioWin AS win_idx,
         |    abs((t * 31 + media_id * 7) % 4001 - 2000) AS a
         |  FROM ids, generate_series(0, 511) g(t) WHERE t < n)
         |SELECT media_id, win_idx, count(*) AS n_samples,
         |  CAST(sum(a) AS BIGINT) AS sum_abs,
         |  CAST(max(a) AS BIGINT) AS max_abs
         |FROM sm GROUP BY media_id, win_idx
         |ORDER BY media_id, win_idx""".stripMargin,
    "mm_phash_dedup" ->
      // every hash computed analytically from the pixel formulas, then
      // the honest all-pairs hamming at fixture scale — recall proof
      // for the engine's banded join
      """WITH ids AS (SELECT doc_id AS media_id, doc_id // 8 AS b,
        |    doc_id % 8 AS v FROM documents),
        |px AS (SELECT media_id, x, y,
        |    (x * (3 + (b * 7919) % 131) + y * (2 + (b * 104729) % 127)
        |      + b * 29) % 200 + v +
        |      CASE WHEN v = 7 AND x = 0 AND y = 0 THEN 48 ELSE 0 END AS g
        |  FROM ids, generate_series(0, 31) gx(x),
        |    generate_series(0, 31) gy(y)),
        |bs AS (SELECT media_id, y // 4 AS br, x // 4 AS bc,
        |    sum(g) AS s
        |  FROM px GROUP BY 1, 2, 3),
        |bits AS (SELECT l.media_id, l.br * 7 + l.bc AS k,
        |    CASE WHEN l.s < r.s THEN 1 ELSE 0 END AS bit
        |  FROM bs l JOIN bs r ON r.media_id = l.media_id
        |    AND r.br = l.br AND r.bc = l.bc + 1
        |  WHERE l.bc <= 6),
        |h AS (SELECT media_id,
        |    CAST(sum(bit * (1::BIGINT << k::INT)) AS BIGINT) AS h
        |  FROM bits GROUP BY 1)
        |SELECT x.media_id AS a, y.media_id AS b,
        |  CAST(bit_count(xor(x.h, y.h)) AS BIGINT) AS hamming
        |FROM h x JOIN h y ON x.media_id < y.media_id
        |WHERE bit_count(xor(x.h, y.h)) <= 3
        |ORDER BY a, b""".stripMargin,
    "mm_decode_jpeg" ->
      // only the spec-exact fields sit under the hash (JPEG is lossy;
      // the decoded-value sanity band is asserted engine-side)
      """SELECT doc_id AS media_id,
        |  CAST(16 + doc_id % 24 AS BIGINT) AS width,
        |  CAST(16 + (doc_id // 24) % 24 AS BIGINT) AS height
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_decode_y4m" ->
      // the luma formula summed analytically over (frame, x, y) —
      // agrees only if the FRAME walk read back every luma byte
      """WITH ids AS (SELECT doc_id AS media_id,
        |    16 + doc_id % 16 AS w,
        |    16 + (doc_id // 16) % 16 AS h,
        |    2 + doc_id % 3 AS nf
        |  FROM documents)
        |SELECT media_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(sum((x * 7 + y * 11 + f * 13 + media_id) % 256)
        |    // (w * h * nf) AS BIGINT) AS mean_y
        |FROM ids,
        |  generate_series(0, 3) gf(f),
        |  generate_series(0, 31) gx(x),
        |  generate_series(0, 31) gy(y)
        |WHERE f < nf AND x < w AND y < h
        |GROUP BY media_id, w, h, nf
        |ORDER BY media_id""".stripMargin,
    "mm_decode_wav" ->
      // the waveform formula summed analytically — agrees only if the
      // RIFF parse read back every 16-bit sample
      """WITH ids AS (SELECT doc_id AS media_id,
        |    256 + doc_id % 256 AS n,
        |    8000 + (doc_id % 4) * 4000 AS sr
        |  FROM documents)
        |SELECT media_id, CAST(sr AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum(abs((t * 31 + media_id * 7) % 4001 - 2000)) // n
        |    AS BIGINT) AS mean_amp
        |FROM ids, generate_series(0, 511) g(t)
        |WHERE t < n
        |GROUP BY media_id, sr, n
        |ORDER BY media_id""".stripMargin,
    "mm_decode_real" ->
      // the planted-pixel formulas, summed analytically: the engine-side
      // numbers came through a real PNG encode→decode, these come from
      // arithmetic — they agree only if the codec read back every pixel
      """WITH ids AS (SELECT doc_id AS media_id,
        |    16 + doc_id % 32 AS w, 16 + (doc_id // 32) % 32 AS h
        |  FROM documents)
        |SELECT media_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(sum((x * 31 + y * 17 + media_id) % 256) // (w * h)
        |    AS BIGINT) AS mean_r,
        |  CAST(sum((x + y * 13 + media_id * 7) % 256) // (w * h)
        |    AS BIGINT) AS mean_g,
        |  CAST(sum((x * 5 + y + media_id * 3) % 256) // (w * h)
        |    AS BIGINT) AS mean_b
        |FROM ids, generate_series(0, 47) gx(x), generate_series(0, 47) gy(y)
        |WHERE x < w AND y < h
        |GROUP BY media_id, w, h
        |ORDER BY media_id""".stripMargin,
    "mm_decode" ->
      s"""WITH corpus AS ($corpusSql)
         |SELECT media_id, modality,
         |  CAST(n AS BIGINT) AS n_bytes,
         |  CASE WHEN modality = 'audio' THEN 0
         |    ELSE 16 + ('0x' || substr(md5(payload), 1, 15))::BIGINT % 2048
         |    END AS width,
         |  CASE WHEN modality = 'audio' THEN 0
         |    ELSE 16 + ('0x' || substr(md5(payload), 16, 15))::BIGINT % 2048
         |    END AS height,
         |  CASE modality WHEN 'audio' THEN 0 WHEN 'image' THEN 1
         |    ELSE 1 + ('0x' || substr(md5(payload), 16, 15))::BIGINT % 240
         |    END AS n_frames,
         |  ('0x' || substr(md5(payload), 1, 15))::BIGINT AS fp
         |FROM corpus ORDER BY media_id""".stripMargin,
    "mm_frames" ->
      s"""WITH corpus AS ($corpusSql),
         |f AS (
         |  SELECT media_id, payload, n,
         |    CASE modality WHEN 'video' THEN 4 WHEN 'image' THEN 1
         |      ELSE 0 END AS nf
         |  FROM corpus)
         |SELECT media_id, i AS frame_idx,
         |  ('0x' || substr(md5(substr(payload,
         |      (i * n // greatest(nf, 1))::INT + 1,
         |      ((i + 1) * n // greatest(nf, 1))::INT
         |        - (i * n // greatest(nf, 1))::INT)), 1, 15))::BIGINT AS fp
         |FROM f, generate_series(0, 3) t(i)
         |WHERE i < least(nf, n)
         |ORDER BY media_id, frame_idx""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode" -> (mmDecode _),
    "mm_decode_real" -> (mmDecodeReal _),
    "mm_decode_wav" -> (mmDecodeWav _),
    "mm_decode_y4m" -> (mmDecodeY4m _),
    "mm_decode_jpeg" -> (mmDecodeJpeg _),
    "mm_frames" -> (mmFrames _),
    "mm_embed_knn" -> (mmEmbedKnn _),
    "mm_phash_dedup" -> (mmPhashDedup _),
    "mm_audio_windows" -> (mmAudioWindows _)
  )
}
