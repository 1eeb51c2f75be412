package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A multimodal asset row: opaque binary payload + typed metadata.
  * The schema every media table shares in this engine. */
final case class MediaAsset(
    asset_id: Long,
    media_type: String, // image | audio | video
    payload: Array[Byte],
    source: String)

/** Decoded (stubbed) media metadata. */
final case class MediaMeta(
    asset_id: Long,
    media_type: String,
    source: String,
    n_bytes: Long,
    header: Int,
    checksum: Long,
    width: Int,
    height: Int)

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Design per the builder brief: image/audio/video travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run batch-wise in `mapPartitions` (the Scala analogue
  * of `mapInPandas` — one iterator per partition, amortized per-batch
  * setup). [[decode]], [[decodeQoiPixels]] and [[resizeBmp]] are REAL
  * pure-JVM implementations: BMP, binary PPM/PGM and RIFF/WAV parse
  * header+pixels/samples directly, and QOI — an actually COMPRESSED
  * image format — decompresses fully (run-length, color index, delta
  * ops) per its published one-page spec. Formats needing heavy
  * entropy coders (JPEG/PNG/MP3) have no decoder in this container,
  * so [[decodeStub]] remains the clearly-marked deterministic FAKE
  * standing in for them (and q24's oracle stays pinned to it).
  *
  * At 100 TB: payloads dominate storage, so every transform keeps
  * metadata extraction SEPARATE from payload movement — filters on
  * width/height/type run on the (tiny) metadata columns and prune
  * parquet row groups before any payload byte is read.
  */
object Multimodal {

  /** STUB decode — deterministic fake standing in for an image/audio
    * decoder (no codec libraries in this environment). "Header" is the
    * first 4 bytes big-endian; fake dimensions derive from payload
    * bytes; checksum is a real polynomial over the payload. The
    * per-partition iterator shape is exactly what a real decoder
    * (libjpeg/ffmpeg via JNI) would use. */
  def decodeStub(assets: Dataset[MediaAsset]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup would open the codec once here
      it.map { a =>
        val p = a.payload
        val header =
          if (p.length >= 4)
            ((p(0) & 0xff) << 24) | ((p(1) & 0xff) << 16) | ((p(2) & 0xff) << 8) | (p(3) & 0xff)
          else 0
        var crc = 1469598103934665603L // FNV-1a offset basis (public constant)
        var i = 0
        while (i < p.length) { crc = (crc ^ (p(i) & 0xffL)) * 1099511628211L; i += 1 }
        MediaMeta(
          asset_id = a.asset_id,
          media_type = a.media_type,
          source = a.source,
          n_bytes = p.length.toLong,
          header = header,
          checksum = crc,
          width = 16 + math.floorMod(header, 1920),
          height = 16 + math.floorMod(header >> 8, 1080))
      }
    }
  }

  /** Real decode result for the containers [[decode]] understands.
    * Images: width/height in pixels, `channels` color components,
    * `n_samples` = pixel count. Audio (WAV): `sample_rate`/`channels`/
    * `bits_per_sample` from the fmt chunk, `n_samples` = frames in the
    * data chunk, width/height 0. Unknown formats: format "unknown",
    * all dimensions 0 (only n_bytes/checksum populated). */
  final case class DecodedMeta(
      asset_id: Long,
      media_type: String,
      source: String,
      n_bytes: Long,
      format: String, // bmp | qoi | ppm | pgm | wav | unknown
      width: Int,
      height: Int,
      channels: Int,
      sample_rate: Int,
      n_samples: Long,
      bits_per_sample: Int,
      checksum: Long)

  private def u16le(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
  private def i32le(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) | ((p(o + 2) & 0xff) << 16) |
      ((p(o + 3) & 0xff) << 24)
  private def fnv(p: Array[Byte]): Long = {
    var h = 1469598103934665603L // FNV-1a offset basis (public constant)
    var i = 0
    while (i < p.length) { h = (h ^ (p(i) & 0xffL)) * 1099511628211L; i += 1 }
    h
  }

  /** Parse a BMP header (BITMAPFILEHEADER + BITMAPINFOHEADER, the
    * uncompressed Windows bitmap layout): returns (width, height,
    * bitsPerPixel, pixelDataOffset); height may arrive negative
    * (top-down rows) — callers get the absolute value. */
  private[operators] def bmpHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] =
    if (p.length >= 54 && p(0) == 'B' && p(1) == 'M')
      Some((i32le(p, 18), math.abs(i32le(p, 22)), u16le(p, 28), i32le(p, 10)))
    else None

  /** Parse a binary PPM/PGM header (`P6`/`P5`, ASCII tokens with `#`
    * comments): (format, width, height, maxval, pixelOffset). */
  private[operators] def pnmHeader(p: Array[Byte]): Option[(String, Int, Int, Int, Int)] = {
    if (p.length < 2 || p(0) != 'P' || (p(1) != '5' && p(1) != '6')) return None
    val fmt = if (p(1) == '6') "ppm" else "pgm"
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      // skip whitespace and # comment lines
      var progressed = true
      while (progressed && i < p.length) {
        progressed = false
        while (i < p.length && (p(i) == ' ' || p(i) == '\n' || p(i) == '\r' || p(i) == '\t')) {
          i += 1; progressed = true
        }
        if (i < p.length && p(i) == '#') {
          while (i < p.length && p(i) != '\n') i += 1
          progressed = true
        }
      }
      var n = 0
      var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        n = n * 10 + (p(i) - '0'); i += 1; any = true
      }
      if (!any) return None
      vals(v) = n
      v += 1
    }
    // exactly one whitespace byte separates the header from pixel data
    if (i >= p.length) None else Some((fmt, vals(0), vals(1), vals(2), i + 1))
  }

  /** Parse a QOI header ("qoif" magic, big-endian dims): (width,
    * height, channels). QOI is the one COMPRESSED image format simple
    * enough for a dependency-free decoder — the published spec is a
    * single page (run-length, 64-slot color index, 2-bit diffs, luma
    * deltas), so unlike BMP/PPM this exercises real decompression. */
  private[operators] def qoiHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (p.length < 14 || p(0) != 'q' || p(1) != 'o' || p(2) != 'i' || p(3) != 'f')
      return None
    def u32be(o: Int): Long =
      ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
        ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    val w = u32be(4); val h = u32be(8); val ch = p(12) & 0xff
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
      (ch != 3 && ch != 4)) None
    else Some((w.toInt, h.toInt, ch))
  }

  /** REAL QOI decompression to flat RGBA bytes (4 per pixel), per the
    * published spec: QOI_OP_RGB/RGBA literals, QOI_OP_INDEX into the
    * running 64-slot hash table (r*3+g*5+b*7+a*11 mod 64),
    * QOI_OP_DIFF (2-bit channel deltas, bias 2), QOI_OP_LUMA (6-bit
    * green delta bias 32, red/blue relative to it bias 8), QOI_OP_RUN
    * (bias −1). Returns None on any malformed/truncated stream —
    * never throws, never loops (the cursor strictly advances). */
  def decodeQoiPixels(p: Array[Byte]): Option[Array[Byte]] = qoiHeader(p) match {
    case None => None
    case Some((w, h, _)) =>
      val n = w.toLong * h
      // a run chunk emits at most 62 pixels per stream byte, so any
      // stream too short to plausibly cover n pixels is rejected
      // BEFORE allocating n*4 bytes — a hostile 15-byte header must
      // not OOM the executor
      if (n > (Int.MaxValue / 4).toLong ||
        n > (p.length - 14).toLong * 62) return None
      val out = new Array[Byte](n.toInt * 4)
      val index = new Array[Int](64)
      var r = 0; var g = 0; var b = 0; var a = 255
      var i = 14
      var px = 0
      def hash: Int = (r * 3 + g * 5 + b * 7 + a * 11) % 64
      def emit(): Unit = {
        val o = px * 4
        out(o) = r.toByte; out(o + 1) = g.toByte
        out(o + 2) = b.toByte; out(o + 3) = a.toByte
        px += 1
      }
      while (px < n && i < p.length) {
        val b0 = p(i) & 0xff; i += 1
        if (b0 == 0xFE) { // QOI_OP_RGB
          if (i + 3 > p.length) return None
          r = p(i) & 0xff; g = p(i + 1) & 0xff; b = p(i + 2) & 0xff; i += 3
          index(hash) = (r << 24) | (g << 16) | (b << 8) | a
          emit()
        } else if (b0 == 0xFF) { // QOI_OP_RGBA
          if (i + 4 > p.length) return None
          r = p(i) & 0xff; g = p(i + 1) & 0xff
          b = p(i + 2) & 0xff; a = p(i + 3) & 0xff; i += 4
          index(hash) = (r << 24) | (g << 16) | (b << 8) | a
          emit()
        } else (b0 >> 6) match {
          case 0 => // QOI_OP_INDEX
            val v = index(b0 & 0x3f)
            r = (v >>> 24) & 0xff; g = (v >>> 16) & 0xff
            b = (v >>> 8) & 0xff; a = v & 0xff
            emit()
          case 1 => // QOI_OP_DIFF (bias 2)
            r = (r + ((b0 >> 4) & 0x03) - 2) & 0xff
            g = (g + ((b0 >> 2) & 0x03) - 2) & 0xff
            b = (b + (b0 & 0x03) - 2) & 0xff
            index(hash) = (r << 24) | (g << 16) | (b << 8) | a
            emit()
          case 2 => // QOI_OP_LUMA (dg bias 32; dr/db relative, bias 8)
            if (i + 1 > p.length) return None
            val dg = (b0 & 0x3f) - 32
            val b1 = p(i) & 0xff; i += 1
            r = (r + dg - 8 + ((b1 >> 4) & 0x0f)) & 0xff
            g = (g + dg) & 0xff
            b = (b + dg - 8 + (b1 & 0x0f)) & 0xff
            index(hash) = (r << 24) | (g << 16) | (b << 8) | a
            emit()
          case _ => // QOI_OP_RUN (bias −1; 63/64 are the RGB(A) tags)
            var run = (b0 & 0x3f) + 1
            if (px + run > n) return None
            while (run > 0) { emit(); run -= 1 }
        }
      }
      if (px == n) Some(out) else None
  }

  /** Parse a RIFF/WAVE fmt + data chunk pair: (channels, sampleRate,
    * bitsPerSample, nFrames). Walks the chunk list properly (chunks
    * are (id, u32 size) pairs padded to even offsets), so extra
    * chunks (LIST, fact) don't break the parse. */
  private[operators] def wavHeader(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (p.length < 44 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return None
    // Long cursor: a hostile/truncated u32 chunk size near 2^32 would
    // wrap Int arithmetic to a zero/negative step and spin the
    // executor task forever; in Long the step 8 + size + pad is
    // strictly positive, so the walk always terminates
    var i = 12L
    var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
    var dataSize = -1L
    while (i + 8 <= p.length && (dataSize < 0 || channels == 0)) {
      val o = i.toInt
      val id = new String(p, o, 4, "US-ASCII")
      val size = i32le(p, o + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 8 + 16 <= p.length) {
        channels = u16le(p, o + 10)
        rate = i32le(p, o + 12)
        blockAlign = u16le(p, o + 20)
        bits = u16le(p, o + 22)
      } else if (id == "data") {
        dataSize = math.min(size, p.length.toLong - i - 8)
      }
      i += 8L + size + (size & 1L)
    }
    if (channels == 0 || blockAlign == 0 || dataSize < 0) None
    else Some((channels, rate, bits, dataSize / blockAlign))
  }

  /** REAL decode — BMP, QOI, binary PPM/PGM, RIFF/WAV — parsed
    * header-first with no codec libraries (pure JVM byte arithmetic;
    * formats needing heavy entropy coders — JPEG/PNG/MP3 — remain
    * behind [[decodeStub]] and decode to format "unknown" here). Same
    * mapPartitions shape as the stub: per-partition setup amortizes,
    * metadata extraction never copies the payload; full QOI pixel
    * decompression is [[decodeQoiPixels]]. */
  def decode(assets: Dataset[MediaAsset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val p = a.payload
        def base(format: String, w: Int, h: Int, ch: Int, rate: Int,
            n: Long, bits: Int) =
          DecodedMeta(a.asset_id, a.media_type, a.source, p.length.toLong,
            format, w, h, ch, rate, n, bits, fnv(p))
        bmpHeader(p).map { case (w, h, bpp, _) =>
          base("bmp", w, h, math.max(1, bpp / 8), 0, w.toLong * h, bpp)
        }.orElse(qoiHeader(p).map { case (w, h, ch) =>
          base("qoi", w, h, ch, 0, w.toLong * h, 8)
        }).orElse(pnmHeader(p).map { case (fmt, w, h, maxv, _) =>
          val bits = if (maxv > 255) 16 else 8
          base(fmt, w, h, if (fmt == "ppm") 3 else 1, 0, w.toLong * h, bits)
        }).orElse(wavHeader(p).map { case (ch, rate, bits, frames) =>
          base("wav", 0, 0, ch, rate, frames, bits)
        }).getOrElse(base("unknown", 0, 0, 0, 0, 0L, 0))
      }
    }
  }

  /** Allocate a w×h 24-bit BMP with headers written; pixel bytes start
    * at offset 54, rows `((w*3+3)/4)*4`-byte aligned. */
  private[operators] def newBmp(w: Int, h: Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + stride * h)
    out(0) = 'B'; out(1) = 'M'
    def putI32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    putI32(2, out.length); putI32(10, 54); putI32(14, 40)
    putI32(18, w); putI32(22, h); out(26) = 1; out(28) = 24
    putI32(34, stride * h)
    out
  }

  /** Deterministic BMP synthesis from the documents fixture: one
    * w×h 24-bit bitmap per doc (w = 4 + id mod 13, h = 3 + id mod 7)
    * whose pixel bytes cycle the UTF-8 text — REAL media containers
    * for the real [[decode]] path in an environment with no media
    * fixtures. An oracle recomputes the dimension arithmetic directly,
    * so the q66 rollup hash-checks the full synthesize→parse loop. */
  def synthesizeBmpAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, source) =>
        val w = 4 + (id % 13).toInt
        val h = 3 + (id % 7).toInt
        val out = newBmp(w, h)
        val txt = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 54
        while (i < out.length) {
          out(i) = if (txt.isEmpty) 0 else txt((i - 54) % txt.length)
          i += 1
        }
        MediaAsset(id, "image", out, source)
      })
  }

  /** REAL nearest-neighbor resize for 24-bit uncompressed BMP payloads
    * (the one image format [[decode]] fully understands pixel-wise):
    * reads the source grid honoring BMP's 4-byte row padding and
    * bottom-up row order, samples to `targetW`×`targetH`, and emits a
    * well-formed BMP that [[decode]] round-trips. Non-BMP payloads
    * pass through unchanged (flagged false). Shape: payload→payload
    * map in the partition iterator, like [[resizeStub]] — but this one
    * is an actual image operation. */
  def resizeBmp(assets: Dataset[MediaAsset], targetW: Int,
      targetH: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    require(targetW > 0 && targetH > 0)
    assets.mapPartitions { it =>
      it.map { a =>
        val p = a.payload
        bmpHeader(p) match {
          case Some((w, h, 24, off)) if w > 0 && h > 0 &&
              off + (w * 3 + 3) / 4 * 4 * (h.toLong - 1) + w * 3 <= p.length =>
            val srcStride = (w * 3 + 3) / 4 * 4
            val dstStride = (targetW * 3 + 3) / 4 * 4
            val out = newBmp(targetW, targetH)
            var y = 0
            while (y < targetH) {
              val sy = math.min(h - 1, y * h / targetH)
              var x = 0
              while (x < targetW) {
                val sx = math.min(w - 1, x * w / targetW)
                val so = off + sy * srcStride + sx * 3
                val do_ = 54 + y * dstStride + x * 3
                out(do_) = p(so); out(do_ + 1) = p(so + 1); out(do_ + 2) = p(so + 2)
                x += 1
              }
              y += 1
            }
            a.copy(payload = out)
          case _ => a
        }
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload
    * (a video's frame-sample analogue), exploded to one row per frame.
    * Columnar — no UDF; the payload is sliced lazily. */
  def frameSample(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    assets
      .withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("asset_id"), col("frame_idx"), col("frame"))
  }

  /** STUB resize — deterministic fake standing in for an image resize
    * (no codec libraries in this environment): keeps every k-th payload
    * byte so the output byte count scales with the target/source pixel
    * ratio, and rewrites the metadata to the target dimensions. The
    * shape is the real one: a payload→payload map running batch-wise in
    * the partition iterator, metadata updated in the same pass. */
  def resizeStub(metaWithPayload: Dataset[(MediaMeta, Array[Byte])],
      targetW: Int, targetH: Int): Dataset[(MediaMeta, Array[Byte])] = {
    import metaWithPayload.sparkSession.implicits._
    metaWithPayload.mapPartitions { it =>
      // per-partition setup would allocate the scaler once here
      it.map { case (m, p) =>
        val ratio = (targetW.toLong * targetH).toDouble /
          math.max(1L, m.width.toLong * m.height)
        val outLen = math.max(1, math.min(p.length, (p.length * ratio).toInt))
        val step = math.max(1, p.length / outLen)
        val out = new Array[Byte](if (p.length == 0) 0 else (p.length + step - 1) / step)
        var i = 0; var j = 0
        while (i < p.length && j < out.length) { out(j) = p(i); i += step; j += 1 }
        (m.copy(width = targetW, height = targetH, n_bytes = out.length.toLong), out)
      }
    }
  }

  /** Feature extraction: payload → fixed-dim L2-normalized float vector
    * (folded byte histogram). Unlike the decode/resize stubs this is a
    * REAL computable featurizer — deterministic, content-sensitive —
    * with the exact output shape of an embedding model, so the result
    * plugs directly into [[Similarity]]/[[Ivf]]: the full
    * media → features → ANN pipeline runs end-to-end in this engine. */
  def featureExtract(assets: Dataset[MediaAsset], dim: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val h = new Array[Float](dim)
        var i = 0
        while (i < a.payload.length) {
          h((a.payload(i) & 0xff) % dim) += 1f
          i += 1
        }
        var n2 = 0.0
        i = 0
        while (i < dim) { n2 += h(i).toDouble * h(i); i += 1 }
        if (n2 > 0) {
          val inv = (1.0 / math.sqrt(n2)).toFloat
          i = 0
          while (i < dim) { h(i) *= inv; i += 1 }
        }
        (a.asset_id, h)
      }
    }.toDF("vec_id", "embedding")
  }

  /** Build a synthetic media-asset table from the documents fixture
    * (text bytes as payload) — the container has no real media, but the
    * binary-column path is identical. */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("source"))
      .as[MediaAsset]
  }
}
