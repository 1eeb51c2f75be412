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
  * header+pixels/samples directly; QOI — an actually COMPRESSED
  * image format — decompresses fully (run-length, color index, delta
  * ops) per its published one-page spec; and PNG decodes for real
  * through the JDK's own DEFLATE ([[decodePngPixels]]: chunk walk →
  * Inflater → all five scanline filters → gray/RGB/palette/alpha
  * expansion); JPEG decodes for real through the JDK's own baseline
  * codec (`javax.imageio`, part of java.desktop — [[decodeJpegPixels]];
  * dims still come from the hand-rolled [[jpegHeader]] SOF parse so
  * the metadata path stays closed-form). MP3/AAC decode is formally
  * OUT OF SCOPE (SURVEY §8 scope note: no JDK codec, no external
  * deps allowed; WAV + FLAC + ADPCM close the audio family raw/
  * lossless/lossy, and a deployment plugs a real decoder in as a
  * leaf-function swap in [[decodeOne]]) — [[decodeStub]] is the
  * clearly-marked deterministic FAKE standing in for it (and q24's
  * oracle stays pinned to it).
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
      format: String, // bmp | png | jpeg | qoi | ppm | pgm | wav | flac | y4m | unknown
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

  // ---------------------------------------------------------------- PNG

  /** Parse a PNG IHDR: (width, height, bitDepth, colorType). Accepts
    * only what [[decodePngPixels]] can actually decode — bit depth 8,
    * color types 0/2/3/4/6, compression 0, filter method 0, interlace
    * 0 (Adam7 rejected) — so a Some here is a decodable promise, not
    * just a sniff. The 8-byte signature makes PNG unambiguous against
    * every other container [[decode]] knows. */
  private[graft] def pngHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (p.length < 33) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if ((p(i) & 0xff) != sig(i)) return None; i += 1 }
    def u32be(o: Int): Long =
      ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
        ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
    // first chunk must be IHDR with the fixed 13-byte body
    if (u32be(8) != 13L || p(12) != 'I' || p(13) != 'H' || p(14) != 'D' ||
      p(15) != 'R') return None
    val w = u32be(16); val h = u32be(20)
    val bitDepth = p(24) & 0xff; val colorType = p(25) & 0xff
    val compression = p(26) & 0xff; val filterM = p(27) & 0xff
    val interlace = p(28) & 0xff
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
      bitDepth != 8 ||
      (colorType != 0 && colorType != 2 && colorType != 3 &&
        colorType != 4 && colorType != 6) ||
      compression != 0 || filterM != 0 || interlace != 0) None
    else Some((w.toInt, h.toInt, bitDepth, colorType))
  }

  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case _ => 4
  }

  /** REAL PNG decode to flat RGBA bytes (4 per pixel): chunk walk →
    * concatenated-IDAT zlib inflate (`java.util.zip.Inflater` — the
    * JDK's own DEFLATE, no codec library) → per-scanline unfilter
    * (None/Sub/Up/Average/Paeth) → sample expansion (gray, RGB,
    * palette via PLTE, gray+alpha, RGBA). Returns None on any
    * malformed, truncated, or hostile input — never throws. Bounds
    * discipline mirrors [[decodeQoiPixels]]: claimed dimensions are
    * checked against zlib's ~1032× maximum expansion BEFORE the raw
    * buffer is allocated, so a 33-byte header claiming 10⁹×10⁹ cannot
    * OOM an executor. Chunk CRCs are not verified (decode-lenient,
    * like most readers in data pipelines — corruption surfaces as an
    * inflate/size failure). */
  def decodePngPixels(p: Array[Byte]): Option[Array[Byte]] = pngHeader(p) match {
    case None => None
    case Some((w, h, _, colorType)) =>
      val ch = pngChannels(colorType)
      val n = w.toLong * h
      val stride = w.toLong * ch
      val rawSize = (stride + 1L) * h
      // zlib expands at most ~1032:1; anything the payload cannot
      // plausibly cover is rejected before allocation
      if (n > (Int.MaxValue / 4).toLong || rawSize > Int.MaxValue.toLong ||
        rawSize > p.length.toLong * 1032L + 1024L) return None
      def u32be(o: Int): Long =
        ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
          ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
      // chunk walk: collect PLTE and inflate IDAT segments as they come
      var palette: Array[Byte] = null
      val raw = new Array[Byte](rawSize.toInt)
      var rawOff = 0
      val inflater = new java.util.zip.Inflater()
      try {
        var o = 8L
        var done = false
        while (!done && o + 12 <= p.length) {
          val len = u32be(o.toInt)
          if (o + 12 + len > p.length) return None
          val typ = new String(p, o.toInt + 4, 4, "US-ASCII")
          if (typ == "PLTE") {
            if (len % 3 != 0 || len > 768) return None
            palette = java.util.Arrays.copyOfRange(p, o.toInt + 8,
              o.toInt + 8 + len.toInt)
          } else if (typ == "IDAT") {
            inflater.setInput(p, o.toInt + 8, len.toInt)
            var progressed = true
            while (progressed && !inflater.finished() && rawOff < raw.length) {
              val k = inflater.inflate(raw, rawOff, raw.length - rawOff)
              rawOff += k
              // needsDictionary: an FDICT zlib header demands a preset
              // dictionary PNG never uses — inflate() then returns 0
              // with needsInput() false forever, so treating it as
              // progress would spin this loop on a hostile payload
              if (inflater.needsDictionary()) return None
              progressed = k > 0 || !inflater.needsInput()
            }
          } else if (typ == "IEND") done = true
          o += 12L + len
        }
        if (rawOff != raw.length || (colorType == 3 && palette == null)) return None
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inflater.end()

      // unfilter in place, row by row (filter byte prefixes each row)
      val rowBytes = stride.toInt
      var y = 0
      while (y < h) {
        val rs = y * (rowBytes + 1)
        val ft = raw(rs) & 0xff
        if (ft > 4) return None
        var i = 0
        while (i < rowBytes) {
          val x = raw(rs + 1 + i) & 0xff
          val a = if (i >= ch) raw(rs + 1 + i - ch) & 0xff else 0
          // earlier rows have been collapsed to the array front (no
          // filter byte), so row y-1's samples sit at (y-1)*rowBytes
          val b = if (y > 0) raw((y - 1) * rowBytes + i) & 0xff else 0
          val c = if (i >= ch && y > 0) raw((y - 1) * rowBytes + i - ch) & 0xff else 0
          val v = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + ((a + b) >> 1)
            case _ => // Paeth
              val pp = a + b - c
              val pa = math.abs(pp - a); val pb = math.abs(pp - b)
              val pc = math.abs(pp - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          }
          raw(rs + 1 + i) = (v & 0xff).toByte
          i += 1
        }
        // collapse the filter byte away so row y-1's samples are at a
        // fixed stride for the next row's Up/Paeth references
        System.arraycopy(raw, rs + 1, raw, y * rowBytes, rowBytes)
        y += 1
      }

      // expand samples to RGBA
      val out = new Array[Byte](n.toInt * 4)
      var px = 0
      while (px < n) {
        val s = px * ch
        val o4 = px * 4
        colorType match {
          case 0 =>
            val g = raw(s)
            out(o4) = g; out(o4 + 1) = g; out(o4 + 2) = g; out(o4 + 3) = -1
          case 2 =>
            out(o4) = raw(s); out(o4 + 1) = raw(s + 1)
            out(o4 + 2) = raw(s + 2); out(o4 + 3) = -1
          case 3 =>
            val idx = (raw(s) & 0xff) * 3
            if (idx + 2 >= palette.length) return None
            out(o4) = palette(idx); out(o4 + 1) = palette(idx + 1)
            out(o4 + 2) = palette(idx + 2); out(o4 + 3) = -1
          case 4 =>
            val g = raw(s)
            out(o4) = g; out(o4 + 1) = g; out(o4 + 2) = g
            out(o4 + 3) = raw(s + 1)
          case _ =>
            out(o4) = raw(s); out(o4 + 1) = raw(s + 1)
            out(o4 + 2) = raw(s + 2); out(o4 + 3) = raw(s + 3)
        }
        px += 1
      }
      Some(out)
  }

  /** Encode a PNG from raw sample bytes (w·h·channels, row-major) —
    * the test/synthesis counterpart of [[decodePngPixels]]: per-row
    * FORWARD filtering with a caller-chosen filter type (0–4, so specs
    * and the synthetic fixture exercise every unfilter branch), one
    * deflated IDAT, CRC'd chunks. `palette` required iff colorType 3. */
  private[graft] def encodePng(w: Int, h: Int, colorType: Int,
      samples: Array[Byte], rowFilter: Int => Int,
      palette: Array[Byte] = null): Array[Byte] = {
    val ch = pngChannels(colorType)
    require(samples.length == w * h * ch, "samples must be w*h*channels")
    val rowBytes = w * ch
    val raw = new Array[Byte]((rowBytes + 1) * h)
    var y = 0
    while (y < h) {
      val ft = rowFilter(y) & 0xff
      require(ft <= 4, s"filter type $ft")
      raw(y * (rowBytes + 1)) = ft.toByte
      var i = 0
      while (i < rowBytes) {
        val x = samples(y * rowBytes + i) & 0xff
        val a = if (i >= ch) samples(y * rowBytes + i - ch) & 0xff else 0
        val b = if (y > 0) samples((y - 1) * rowBytes + i) & 0xff else 0
        val c = if (i >= ch && y > 0) samples((y - 1) * rowBytes + i - ch) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case _ =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (rowBytes + 1) + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = bos.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte,
        (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be32(data.length.toLong))
      val t = typ.getBytes("US-ASCII")
      out.write(t)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    if (colorType == 3) chunk("PLTE", palette)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Deterministic PNG synthesis from the documents fixture: one RGB
    * PNG per doc (w = 4 + id mod 11, h = 3 + id mod 5), pixel byte i =
    * (id·31 + i) mod 256, row y filtered with type (id + y) mod 5 — so
    * the corpus collectively exercises every PNG filter. Closed-form
    * pixel arithmetic means a SQL oracle can recompute the decoded
    * RGBA byte sum without a decoder (q81). */
  def synthesizePngAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions(_.map { case (id, source) =>
        val w = 4 + (id % 11).toInt
        val h = 3 + (id % 5).toInt
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < rgb.length) {
          rgb(i) = ((id * 31 + i) % 256).toByte
          i += 1
        }
        MediaAsset(id, "image",
          encodePng(w, h, 2, rgb, y => ((id + y) % 5).toInt), source)
      })
  }

  /** Per-asset sum of decoded RGBA bytes (unsigned) — the full
    * inflate+unfilter+expand loop distilled to one oracle-checkable
    * long per asset. Non-PNG payloads report −1. */
  def pngPixelSums(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val sum = decodePngPixels(a.payload) match {
        case Some(px) =>
          var s = 0L; var i = 0
          while (i < px.length) { s += px(i) & 0xff; i += 1 }
          s
        case None => -1L
      }
      (a.asset_id, sum)
    }).toDF("asset_id", "pix_sum")
  }

  // ----------------------------------------------------------------- GIF

  /** Parse a GIF logical screen descriptor: (width, height). Accepts
    * GIF87a and GIF89a. Dims are u16 little-endian right after the
    * 6-byte signature — closed-form like every header here. */
  private[graft] def gifHeader(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 13 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F' ||
      p(3) != '8' || (p(4) != '7' && p(4) != '9') || p(5) != 'a') return None
    val w = u16le(p, 6); val h = u16le(p, 8)
    if (w <= 0 || h <= 0) None else Some((w, h))
  }

  /** First-frame GIF decode to flat RGBA through the JDK's own LZW
    * reader (`javax.imageio` — same zero-external-deps stance as
    * JPEG). Returns None on malformed input. */
  def decodeGifPixels(p: Array[Byte]): Option[Array[Byte]] =
    gifHeader(p).flatMap { case (w, h) =>
      if (w.toLong * h > (Int.MaxValue / 4).toLong) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
        if (img == null || img.getWidth != w || img.getHeight != h) None
        else {
          val out = new Array[Byte](w * h * 4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val argb = img.getRGB(x, y)
              val o = (y * w + x) * 4
              out(o) = ((argb >> 16) & 0xff).toByte
              out(o + 1) = ((argb >> 8) & 0xff).toByte
              out(o + 2) = (argb & 0xff).toByte
              out(o + 3) = ((argb >>> 24) & 0xff).toByte
              x += 1
            }
            y += 1
          }
          Some(out)
        }
      } catch { case _: Exception => None }
    }

  // ---------------------------------------------------------------- JPEG

  /** Parse a JPEG SOF header: (width, height, components, bitsPerSample).
    * Walks the marker stream (SOI, then (0xFF, marker, u16be length)
    * segments, skipping fill bytes) to the first start-of-frame
    * SOF0–SOF15 (excluding DHT/DAC/RST which share the range), the
    * marker carrying the frame dimensions. Pure byte arithmetic — the
    * metadata path stays decoder-free and closed-form like every other
    * header parser here; only pixel access needs the entropy decoder
    * ([[decodeJpegPixels]]). Bounds-checked against truncated and
    * hostile streams: the cursor strictly advances (zero-length
    * segments rejected), so no input can spin the task. */
  private[graft] def jpegHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xFF || (p(1) & 0xff) != 0xD8)
      return None
    def u16(o: Int): Int = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
    var i = 2
    while (i + 4 <= p.length) {
      if ((p(i) & 0xff) != 0xFF) return None
      var m = p(i + 1) & 0xff
      while (m == 0xFF && i + 2 < p.length) { i += 1; m = p(i + 1) & 0xff } // fill bytes
      // the fill-byte walk advances i under a weaker bound than the
      // loop header's — re-check before the 2-byte length read below
      if (i + 4 > p.length) return None
      if (m == 0xD9 || m == 0xDA) return None // EOI / SOS before any SOF
      val isSof = (m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC
      val len = u16(i + 2)
      if (len < 2 || i + 2 + len > p.length) return None
      if (isSof) {
        if (len < 8) return None
        val bits = p(i + 4) & 0xff
        val h = u16(i + 5); val w = u16(i + 7)
        val comps = p(i + 9) & 0xff
        return if (w > 0 && h > 0 && comps > 0) Some((w, h, comps, bits)) else None
      }
      i += 2 + len
    }
    None
  }

  /** REAL JPEG decode to flat RGB bytes (3 per pixel) through the
    * JDK's OWN baseline codec (`javax.imageio`, part of java.desktop —
    * still no external codec library; the JDK ships a full huffman+
    * IDCT JPEG implementation the same way it ships DEFLATE for PNG).
    * Returns None on malformed input or on a platform without the
    * reader. Lossy format, so unlike PNG/QOI there is no bit-exact
    * byte oracle — specs pin a per-pixel error bound on the encode→
    * decode round-trip instead, and the q82 rollup audits the
    * closed-form header dims. */
  def decodeJpegPixels(p: Array[Byte]): Option[Array[Byte]] =
    jpegHeader(p).flatMap { case (w, h, _, _) =>
      if (w.toLong * h > (Int.MaxValue / 4).toLong) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
        if (img == null || img.getWidth != w || img.getHeight != h) None
        else {
          val out = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val o = (y * w + x) * 3
              out(o) = ((rgb >> 16) & 0xff).toByte
              out(o + 1) = ((rgb >> 8) & 0xff).toByte
              out(o + 2) = (rgb & 0xff).toByte
              x += 1
            }
            y += 1
          }
          Some(out)
        }
      } catch { case _: Exception => None }
    }

  /** Encode RGB samples (w·h·3, row-major) as baseline JPEG via the
    * JDK codec — the synthesis/spec counterpart of
    * [[decodeJpegPixels]]. */
  private[graft] def encodeJpeg(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "samples must be w*h*3")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) |
          (rgb(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpeg", bos), "no JPEG writer")
    bos.toByteArray
  }

  /** Spread a per-doc synthesis input across the cluster before a
    * heavyweight per-row codec pass: the JPEG encode/decode costs
    * orders of magnitude more per row than the (id, source) bytes it
    * consumes, and the documents fixture often arrives as ONE scan
    * partition (a single small parquet file), which would serialize
    * every encode on one core while the rest idle. Deterministic hash
    * repartition on doc_id (re-run tasks re-draw the same rows), sized
    * by defaultParallelism so it adapts to the cluster rather than a
    * local constant. Row placement never affects results — payloads
    * are pure per-row functions of (id, source) and every consumer
    * aggregates. */
  private def spreadById(docs: DataFrame): DataFrame =
    docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  /** Deterministic JPEG synthesis from the documents fixture: one RGB
    * JPEG per doc (w = 8 + id mod 9, h = 8 + id mod 7), pixels a
    * smooth id-seeded gradient (JPEG is lossy — smooth content keeps
    * the round-trip error small and the specs' bound meaningful). */
  def synthesizeJpegAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    spreadById(docs.select(col("doc_id"), col("source"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, source) =>
        val w = 8 + (id % 9).toInt
        val h = 8 + (id % 7).toInt
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = (y * w + x) * 3
            rgb(o) = (((id * 7) % 160) + x * 4).toByte
            rgb(o + 1) = (((id * 13) % 160) + y * 4).toByte
            rgb(o + 2) = ((id * 31) % 200).toByte
            x += 1
          }
          y += 1
        }
        MediaAsset(id, "image", encodeJpeg(w, h, rgb), source)
      })
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

  /** REAL decode — BMP, PNG, JPEG, QOI, binary PPM/PGM, RIFF/WAV,
    * YUV4MPEG2 — parsed header-first with no external codec libraries
    * (pure JVM byte arithmetic for every header including JPEG's SOF
    * and Y4M's parameter line; MP3/AAC are out of scope per the
    * SURVEY §8 scope note and decode to format "unknown" here). Same
    * mapPartitions shape as the stub: per-partition setup amortizes,
    * metadata extraction never copies the payload; full QOI pixel
    * decompression is [[decodeQoiPixels]]. */
  /** The per-asset header dispatch behind [[decode]] — exposed so
    * one-pass consumers ([[decodeWithFeatures]], the streaming ingest)
    * can pair it with other per-asset work without a second scan. */
  private[graft] def decodeOne(a: MediaAsset): DecodedMeta = {
    val p = a.payload
    def base(format: String, w: Int, h: Int, ch: Int, rate: Int,
        n: Long, bits: Int) =
      DecodedMeta(a.asset_id, a.media_type, a.source, p.length.toLong,
        format, w, h, ch, rate, n, bits, fnv(p))
    bmpHeader(p).map { case (w, h, bpp, _) =>
      base("bmp", w, h, math.max(1, bpp / 8), 0, w.toLong * h, bpp)
    }.orElse(pngHeader(p).map { case (w, h, bits, ct) =>
      base("png", w, h, pngChannels(ct), 0, w.toLong * h, bits)
    }).orElse(jpegHeader(p).map { case (w, h, comps, bits) =>
      base("jpeg", w, h, comps, 0, w.toLong * h, bits)
    }).orElse(gifHeader(p).map { case (w, h) =>
      base("gif", w, h, 1, 0, w.toLong * h, 8) // indexed storage
    }).orElse(qoiHeader(p).map { case (w, h, ch) =>
      base("qoi", w, h, ch, 0, w.toLong * h, 8)
    }).orElse(pnmHeader(p).map { case (fmt, w, h, maxv, _) =>
      val bits = if (maxv > 255) 16 else 8
      base(fmt, w, h, if (fmt == "ppm") 3 else 1, 0, w.toLong * h, bits)
    }).orElse(wavHeader(p).map { case (ch, rate, bits, frames) =>
      base("wav", 0, 0, ch, rate, frames, bits)
    }).orElse(Flac.flacHeader(p).map { case (rate, ch, bits, total) =>
      base("flac", 0, 0, ch, rate, total, bits)
    }).orElse(y4mHeader(p).map { case (w, h, fn, fd, cs, he) =>
      val fl = y4mFrameBytes(w, h, cs)
      val nf = if (fl <= 0 || fl > Int.MaxValue) -1
        else y4mWalk(p, he, fl.toInt)((_, _) => ())
      base("y4m", w, h, 3, math.round(fn.toDouble / fd).toInt,
        nf.toLong, 8)
    }).getOrElse(base("unknown", 0, 0, 0, 0, 0L, 0))
  }

  def decode(assets: Dataset[MediaAsset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeOne))
  }

  /** Metadata AND codec-invariant embedding in ONE per-asset pass —
    * the shape a streaming source needs (two separate lineages off one
    * stream would force a stream-stream join). Columns: every
    * [[DecodedMeta]] field + `embedding`. */
  def decodeWithFeatures(assets: Dataset[MediaAsset], dim: Int): DataFrame = {
    import assets.sparkSession.implicits._
    require(dim > 0 && dim <= 256, "dim must be in 1..256")
    assets.mapPartitions(_.map { a =>
      (decodeOne(a), rgbaHistogram(decodeToRgba(a.payload).getOrElse(a.payload), dim))
    }).select(col("_1.*"), col("_2").as("embedding"))
  }

  // ------------------------------------------------------------ WAV PCM

  /** Locate the PCM payload of a RIFF/WAVE stream: (channels, rate,
    * bits, dataOffset, dataBytes). Same hostile-size-safe chunk walk
    * as [[wavHeader]], but exposes where the samples LIVE so
    * [[wavPcmFeatures]] can read them. 8-bit (unsigned) and 16-bit
    * (signed LE) integer PCM only — the formats WAV actually carries
    * in practice without a codec. */
  private[graft] def wavPcmLayout(p: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (p.length < 44 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return None
    var i = 12L
    var channels = 0; var rate = 0; var bits = 0; var fmt = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= p.length && (dataOff < 0 || channels == 0)) {
      val o = i.toInt
      val id = new String(p, o, 4, "US-ASCII")
      val size = i32le(p, o + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 8 + 16 <= p.length) {
        fmt = u16le(p, o + 8)
        channels = u16le(p, o + 10)
        rate = i32le(p, o + 12)
        bits = u16le(p, o + 22)
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = math.min(size, p.length.toLong - i - 8).toInt
      }
      i += 8L + size + (size & 1L)
    }
    if (fmt != 1 || channels <= 0 || dataOff < 0 || (bits != 8 && bits != 16)) None
    else Some((channels, rate, bits, dataOff, dataLen))
  }

  /** Real audio feature extraction over PCM WAV payloads — integer
    * arithmetic end to end so every feature is EXACTLY recomputable by
    * a SQL oracle (q83): per asset, frame count, sum of squared
    * channel-0 samples (the un-normalized RMS energy), zero-crossing
    * count (sign flips, zero counted as non-negative), and peak
    * |sample|. 16-bit signed LE and 8-bit unsigned (centered at 128)
    * PCM. Non-WAV/non-PCM payloads report n_frames = −1. The shape is
    * the real pipeline one: a per-partition batch map emitting a tiny
    * feature row per asset, payloads never leave the scan. */
  def wavPcmFeatures(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      wavPcmLayout(a.payload) match {
        case Some((ch, _, bits, off, len)) =>
          val p = a.payload
          val bytesPerSample = bits / 8
          val frame = ch * bytesPerSample
          val n = len / frame
          var sumSq = 0L; var zcr = 0L; var peak = 0L
          var prevNonNeg = true
          var f = 0
          while (f < n) {
            val o = off + f * frame // channel 0 sample of frame f
            val s =
              if (bits == 16) (((p(o + 1) << 8) | (p(o) & 0xff)).toShort).toInt
              else (p(o) & 0xff) - 128
            sumSq += s.toLong * s
            val nonNeg = s >= 0
            if (f > 0 && nonNeg != prevNonNeg) zcr += 1
            prevNonNeg = nonNeg
            if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
            f += 1
          }
          (a.asset_id, n.toLong, sumSq, zcr, peak)
        case None => (a.asset_id, -1L, 0L, 0L, 0L)
      }
    }).toDF("asset_id", "n_frames", "sum_sq", "zcr", "peak")
  }

  /** Deterministic mono 16-bit PCM WAV synthesis from the documents
    * fixture: n = 64 + id mod 64 frames at 8 kHz, sample i =
    * ((id·37 + i·i) mod 2003) − 1001 — closed-form, so the q83 oracle
    * recomputes every feature without touching a decoder. */
  def synthesizeWavAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions(_.map { case (id, source) =>
        val n = 64 + (id % 64).toInt
        val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1).putInt(8000).putInt(16000)
          .putShort(2).putShort(16)
        bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
        var i = 0
        while (i < n) {
          bb.putShort((((id * 37 + i.toLong * i) % 2003) - 1001).toShort)
          i += 1
        }
        MediaAsset(id, "audio", bb.array(), source)
      })
  }

  // ---------------------------------------------------------- IMA ADPCM

  /** IMA/DVI ADPCM step-size table (89 entries) and index-adaptation
    * table — the public IMA "Recommended Practices for Enhancing
    * Digital Audio Compatibility" tables every WAV fmt-0x11 codec
    * shares. */
  private val AdpcmSteps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val AdpcmIndexAdjust: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA quantize/reconstruct step shared by encoder and decoder:
    * given the 4-bit code and the current step, the reconstructed
    * delta is step·(bits/4 + 1/8) computed in the canonical shift
    * cascade (bit-identical to the reference decoder everyone ships). */
  private def adpcmDelta(code: Int, step: Int): Int = {
    var d = step >> 3
    if ((code & 4) != 0) d += step
    if ((code & 2) != 0) d += step >> 1
    if ((code & 1) != 0) d += step >> 2
    d
  }

  /** Encode mono 16-bit PCM as a WAV fmt-0x11 (IMA ADPCM) stream:
    * standard block layout (4-byte header carrying the exact first
    * sample + step index, then 4-bit nibbles low-first), a `fact`
    * chunk with the true frame count (the final partial block is
    * zero-nibble padded — `fact` is what bounds the decode, per the
    * WAV spec). `samplesPerBlock` must be odd (header sample + an even
    * nibble count), default 505 ⇒ the canonical 256-byte block. */
  def encodeImaAdpcmWav(rate: Int, samples: Array[Short],
      samplesPerBlock: Int = 505): Array[Byte] = {
    require(samplesPerBlock >= 3 && samplesPerBlock % 2 == 1,
      "samplesPerBlock must be odd and >= 3")
    val blockAlign = 4 + (samplesPerBlock - 1) / 2
    val nBlocks = if (samples.isEmpty) 0
      else (samples.length + samplesPerBlock - 1) / samplesPerBlock
    val dataLen = nBlocks * blockAlign
    val bb = java.nio.ByteBuffer.allocate(12 + (8 + 20) + (8 + 4) + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 28 + 12 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(1).putInt(rate)
      .putInt(rate * blockAlign / samplesPerBlock) // nominal byte rate
      .putShort(blockAlign.toShort).putShort(4) // bits per (coded) sample
      .putShort(2).putShort(samplesPerBlock.toShort) // cbSize, wSamplesPerBlock
    bb.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var pos = 0
    // step index persists across blocks, and the FIRST block seeds it
    // from the opening sample delta (the step closest to |s1−s0|) —
    // the header carries the index, so any seed round-trips, and an
    // unseeded cold start costs several under-tracked samples that
    // dominate short streams. Standard encoder practice.
    var index = 0
    if (samples.length > 1) {
      val d0 = math.abs(samples(1) - samples(0))
      var best = 0
      var i = 1
      while (i < AdpcmSteps.length) {
        if (math.abs(AdpcmSteps(i) - d0) < math.abs(AdpcmSteps(best) - d0)) best = i
        i += 1
      }
      index = best
    }
    while (pos < samples.length) {
      var predictor: Int = samples(pos)
      bb.putShort(predictor.toShort).put(index.toByte).put(0.toByte)
      var i = 1
      var nibbleLo = -1
      while (i < samplesPerBlock) {
        val s: Int = if (pos + i < samples.length) samples(pos + i) else 0
        val step = AdpcmSteps(index)
        var diff = s - predictor
        var code = 0
        if (diff < 0) { code = 8; diff = -diff }
        if (diff >= step) { code |= 4; diff -= step }
        if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) { code |= 1 }
        val d = adpcmDelta(code, step)
        predictor = if ((code & 8) != 0) math.max(-32768, predictor - d)
          else math.min(32767, predictor + d)
        index = math.min(88, math.max(0, index + AdpcmIndexAdjust(code)))
        if (nibbleLo < 0) nibbleLo = code
        else { bb.put((nibbleLo | (code << 4)).toByte); nibbleLo = -1 }
        i += 1
      }
      pos += samplesPerBlock
    }
    bb.array()
  }

  /** Locate an IMA ADPCM (fmt 0x11) mono payload: (rate,
    * samplesPerBlock, blockAlign, dataOff, dataLen, nFrames from the
    * fact chunk, or −1 if absent). Same hostile-size-safe chunk walk
    * as [[wavPcmLayout]]. */
  private[graft] def imaAdpcmLayout(p: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Int)] = {
    if (p.length < 44 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return None
    var i = 12L
    var fmt = 0; var channels = 0; var rate = 0
    var blockAlign = 0; var spb = 0; var fact = -1
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= p.length && (dataOff < 0 || channels == 0)) {
      val o = i.toInt
      val id = new String(p, o, 4, "US-ASCII")
      val size = i32le(p, o + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 8 + 20 <= p.length) {
        fmt = u16le(p, o + 8)
        channels = u16le(p, o + 10)
        rate = i32le(p, o + 12)
        blockAlign = u16le(p, o + 20)
        spb = u16le(p, o + 26)
      } else if (id == "fact" && i + 8 + 4 <= p.length) {
        fact = i32le(p, o + 8)
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = math.min(size, p.length.toLong - i - 8).toInt
      }
      i += 8L + size + (size & 1L)
    }
    if (fmt != 0x11 || channels != 1 || dataOff < 0 || blockAlign < 4 ||
      spb < 3 || spb % 2 == 0 || blockAlign != 4 + (spb - 1) / 2) None
    else Some((rate, spb, blockAlign, dataOff, dataLen, fact))
  }

  /** Decode a mono IMA ADPCM WAV payload to 16-bit samples — the
    * standard block walk: re-seed predictor/index from each 4-byte
    * block header (the exact first sample), then one quantized step
    * per nibble, truncated to the `fact` frame count. Returns None for
    * non-ADPCM/malformed streams; never throws on hostile input. */
  private[graft] def decodeImaAdpcm(p: Array[Byte]): Option[Array[Short]] =
    imaAdpcmLayout(p).map { case (_, spb, blockAlign, off, len, fact) =>
      val nBlocks = len / blockAlign
      val total0 = nBlocks * spb
      val total = if (fact >= 0) math.min(fact, total0) else total0
      val out = new Array[Short](math.max(0, total))
      var b = 0
      var w = 0
      while (b < nBlocks && w < total) {
        val bo = off + b * blockAlign
        var predictor: Int = ((p(bo + 1) << 8) | (p(bo) & 0xff)).toShort.toInt
        var index = math.min(88, math.max(0, p(bo + 2) & 0xff))
        out(w) = predictor.toShort; w += 1
        var k = 0
        val nNibbles = spb - 1
        while (k < nNibbles && w < total) {
          val byte = p(bo + 4 + (k >> 1)) & 0xff
          val code = if ((k & 1) == 0) byte & 0xf else byte >> 4
          val step = AdpcmSteps(index)
          val d = adpcmDelta(code, step)
          predictor = if ((code & 8) != 0) math.max(-32768, predictor - d)
            else math.min(32767, predictor + d)
          index = math.min(88, math.max(0, index + AdpcmIndexAdjust(code)))
          out(w) = predictor.toShort; w += 1
          k += 1
        }
        b += 1
      }
      out
    }

  /** [[wavPcmFeatures]]'s exact feature quadruple over an in-memory
    * sample array: (n_frames, sum_sq, zcr, peak). */
  private def pcmFeaturesOf(samples: Array[Short]): (Long, Long, Long, Long) = {
    var sumSq = 0L; var zcr = 0L; var peak = 0L
    var prevNonNeg = true
    var f = 0
    while (f < samples.length) {
      val s: Int = samples(f)
      sumSq += s.toLong * s
      val nonNeg = s >= 0
      if (f > 0 && nonNeg != prevNonNeg) zcr += 1
      prevNonNeg = nonNeg
      if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
      f += 1
    }
    (samples.length.toLong, sumSq, zcr, peak)
  }

  /** Audio features over IMA ADPCM payloads: decode (pure-JVM block
    * walk) then the same integer quadruple [[wavPcmFeatures]] emits —
    * one row per asset, payloads never leave the scan. Non-ADPCM
    * payloads report n_frames = −1. */
  def adpcmFeatures(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      decodeImaAdpcm(a.payload) match {
        case Some(samples) =>
          val (n, ss, zc, pk) = pcmFeaturesOf(samples)
          (a.asset_id, n, ss, zc, pk)
        case None => (a.asset_id, -1L, 0L, 0L, 0L)
      }
    }).toDF("asset_id", "n_frames", "sum_sq", "zcr", "peak")
  }

  /** The closed-form triangle wave the ADPCM audit rides: sample i of
    * doc id is (32 − |((id+i) mod 64) − 32| − 16)·48 — a ±768 swing at
    * slope ±48, period 64, n = 64 + id mod 64 frames. Continuous
    * (ADPCM's design regime — a sawtooth's −1512 reset costs the codec
    * a multi-sample recovery that blows the energy band on short
    * signals), SQL-recomputable on the PCM leg, and the slope flips
    * still exercise the sign bit and step adaptation. */
  private def sawSample(id: Long, i: Int): Short =
    ((32 - math.abs(((id + i) % 64) - 32) - 16) * 48).toShort

  /** Mono 16-bit PCM WAV assets carrying the closed-form triangle. */
  def synthesizeSawWavAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions(_.map { case (id, source) =>
        val n = 64 + (id % 64).toInt
        val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1).putInt(8000).putInt(16000)
          .putShort(2).putShort(16)
        bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
        var i = 0
        while (i < n) { bb.putShort(sawSample(id, i)); i += 1 }
        MediaAsset(id, "audio", bb.array(), source)
      })
  }

  /** The same triangle pushed through [[encodeImaAdpcmWav]] — the
    * compressed leg of the q88 codec audit. */
  def synthesizeSawAdpcmAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions(_.map { case (id, source) =>
        val n = 64 + (id % 64).toInt
        val samples = Array.tabulate(n)(i => sawSample(id, i))
        MediaAsset(id, "audio", encodeImaAdpcmWav(8000, samples), source)
      })
  }

  // ---------------------------------------------------------------- FLAC

  /** Audio features over FLAC payloads: full pure-JVM decode
    * ([[Flac.decode]] — frames, fixed/LPC subframes, Rice residuals,
    * CRC-verified) then the identical integer quadruple
    * [[wavPcmFeatures]] emits on channel 0. FLAC is LOSSLESS, so
    * unlike the ADPCM band these features must EXACTLY equal the PCM
    * leg's — q89 proves that at the oracle level. Non-FLAC/corrupt
    * payloads report n_frames = −1. */
  def flacFeatures(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      Flac.decode(a.payload) match {
        case Some(audio) if audio.channels >= 1 =>
          val ch0 = audio.samples(0)
          var sumSq = 0L; var zcr = 0L; var peak = 0L
          var prevNonNeg = true
          var f = 0
          while (f < ch0.length) {
            val s = ch0(f)
            sumSq += s.toLong * s
            val nonNeg = s >= 0
            if (f > 0 && nonNeg != prevNonNeg) zcr += 1
            prevNonNeg = nonNeg
            if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
            f += 1
          }
          (a.asset_id, ch0.length.toLong, sumSq, zcr, peak)
        case _ => (a.asset_id, -1L, 0L, 0L, 0L)
      }
    }).toDF("asset_id", "n_frames", "sum_sq", "zcr", "peak")
  }

  /** The q88 triangle encoded as mono 16-bit FLAC — the lossless
    * compressed leg of the q89 audit. */
  def synthesizeSawFlacAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions(_.map { case (id, source) =>
        val n = 64 + (id % 64).toInt
        val samples = Array.tabulate(n)(i => sawSample(id, i).toInt)
        MediaAsset(id, "audio", Flac.encode(8000, Array(samples)), source)
      })
  }

  // ---------------------------------------------------------------- Y4M

  /** Parse a YUV4MPEG2 stream header: (width, height, fpsNum, fpsDen,
    * colorspace, firstFrameOffset). The one video container simple
    * enough to handle dependency-free — an ASCII parameter line
    * ("YUV4MPEG2 W.. H.. F<num>:<den> .. C444\n") followed by raw
    * "FRAME\n"-delimited planar frames. C444 (3·w·h bytes/frame) and
    * C420 family (3·w·h/2) supported. Header line capped at 256 bytes
    * — hostile unterminated headers terminate immediately. */
  private[graft] def y4mHeader(p: Array[Byte]): Option[(Int, Int, Int, Int, String, Int)] = {
    val magic = "YUV4MPEG2"
    if (p.length < magic.length + 1) return None
    var i = 0
    while (i < magic.length) { if (p(i) != magic.charAt(i)) return None; i += 1 }
    var end = i
    val cap = math.min(p.length, 256)
    while (end < cap && p(end) != '\n') end += 1
    if (end >= cap || p(end) != '\n') return None
    val params = new String(p, i, end - i, "US-ASCII").trim.split(" +")
    var w = 0; var h = 0; var fn = 25; var fd = 1; var cs = "420"
    params.foreach { t =>
      if (t.nonEmpty) try t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'F' =>
          val ab = t.substring(1).split(":")
          if (ab.length == 2) { fn = ab(0).toInt; fd = ab(1).toInt }
        case 'C' => cs = t.substring(1)
        case _ => ()
      } catch { case _: NumberFormatException => return None }
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) None
    else Some((w, h, fn, fd, cs, end + 1))
  }

  private def y4mFrameBytes(w: Int, h: Int, cs: String): Long =
    if (cs.startsWith("444")) 3L * w * h
    else if (cs.startsWith("420")) 3L * w * h / 2
    else -1L

  /** Walk the FRAME markers of a parsed Y4M stream, calling `f` with
    * (frameIdx, frameDataOffset). Returns the total frame count, or −1
    * on structural corruption. Cursor strictly advances. */
  private def y4mWalk(p: Array[Byte], headerEnd: Int, frameLen: Int)(
      f: (Int, Int) => Unit): Int = {
    var o = headerEnd
    var idx = 0
    while (o < p.length) {
      // "FRAME" + optional parameters + '\n'
      if (o + 5 > p.length || p(o) != 'F' || p(o + 1) != 'R' || p(o + 2) != 'A' ||
        p(o + 3) != 'M' || p(o + 4) != 'E') return -1
      var e = o + 5
      val cap = math.min(p.length, e + 256)
      while (e < cap && p(e) != '\n') e += 1
      if (e >= cap || p(e) != '\n') return -1
      if (e + 1 + frameLen > p.length) return -1 // truncated frame
      f(idx, e + 1)
      idx += 1
      o = e + 1 + frameLen
    }
    idx
  }

  /** Real video frame sampling over Y4M payloads: one row per
    * `stride`-th frame — (asset_id, frame_idx, frame bytes). The
    * honest version of [[frameSample]]'s fixed-size chunking: actual
    * container framing, planar frame payloads. Non-Y4M assets emit
    * nothing. */
  def y4mFrames(assets: Dataset[MediaAsset], stride: Int): DataFrame = {
    import assets.sparkSession.implicits._
    require(stride >= 1)
    assets.mapPartitions(_.flatMap { a =>
      y4mHeader(a.payload) match {
        case Some((w, h, _, _, cs, he)) =>
          val fl = y4mFrameBytes(w, h, cs)
          if (fl <= 0 || fl > Int.MaxValue) Iterator.empty
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Array[Byte])]
            val n = y4mWalk(a.payload, he, fl.toInt) { (idx, off) =>
              if (idx % stride == 0)
                out += ((a.asset_id, idx,
                  java.util.Arrays.copyOfRange(a.payload, off, off + fl.toInt)))
            }
            if (n < 0) Iterator.empty else out.iterator
          }
        case None => Iterator.empty
      }
    }).toDF("asset_id", "frame_idx", "frame")
  }

  /** Per-frame byte sums over Y4M payloads — the frame walk distilled
    * to one oracle-checkable long per frame (q84): (asset_id,
    * frame_idx, fsum). Corrupt/non-Y4M payloads emit a single
    * (asset_id, −1, −1) sentinel row. */
  def y4mFrameSums(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.flatMap { a =>
      val bad = Iterator((a.asset_id, -1, -1L))
      y4mHeader(a.payload) match {
        case Some((w, h, _, _, cs, he)) =>
          val fl = y4mFrameBytes(w, h, cs)
          if (fl <= 0 || fl > Int.MaxValue) bad
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
            val n = y4mWalk(a.payload, he, fl.toInt) { (idx, off) =>
              var s = 0L; var i = off
              while (i < off + fl.toInt) { s += a.payload(i) & 0xff; i += 1 }
              out += ((a.asset_id, idx, s))
            }
            if (n < 0) bad else out.iterator
          }
        case None => bad
      }
    }).toDF("asset_id", "frame_idx", "fsum")
  }

  /** Deterministic C444 Y4M synthesis from the documents fixture:
    * nf = 2 + id mod 4 frames of w = 4 + id mod 5, h = 2 + id mod 3 at
    * 25 fps; frame f byte i = (id·17 + f·29 + i) mod 256 — closed-form
    * for the q84 oracle. */
  def synthesizeY4mAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions(_.map { case (id, source) =>
        val w = 4 + (id % 5).toInt
        val h = 2 + (id % 3).toInt
        val nf = 2 + (id % 4).toInt
        val frameLen = 3 * w * h
        val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n"
          .getBytes("US-ASCII")
        val bb = java.nio.ByteBuffer.allocate(
          header.length + nf * (6 + frameLen))
        bb.put(header)
        var f = 0
        while (f < nf) {
          bb.put("FRAME\n".getBytes("US-ASCII"))
          var i = 0
          while (i < frameLen) {
            bb.put(((id * 17 + f * 29 + i) % 256).toByte)
            i += 1
          }
          f += 1
        }
        MediaAsset(id, "video", bb.array(), source)
      })
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

  /** Decode a 24-bit uncompressed BMP to flat RGBA (top-down row
    * order, BGR→RGB swapped, 4-byte row padding honored; BMP's
    * negative-height top-down variant handled). */
  def decodeBmpPixels(p: Array[Byte]): Option[Array[Byte]] = bmpHeader(p) match {
    case Some((w, h, 24, off)) if w > 0 && h > 0 =>
      val stride = (w * 3 + 3) / 4 * 4
      val topDown = i32le(p, 22) < 0 // raw height sign = row order
      if (w.toLong * h > (Int.MaxValue / 4).toLong ||
        off <= 0 || off.toLong + stride.toLong * (h - 1) + w * 3 > p.length) None
      else {
        val out = new Array[Byte](w * h * 4)
        var y = 0
        while (y < h) {
          val src = off + (if (topDown) y else h - 1 - y) * stride
          var x = 0
          while (x < w) {
            val so = src + x * 3
            val o = (y * w + x) * 4
            out(o) = p(so + 2); out(o + 1) = p(so + 1)
            out(o + 2) = p(so); out(o + 3) = -1
            x += 1
          }
          y += 1
        }
        Some(out)
      }
    case _ => None
  }

  /** Decode a binary PPM (P6, RGB) or PGM (P5, gray) with maxval ≤ 255
    * to flat RGBA — raw sample bytes after the ASCII header; the
    * simplest members of the uniform pixel surface. 16-bit (maxval >
    * 255) PNM stays metadata-only. */
  def decodePnmPixels(p: Array[Byte]): Option[Array[Byte]] =
    pnmHeader(p).flatMap { case (fmt, w, h, maxv, off) =>
      val ch = if (fmt == "ppm") 3 else 1
      if (maxv > 255 || w <= 0 || h <= 0 ||
        w.toLong * h > (Int.MaxValue / 4).toLong ||
        off.toLong + w.toLong * h * ch > p.length) None
      else {
        val out = new Array[Byte](w * h * 4)
        var i = 0
        while (i < w * h) {
          val s = off + i * ch
          val o = i * 4
          if (ch == 3) {
            out(o) = p(s); out(o + 1) = p(s + 1); out(o + 2) = p(s + 2)
          } else {
            out(o) = p(s); out(o + 1) = p(s); out(o + 2) = p(s)
          }
          out(o + 3) = -1
          i += 1
        }
        Some(out)
      }
    }

  /** Uniform pixel access across every image codec this engine
    * decodes: flat RGBA, top-down — BMP, PNG, QOI bit-exact; JPEG via
    * the JDK codec (lossy). The property that matters downstream: the
    * SAME pixels arrive as the SAME bytes no matter which lossless
    * container carried them. */
  def decodeToRgba(p: Array[Byte]): Option[Array[Byte]] =
    decodeBmpPixels(p)
      .orElse(decodePngPixels(p))
      .orElse(decodeQoiPixels(p))
      .orElse(decodePnmPixels(p))
      .orElse(decodeGifPixels(p))
      .orElse(decodeJpegPixels(p).map { rgb =>
        val out = new Array[Byte](rgb.length / 3 * 4)
        var i = 0
        while (i < rgb.length / 3) {
          out(i * 4) = rgb(i * 3); out(i * 4 + 1) = rgb(i * 3 + 1)
          out(i * 4 + 2) = rgb(i * 3 + 2); out(i * 4 + 3) = -1
          i += 1
        }
        out
      })

  /** CODEC-INVARIANT feature extraction: [[featureExtract]]'s
    * histogram computed over DECODED RGBA pixels instead of container
    * bytes, so one image produces one embedding no matter which
    * lossless format carried it (BMP == PNG == QOI bit-identical;
    * JPEG lands within codec noise — spec-pinned). Bins are
    * CONTIGUOUS value ranges ((v·dim)/256), not the mod fold
    * [[featureExtract]] uses on opaque bytes — ±ε codec noise moves a
    * value to an adjacent bin at worst, where a fold would scatter it
    * arbitrarily. Assets no decoder understands fall back to the
    * payload-byte histogram, so mixed media tables still featurize
    * every row. */
  /** The contiguous-bin L2-normalized histogram behind
    * [[featureExtractDecoded]] and [[decodeWithFeatures]]. */
  private[graft] def rgbaHistogram(bytes: Array[Byte], dim: Int): Array[Float] = {
    val h = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      h(((bytes(i) & 0xff) * dim) / 256) += 1f
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
    h
  }

  def featureExtractDecoded(assets: Dataset[MediaAsset], dim: Int): DataFrame = {
    import assets.sparkSession.implicits._
    require(dim > 0 && dim <= 256, "dim must be in 1..256")
    assets.mapPartitions(_.map(a =>
      (a.asset_id, rgbaHistogram(decodeToRgba(a.payload).getOrElse(a.payload), dim))))
      .toDF("vec_id", "embedding")
  }

  /** Encode RGB samples (w·h·3, row-major top-down) as a 24-bit BMP —
    * the synthesis/spec counterpart of [[decodeBmpPixels]] (bottom-up
    * rows, BGR order, padded stride). */
  private[graft] def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "samples must be w*h*3")
    val stride = (w * 3 + 3) / 4 * 4
    val out = newBmp(w, h)
    var y = 0
    while (y < h) {
      val dst = 54 + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val so = (y * w + x) * 3
        out(dst + x * 3) = rgb(so + 2)     // B
        out(dst + x * 3 + 1) = rgb(so + 1) // G
        out(dst + x * 3 + 2) = rgb(so)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode RGB samples as an all-literal QOI stream (every pixel a
    * QOI_OP_RGB chunk + the 8-byte end marker) — a valid stream any
    * conforming encoder could emit; the synthesis counterpart of
    * [[decodeQoiPixels]] for mixed-codec fixtures. */
  private[graft] def encodeQoiRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "samples must be w*h*3")
    val bb = java.nio.ByteBuffer.allocate(14 + w * h * 4 + 8)
    bb.put('q'.toByte).put('o'.toByte).put('i'.toByte).put('f'.toByte)
    bb.putInt(w).putInt(h).put(3.toByte).put(0.toByte)
    var i = 0
    while (i < w * h) {
      bb.put(0xFE.toByte)
      bb.put(rgb(i * 3)).put(rgb(i * 3 + 1)).put(rgb(i * 3 + 2))
      i += 1
    }
    var z = 0
    while (z < 7) { bb.put(0.toByte); z += 1 }
    bb.put(1.toByte)
    bb.array()
  }

  /** Mixed-codec synthesis: the SAME closed-form pixels as
    * [[synthesizePngAssets]] (w = 4 + id mod 11, h = 3 + id mod 5,
    * byte i = (id·31 + i) mod 256), but each doc ships in the
    * container its id selects — BMP, PNG, or QOI by id mod 3. A
    * decoder that disagrees across codecs produces different pixels
    * for different thirds of the corpus, which the q85 oracle's
    * closed-form histogram would expose. */
  def synthesizeMixedAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions(_.map { case (id, source) =>
        val w = 4 + (id % 11).toInt
        val h = 3 + (id % 5).toInt
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < rgb.length) { rgb(i) = ((id * 31 + i) % 256).toByte; i += 1 }
        val payload = (id % 3) match {
          case 0 => encodeBmp(w, h, rgb)
          case 1 => encodePng(w, h, 2, rgb, y => ((id + y) % 5).toInt)
          case _ => encodeQoiRgb(w, h, rgb)
        }
        MediaAsset(id, "image", payload, source)
      })
  }

  /** GIF89a encode of an indexed grayscale image — hand-rolled from
    * the published GIF spec (logical screen descriptor + 256-gray
    * global color table + one image block, LZW 8-bit min code size),
    * like the BMP/PNG/QOI encoders above. NOT ImageIO: the JDK's GIF
    * writer silently corrupts images with height ≤ 4 (verified against
    * its own reader), and these fixtures are deliberately tiny.
    * LOSSLESS by construction: indices over an explicit 256-gray
    * palette, so decode returns (v, v, v) per pixel bit-exactly — the
    * lever that lets GIF join the lossless codec-agreement rotation
    * (q86) despite GIF's 256-color limit. Round-trip validated against
    * the JDK READER (an independent implementation). */
  private[graft] def encodeGifGray(w: Int, h: Int,
      gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, "samples must be w*h")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF7) // global color table, 8 bits/channel, 256 entries
    out.write(0); out.write(0) // background index, aspect
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    out.write(0x2C) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(0) // no local table, not interlaced

    // --- GIF-variant LZW over the index stream, min code size 8:
    // clear=256, eoi=257, first dynamic code 258; code width grows
    // when the next code to assign no longer fits; dict resets at 4096
    out.write(8)
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    val Clear = 256; val Eoi = 257
    val dict = scala.collection.mutable.HashMap.empty[Int, Int] // (prefix<<8|k) → code
    var next = 258
    emit(Clear)
    var cur = gray(0) & 0xff
    var i = 1
    while (i < gray.length) {
      val k = gray(i) & 0xff
      val key = (cur << 8) | k
      dict.get(key) match {
        case Some(code) => cur = code
        case None =>
          emit(cur)
          dict.put(key, next)
          next += 1
          // the decoder's free slot runs ONE entry behind the encoder
          // (it defines d(j-1)'s entry only after reading dj), so the
          // width grows one code later than the naive next==2^size —
          // verified against the JDK reader across the 512 boundary
          if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (next == 4096) {
            emit(Clear); dict.clear()
            next = 258; codeSize = 9
          }
          cur = k
      }
      i += 1
    }
    emit(cur); emit(Eoi)
    if (bitCnt > 0) data.write((bitBuf & 0xff).toInt)
    // sub-block framing: ≤255-byte chunks, zero-length terminator
    val lzw = data.toByteArray
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Grayscale mixed-codec synthesis — q86's fixture: the same
    * closed-form value stream as [[synthesizeMixedAssets]] (byte i =
    * (id·31 + i) mod 256) but as GRAY pixels (r = g = b = v, one value
    * per pixel), so the 256-color GIF container can carry them
    * losslessly; each doc ships in the container its id mod 4 selects
    * — BMP, PNG, QOI, or GIF. All four decode to identical RGBA. */
  def synthesizeGrayMixedAssets(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    spreadById(docs.select(col("doc_id"), col("source"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, source) =>
        val w = 4 + (id % 11).toInt
        val h = 3 + (id % 5).toInt
        val gray = new Array[Byte](w * h)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < gray.length) {
          val v = ((id * 31 + i) % 256).toByte
          gray(i) = v
          rgb(i * 3) = v; rgb(i * 3 + 1) = v; rgb(i * 3 + 2) = v
          i += 1
        }
        val payload = (id % 4) match {
          case 0 => encodeBmp(w, h, rgb)
          case 1 => encodePng(w, h, 2, rgb, y => ((id + y) % 5).toInt)
          case 2 => encodeQoiRgb(w, h, rgb)
          case _ => encodeGifGray(w, h, gray)
        }
        MediaAsset(id, "image", payload, source)
      })
  }

  /** JPEG tolerance audit — the lossy half of q86: per doc, encode a
    * SMOOTH COLOR ramp (r = x·191/(w−1), g = y·63/(h−1), b = 96 —
    * JPEG-friendly content with a known closed form; the channels
    * differ, so an r/b swap or row shift is visible, which a gray
    * fixture would hide), decode through the JDK codec, and compare
    * the `dim`-bin RGBA histogram against the exact ramp histogram.
    * Dimensions span ≥ 2 DCT blocks each way (w = 24 + id mod 9,
    * h = 16 + id mod 5) and the default `dim` is COARSE (4 bins = 64
    * levels): per-level codec noise of a few ulps only moves mass at
    * bin boundaries, while a systematic decoder defect relocates
    * whole channels. `within` = total absolute bin deviation ≤
    * `bandPct`% of the RGBA byte count — the band an oracle can
    * assert without being able to decode JPEG itself. */
  def jpegBandAgreement(docs: DataFrame, dim: Int,
      bandPct: Int): DataFrame = {
    import docs.sparkSession.implicits._
    require(dim > 0 && dim <= 256, "dim must be in 1..256")
    spreadById(docs.select(col("doc_id"))).as[Long].mapPartitions(_.map { id =>
      val w = 24 + (id % 9).toInt
      val h = 16 + (id % 5).toInt
      val rgb = new Array[Byte](w * h * 3)
      val want = new Array[Long](dim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = x * 191 / (w - 1)
          val g = y * 63 / (h - 1)
          val o = (y * w + x) * 3
          rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = 96.toByte
          want(r * dim / 256) += 1L
          want(g * dim / 256) += 1L
          want(96 * dim / 256) += 1L
          x += 1
        }
        y += 1
      }
      want(255 * dim / 256) += w.toLong * h // alpha
      val got = new Array[Long](dim)
      decodeToRgba(encodeJpeg(w, h, rgb)).foreach { px =>
        var i = 0
        while (i < px.length) { got((px(i) & 0xff) * dim / 256) += 1L; i += 1 }
      }
      var dev = 0L
      var b = 0
      while (b < dim) { dev += math.abs(got(b) - want(b)); b += 1 }
      (id, dev * 100L <= bandPct.toLong * (4L * w * h))
    }).toDF("doc_id", "within")
  }

  /** Per-asset decoded-RGBA histogram over `dim` contiguous value
    * bins, exploded to (asset_id, bin, cnt) rows — the integer face of
    * [[featureExtractDecoded]] (pre-normalization), so a SQL oracle
    * can recompute it exactly. Undecodable payloads emit a single
    * (asset_id, −1, −1) sentinel. */
  def decodedHistogram(assets: Dataset[MediaAsset], dim: Int): DataFrame = {
    import assets.sparkSession.implicits._
    require(dim > 0 && dim <= 256, "dim must be in 1..256")
    assets.mapPartitions(_.flatMap { a =>
      decodeToRgba(a.payload) match {
        case Some(px) =>
          val h = new Array[Long](dim)
          var i = 0
          while (i < px.length) { h(((px(i) & 0xff) * dim) / 256) += 1L; i += 1 }
          (0 until dim).iterator.map(b => (a.asset_id, b, h(b)))
        case None => Iterator((a.asset_id, -1, -1L))
      }
    }).toDF("asset_id", "bin", "cnt")
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
