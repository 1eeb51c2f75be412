package graft.operators

/** Pure-JVM FLAC codec — the lossless compressed-audio leg of the
  * media matrix (reference scope: opaque-binary asset columns; this
  * closes the "compressed audio" gap the MP3/AAC stubs leave, with a
  * format that IS losslessly decodable without a native codec).
  *
  * Implemented from the public FLAC format specification
  * (xiph.org/flac/format.html; RFC 9639) with JDK-only primitives:
  *
  *   - Decoder: STREAMINFO parse, frame sync walk, all four channel
  *     assignments (independent, left/side, right/side, mid/side),
  *     constant / verbatim / fixed order 0–4 / LPC subframes, Rice and
  *     Rice2 residuals at any partition order incl. the escape-to-raw
  *     code, wasted bits, CRC-8 header and CRC-16 frame verification.
  *     Hostile input never throws and never spins: every bit read is
  *     bounds-checked and a malformed stream decodes to None.
  *   - Encoder (test/synthesis face): 16-bit fixed-blocksize streams,
  *     mono / independent stereo / left-side stereo, per-frame best
  *     fixed predictor (order 0–2) with partition-order-0 Rice
  *     residuals, correct UTF-8 frame numbers, CRC-8/CRC-16, and the
  *     STREAMINFO sample MD5 — output is spec-conformant FLAC any
  *     reader accepts.
  *
  * Everything is driver/executor-local byte arithmetic: the Dataset
  * faces live in [[Multimodal]] (same mapPartitions shape as the
  * PNG/JPEG/WAV paths — payloads never leave the scan). */
object Flac {

  // ------------------------------------------------------------- tables

  /** CRC-8, poly x^8+x^2+x^1+x^0 (0x07), init 0 — the frame-header CRC. */
  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  /** CRC-16, poly x^16+x^15+x^2+x^0 (0x8005), init 0 — the frame CRC. */
  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table((c ^ p(i)) & 0xff); i += 1 }
    c
  }

  private def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc16Table(((c >> 8) ^ (p(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c & 0xffff
  }

  /** Fixed-predictor coefficients by order (prediction of s[i] from
    * prior samples) — the polynomial cascade from the spec. */
  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  // ---------------------------------------------------------- bit reader

  /** Bounds-checked MSB-first bit reader. Reads past the end raise
    * [[Malformed]], caught once at the decode boundary. */
  private final class BitReader(p: Array[Byte], var bytePos: Int) {
    var bitPos: Int = 0 // 0..7 within p(bytePos)

    def aligned: Boolean = bitPos == 0

    def readBit(): Int = {
      if (bytePos >= p.length) throw Malformed
      val b = (p(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }

    /** Up to 32 bits, unsigned, MSB first. */
    def readBits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }

    /** Up to 64 bits, unsigned. */
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }

    /** n-bit two's-complement signed value. */
    def readSigned(n: Int): Int = {
      val u = readBits(n)
      if (n == 0) 0
      else if (n == 32) u // readBits already yields the two's-complement value
      else if ((u & (1 << (n - 1))) != 0) (u.toLong - (1L << n)).toInt
      else u
    }

    /** Unary: count of 0 bits before the terminating 1. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (1 << 24)) throw Malformed // hostile all-zeros stream
      }
      q
    }

    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  private object Malformed extends RuntimeException with scala.util.control.NoStackTrace

  // ---------------------------------------------------------- bit writer

  private final class BitWriter {
    private var buf = new Array[Byte](1024)
    private var len = 0
    private var acc = 0L
    private var nAcc = 0

    private def ensure(n: Int): Unit =
      if (len + n > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))

    def writeBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1L)
        nAcc += 1
        if (nAcc == 8) { ensure(1); buf(len) = acc.toByte; len += 1; acc = 0L; nAcc = 0 }
        k -= 1
      }
    }

    def writeUnary(q: Int): Unit = { writeBits(0L, q); writeBits(1L, 1) }

    def alignToByte(): Unit = if (nAcc != 0) writeBits(0L, 8 - nAcc)

    def position: Int = { require(nAcc == 0); len }

    def byteAt(i: Int): Byte = buf(i)

    def patchByte(i: Int, b: Byte): Unit = buf(i) = b

    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  // ------------------------------------------------------------- decoder

  /** Decoded stream: sample rate, channel count, bits per sample, and
    * per-channel sample arrays (full precision ints). */
  final case class FlacAudio(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Array[Int]])

  /** STREAMINFO essentials: (rate, channels, bits, totalSamples). */
  private[graft] def flacStreamInfo(p: Array[Byte]): Option[(Int, Int, Int, Long)] =
    try {
      if (p.length < 42 || p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C')
        return None
      var off = 4
      var found: Option[(Int, Int, Int, Long)] = None
      var last = false
      while (!last && off + 4 <= p.length) {
        last = (p(off) & 0x80) != 0
        val btype = p(off) & 0x7f
        val blen = ((p(off + 1) & 0xff) << 16) | ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
        off += 4
        if (btype == 0 && blen >= 34 && off + 34 <= p.length) {
          val r = new BitReader(p, off + 10) // skip blocksizes + framesizes
          val rate = r.readBits(20)
          val ch = r.readBits(3) + 1
          val bits = r.readBits(5) + 1
          val total = r.readBitsLong(36)
          found = Some((rate, ch, bits, total))
        }
        off += blen
      }
      found
    } catch { case Malformed => None }

  /** Header-only probe for [[Multimodal.decodeOne]]'s dispatch. */
  private[graft] def flacHeader(p: Array[Byte]): Option[(Int, Int, Int, Long)] =
    flacStreamInfo(p)

  /** First byte offset past the metadata blocks (the frame region). */
  private def frameRegionStart(p: Array[Byte]): Int = {
    var off = 4
    var last = false
    while (!last) {
      if (off + 4 > p.length) throw Malformed
      last = (p(off) & 0x80) != 0
      val blen = ((p(off + 1) & 0xff) << 16) | ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
      off += 4 + blen
    }
    off
  }

  /** The extended-UTF-8 coded frame/sample number. */
  private def readCodedNumber(r: BitReader): Long = {
    val b0 = r.readBits(8)
    if ((b0 & 0x80) == 0) return b0.toLong
    var nCont = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { nCont += 1; mask >>= 1 }
    if (nCont < 1 || nCont > 6) throw Malformed
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nCont) {
      val c = r.readBits(8)
      if ((c & 0xc0) != 0x80) throw Malformed
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  /** One Rice-coded residual partition set into `out[warmup..bs)`. */
  private def readResidual(r: BitReader, bs: Int, order: Int,
      out: Array[Int]): Unit = {
    val method = r.readBits(2) // 0 = 4-bit Rice, 1 = 5-bit Rice2
    if (method > 1) throw Malformed
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val partOrder = r.readBits(4)
    val nParts = 1 << partOrder
    if (bs % nParts != 0) throw Malformed
    val partLen = bs >> partOrder
    if (partLen <= 0 || partLen - order < 0) throw Malformed
    var part = 0
    var idx = order
    while (part < nParts) {
      val n = if (part == 0) partLen - order else partLen
      if (n < 0) throw Malformed
      val param = r.readBits(pBits)
      if (param == escape) {
        val raw = r.readBits(5)
        var i = 0
        while (i < n) { out(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.readUnary()
          val u = (q.toLong << param) | r.readBits(param).toLong
          out(idx) = ((u >> 1) ^ -(u & 1L)).toInt
          idx += 1
          i += 1
        }
      }
      part += 1
    }
  }

  /** One subframe of `bs` samples at `bps` bits into a fresh array. */
  private def readSubframe(r: BitReader, bs: Int, bps: Int): Array[Int] = {
    if (r.readBit() != 0) throw Malformed // mandatory zero pad
    val stype = r.readBits(6)
    var wasted = 0
    if (r.readBit() == 1) { wasted = r.readUnary() + 1 }
    val effBps = bps - wasted
    if (effBps <= 0 || effBps > 32) throw Malformed
    val out = new Array[Int](bs)
    if (stype == 0) { // constant
      val v = r.readSigned(effBps)
      java.util.Arrays.fill(out, v)
    } else if (stype == 1) { // verbatim
      var i = 0
      while (i < bs) { out(i) = r.readSigned(effBps); i += 1 }
    } else if ((stype & 0x38) == 0x08 && (stype & 0x07) <= 4) { // fixed
      val order = stype & 0x07
      if (order > bs) throw Malformed
      var i = 0
      while (i < order) { out(i) = r.readSigned(effBps); i += 1 }
      readResidual(r, bs, order, out)
      val coefs = FixedCoefs(order)
      i = order
      while (i < bs) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = (pred + out(i)).toInt
        i += 1
      }
    } else if ((stype & 0x20) != 0) { // LPC
      val order = (stype & 0x1f) + 1
      if (order > bs) throw Malformed
      var i = 0
      while (i < order) { out(i) = r.readSigned(effBps); i += 1 }
      val precision = r.readBits(4) + 1
      if (precision > 15) throw Malformed
      val shift = r.readSigned(5)
      if (shift < 0) throw Malformed
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
      readResidual(r, bs, order, out)
      i = order
      while (i < bs) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = ((pred >> shift) + out(i)).toInt
        i += 1
      }
    } else throw Malformed
    if (wasted > 0) {
      var i = 0
      while (i < bs) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  private val BlockSizeTable = Array(-1, 192, 576, 1152, 2304, 4608, -2, -3,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val SampleRateTable = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -2, -3, -4, -5)

  /** Decode a whole FLAC stream. None on anything malformed (bad sync,
    * CRC mismatch, truncation, reserved codes) — never throws. */
  def decode(p: Array[Byte]): Option[FlacAudio] =
    try {
      val (siRate, siCh, siBits, siTotal) = flacStreamInfo(p).getOrElse(return None)
      if (siCh < 1 || siCh > 8 || siBits < 4 || siBits > 32) return None
      if (siTotal >= (1L << 31)) return None // bounded output contract
      // Bound the claimed total against the payload before any allocation: a
      // frame is >= ~10 bytes and covers <= 65535 samples (constant subframes
      // are the densest legal case), so samples can never exceed ~6554x the
      // byte length. Rejects tiny crafted payloads claiming huge totals, which
      // would otherwise allocate up to 8 GB per channel here.
      if (siTotal > p.length.toLong * 8192) return None
      val start = frameRegionStart(p)
      val nTotal = siTotal.toInt
      val chans = Array.fill(siCh)(new Array[Int](nTotal))
      var written = 0
      var off = start
      while (written < nTotal) {
        val r = new BitReader(p, off)
        val headerStart = r.bytePos
        if (r.readBits(14) != 0x3ffe) return None // lost sync
        if (r.readBit() != 0) return None
        r.readBit() // blocking strategy
        val bsCode = r.readBits(4)
        val srCode = r.readBits(4)
        val chCode = r.readBits(4)
        val ssCode = r.readBits(3)
        if (r.readBit() != 0) return None
        readCodedNumber(r)
        val bs = BlockSizeTable(bsCode) match {
          case -1 => return None
          case -2 => r.readBits(8) + 1
          case -3 => r.readBits(16) + 1
          case v => v
        }
        SampleRateTable(srCode) match {
          case -2 => r.readBits(8)
          case -3 => r.readBits(16)
          case -4 => r.readBits(16)
          case _ => ()
        }
        val bps = ssCode match {
          case 0 => siBits
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case _ => return None
        }
        val headerEnd = r.bytePos
        val crc8Read = r.readBits(8)
        if (crc8(p, headerStart, headerEnd) != crc8Read) return None
        val (nCh, mode) =
          if (chCode <= 7) (chCode + 1, 0) // independent
          else if (chCode == 8) (2, 1) // left/side
          else if (chCode == 9) (2, 2) // right/side
          else if (chCode == 10) (2, 3) // mid/side
          else return None
        if (nCh != siCh) return None
        if (written + bs > nTotal) return None
        val sub = new Array[Array[Int]](nCh)
        var c = 0
        while (c < nCh) {
          // side channels carry one extra bit
          val extra = mode match {
            case 1 if c == 1 => 1
            case 2 if c == 0 => 1
            case 3 if c == 1 => 1
            case _ => 0
          }
          sub(c) = readSubframe(r, bs, bps + extra)
          c += 1
        }
        r.alignToByte()
        val frameEnd = r.bytePos
        val crc16Read = r.readBits(16)
        if (crc16(p, headerStart, frameEnd) != crc16Read) return None
        // undo inter-channel decorrelation
        var i = 0
        mode match {
          case 0 =>
            c = 0
            while (c < nCh) {
              System.arraycopy(sub(c), 0, chans(c), written, bs); c += 1
            }
          case 1 => // left/side: right = left - side
            while (i < bs) {
              chans(0)(written + i) = sub(0)(i)
              chans(1)(written + i) = sub(0)(i) - sub(1)(i)
              i += 1
            }
          case 2 => // right/side: left = right + side
            while (i < bs) {
              chans(0)(written + i) = sub(1)(i) + sub(0)(i)
              chans(1)(written + i) = sub(1)(i)
              i += 1
            }
          case 3 => // mid/side
            while (i < bs) {
              val side = sub(1)(i)
              var mid = sub(0)(i) << 1
              mid |= side & 1
              chans(0)(written + i) = (mid + side) >> 1
              chans(1)(written + i) = (mid - side) >> 1
              i += 1
            }
        }
        written += bs
        off = frameEnd + 2
      }
      Some(FlacAudio(siRate, siCh, siBits, chans))
    } catch {
      case Malformed | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
    }

  // ------------------------------------------------------------- encoder

  /** Best fixed-predictor order (0–2) by total residual magnitude. */
  private def bestFixedOrder(s: Array[Int], from: Int, bs: Int): Int = {
    var best = 0
    var bestCost = Long.MaxValue
    var order = 0
    while (order <= 2) {
      if (order < bs) {
        val coefs = FixedCoefs(order)
        var cost = 0L
        var i = from + order
        while (i < from + bs) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += coefs(j).toLong * s(i - 1 - j); j += 1 }
          cost += math.abs(s(i) - pred)
          i += 1
        }
        if (cost < bestCost) { bestCost = cost; best = order }
      }
      order += 1
    }
    best
  }

  private def riceParamFor(sumAbs: Long, n: Int): Int = {
    if (n == 0) return 0
    val mean = sumAbs / math.max(1, n)
    var k = 0
    while (k < 14 && (1L << (k + 1)) < mean + 1) k += 1
    k
  }

  /** Write one subframe: best fixed predictor, partition-order-0 Rice. */
  private def writeSubframe(w: BitWriter, s: Array[Int], from: Int,
      bs: Int, bps: Int): Unit = {
    val order = bestFixedOrder(s, from, bs)
    w.writeBits(0L, 1)
    w.writeBits((0x08 | order).toLong, 6)
    w.writeBits(0L, 1) // no wasted bits
    val coefs = FixedCoefs(order)
    var i = 0
    while (i < order) { w.writeBits((s(from + i).toLong) & ((1L << bps) - 1), bps); i += 1 }
    // residuals (computed in Long, guaranteed to fit Int at order<=2/16-bit)
    val n = bs - order
    val res = new Array[Int](n)
    var sumAbs = 0L
    i = 0
    while (i < n) {
      val idx = from + order + i
      var pred = 0L
      var j = 0
      while (j < order) { pred += coefs(j).toLong * s(idx - 1 - j); j += 1 }
      res(i) = (s(idx) - pred).toInt
      sumAbs += math.abs(res(i).toLong)
      i += 1
    }
    w.writeBits(0L, 2) // Rice method 0
    w.writeBits(0L, 4) // partition order 0
    val k = riceParamFor(sumAbs, n)
    w.writeBits(k.toLong, 4)
    i = 0
    while (i < n) {
      val v = res(i)
      val u = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
      w.writeUnary((u >>> k).toInt)
      w.writeBits(u & ((1L << k) - 1), k)
      i += 1
    }
  }

  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) { w.writeBits(v, 8); return }
    // count payload bits -> continuation bytes
    var nCont = 1
    while (nCont < 6 && v >= (1L << (6 * nCont + (6 - nCont)))) nCont += 1
    val lead = (0xfe << (6 - nCont)) & 0xff
    w.writeBits((lead | (v >> (6 * nCont)).toInt).toLong, 8)
    var i = nCont - 1
    while (i >= 0) {
      w.writeBits((0x80 | ((v >> (6 * i)) & 0x3f)).toLong, 8)
      i -= 1
    }
  }

  /** Encode 16-bit channels (1 or 2, equal length) as a FLAC stream.
    * `leftSide = true` encodes stereo as left/side (exercises the
    * decorrelated decode path); mono ignores it. Fixed block size
    * 4096, frame-numbered, CRC'd, MD5-stamped. */
  def encode(rate: Int, channels: Array[Array[Int]],
      leftSide: Boolean = false): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 2)
    require(channels.forall(_.length == channels(0).length))
    val nCh = channels.length
    val total = channels(0).length
    val bs0 = 4096
    val bps = 16
    // MD5 of interleaved little-endian samples (the spec's audio MD5)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < total) {
      var c = 0
      while (c < nCh) {
        val v = channels(c)(i)
        md.update((v & 0xff).toByte); md.update(((v >> 8) & 0xff).toByte)
        c += 1
      }
      i += 1
    }
    val md5 = md.digest()
    val w = new BitWriter
    w.writeBits('f'.toLong, 8); w.writeBits('L'.toLong, 8)
    w.writeBits('a'.toLong, 8); w.writeBits('C'.toLong, 8)
    // STREAMINFO (last metadata block)
    w.writeBits(0x80L, 8) // last=1, type=0
    w.writeBits(34L, 24)
    w.writeBits(bs0.toLong, 16) // min block (libFLAC convention:
    w.writeBits(bs0.toLong, 16) // max block  the nominal size; the
    // last block may be smaller and is excluded per the spec)
    w.writeBits(0L, 24); w.writeBits(0L, 24) // frame sizes unknown
    w.writeBits(rate.toLong, 20)
    w.writeBits((nCh - 1).toLong, 3)
    w.writeBits((bps - 1).toLong, 5)
    w.writeBits(total.toLong, 36)
    var k = 0
    while (k < 16) { w.writeBits((md5(k) & 0xff).toLong, 8); k += 1 }
    // frames
    var frameNo = 0L
    var pos = 0
    while (pos < total) {
      val bs = math.min(bs0, total - pos)
      val headerStart = w.position
      w.writeBits(0x3ffeL, 14)
      w.writeBits(0L, 1) // reserved
      w.writeBits(0L, 1) // fixed blocking
      val bsCode = if (bs == bs0 && bs == 4096) 12
        else if (bs <= 256) 6
        else 7
      w.writeBits(bsCode.toLong, 4)
      w.writeBits(0L, 4) // sample rate: from STREAMINFO
      val chCode = if (nCh == 1) 0 else if (leftSide) 8 else 1
      w.writeBits(chCode.toLong, 4)
      w.writeBits(4L, 3) // 16-bit
      w.writeBits(0L, 1)
      writeCodedNumber(w, frameNo)
      if (bsCode == 6) w.writeBits((bs - 1).toLong, 8)
      else if (bsCode == 7) w.writeBits((bs - 1).toLong, 16)
      val headerEnd = w.position
      val hcrc = {
        val tmp = new Array[Byte](headerEnd - headerStart)
        var j = 0
        while (j < tmp.length) { tmp(j) = w.byteAt(headerStart + j); j += 1 }
        crc8(tmp, 0, tmp.length)
      }
      w.writeBits(hcrc.toLong, 8)
      if (nCh == 1) writeSubframe(w, channels(0), pos, bs, bps)
      else if (!leftSide) {
        writeSubframe(w, channels(0), pos, bs, bps)
        writeSubframe(w, channels(1), pos, bs, bps)
      } else {
        val side = new Array[Int](bs)
        var j = 0
        while (j < bs) { side(j) = channels(0)(pos + j) - channels(1)(pos + j); j += 1 }
        writeSubframe(w, channels(0), pos, bs, bps)
        writeSubframe(w, side, 0, bs, bps + 1)
      }
      w.alignToByte()
      val frameEnd = w.position
      val fcrc = {
        val tmp = new Array[Byte](frameEnd - headerStart)
        var j = 0
        while (j < tmp.length) { tmp(j) = w.byteAt(headerStart + j); j += 1 }
        crc16(tmp, 0, tmp.length)
      }
      w.writeBits(fcrc.toLong, 16)
      frameNo += 1
      pos += bs
    }
    w.toArray
  }
}
