package graft.multimodal

/** Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) codec — pure JVM, no
  * codec library. The container ships no image codecs, but nothing in
  * baseline JPEG needs one: Huffman tables come from the file's own DHT
  * segments, the DCT is 64 doubles, and the entropy stream is plain bit
  * twiddling. This completes the web-image trio next to the PNG and GIF
  * decoders in [[Multimodal]].
  *
  * Decoder: any baseline SOF0 stream — its own DQT/DHT tables, grayscale
  * or 3-component YCbCr, sampling factors 1-2 per axis (nearest-neighbor
  * upsample), DRI/RSTn restart markers. Progressive (SOF2), arithmetic
  * coding, 12-bit precision, and 16-bit DQT entries return None (the
  * caller falls back to the metadata stub rather than pretending).
  *
  * Encoder (test vectors + planted query payloads): 4:4:4 or grayscale,
  * quality-scaled Annex K quantization tables, Annex K Huffman tables,
  * no restarts. Deterministic: equal input yields equal bytes.
  *
  * Reference behavior (what to compute, not how): odpf/meteor has no
  * media path; this supports the multimodal-column mandate (decode /
  * feature-extract over opaque binary columns).
  */
object Jpeg {

  private final class JpegError(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new JpegError(msg)

  /** Zigzag index -> natural (row-major) index. */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K quantization tables, natural order
  private val stdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val stdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K Huffman table specs: (count of codes per length 1..16, values).
  // Both encoder and decoder derive canonical codes from these same arrays
  // (the encoder also writes them into DHT), so encode/decode consistency
  // does not depend on matching any external implementation.
  private val dcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcLumaVals = (0 to 11).toArray
  private val dcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcChromaVals = (0 to 11).toArray
  private val acLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val acChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // --------------------------------------------------------------- DCT
  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val alphaT: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Forward 2-D DCT-II on a natural-order 8x8 block (level-shifted). */
  private def fdct(f: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          val cu = cosT(u)(x)
          while (y < 8) { s += f(x * 8 + y) * cu * cosT(v)(y); y += 1 }
          x += 1
        }
        out(u * 8 + v) = 0.25 * alphaT(u) * alphaT(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 2-D DCT on a natural-order 8x8 coefficient block. */
  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          val cu = cosT(u)(x) * alphaT(u)
          while (v < 8) { s += alphaT(v) * coef(u * 8 + v) * cu * cosT(v)(y); v += 1 }
          u += 1
        }
        out(x * 8 + y) = 0.25 * s
        y += 1
      }
      x += 1
    }
    out
  }

  // ----------------------------------------------------------- Huffman
  /** Canonical code assignment shared by encode and decode: lengths
    * ascending, values in table order within a length.
    */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    // returns (code, len) per table position
    val out = new Array[(Int, Int)](vals.length)
    var code = 0; var k = 0; var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) { out(k) = (code, len); code += 1; k += 1; i += 1 }
      code <<= 1
      len += 1
    }
    out
  }

  /** Encoder-side symbol -> (code, len), indexed by symbol value. */
  private def encTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val codes = canonicalCodes(bits, vals)
    val table = new Array[(Int, Int)](256)
    var i = 0
    while (i < vals.length) { table(vals(i)) = codes(i); i += 1 }
    table
  }

  /** Decoder-side table: standard mincode/maxcode/valptr walk. */
  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        if (bits(len) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var len = 1
      while (len < 16 && (maxCode(len) < minCode(len) || code > maxCode(len))) {
        code = (code << 1) | br.bit()
        len += 1
      }
      if (code > maxCode(len)) fail("bad huffman code")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  // ------------------------------------------------------------ bit IO
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit =
      if (nbits > 0) { put(0xFF, 8 - nbits) } // pad with 1-bits (fills byte)
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length) fail("entropy stream truncated")
        var b = bytes(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) fail("truncated after 0xFF")
          val m = bytes(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed literal 0xFF
          else fail(f"marker 0xFF$m%02x inside entropy data") // scan overran
          b = 0xFF
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      if (pos + 1 >= bytes.length) fail("truncated at restart")
      if ((bytes(pos) & 0xFF) != 0xFF || (bytes(pos + 1) & 0xFF) != (0xD0 + n))
        fail("missing RST marker")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ----------------------------------------------------------- encoder
  /** Encode 8-bit pixels (row-major, `channels` = 1 gray or 3 RGB) as a
    * baseline JFIF JPEG. 4:4:4 — no subsampling; edge blocks replicate
    * their border pixels.
    */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
             quality: Int = 90): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels=$channels")
    require(pixels.length == width * height * channels, "pixel buffer size")
    require(width > 0 && height > 0)
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    def scaled(t: Array[Int]): Array[Int] = // zigzag-ordered, quality-scaled
      Array.tabulate(64) { i =>
        math.max(1, math.min(255, (t(zigzag(i)) * scale + 50) / 100))
      }
    val qLuma = scaled(stdLumaQ)
    val qChroma = scaled(stdChromaQ)

    // planar YCbCr (or gray) as doubles, level-shift deferred to the block
    val nPix = width * height
    val planes = if (channels == 1) {
      val y = new Array[Double](nPix)
      var i = 0
      while (i < nPix) { y(i) = (pixels(i) & 0xFF).toDouble; i += 1 }
      Array(y)
    } else {
      val y = new Array[Double](nPix)
      val cb = new Array[Double](nPix)
      val cr = new Array[Double](nPix)
      var i = 0
      while (i < nPix) {
        val r = pixels(i * 3) & 0xFF
        val g = pixels(i * 3 + 1) & 0xFF
        val b = pixels(i * 3 + 2) & 0xFF
        y(i) = 0.299 * r + 0.587 * g + 0.114 * b
        cb(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        i += 1
      }
      Array(y, cb, cr)
    }

    val out = new java.io.ByteArrayOutputStream(nPix / 2 + 1024)
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }

    marker(0xD8) // SOI
    marker(0xE0); u16(16) // APP0 JFIF
    out.write('J'); out.write('F'); out.write('I'); out.write('F'); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1) // no density units, 1:1
    out.write(0); out.write(0) // no thumbnail
    def dqt(id: Int, t: Array[Int]): Unit = {
      marker(0xDB); u16(67); out.write(id)
      var i = 0
      while (i < 64) { out.write(t(i)); i += 1 }
    }
    dqt(0, qLuma)
    if (channels == 3) dqt(1, qChroma)
    marker(0xC0); u16(8 + 3 * channels) // SOF0
    out.write(8); u16(height); u16(width); out.write(channels)
    var c = 0
    while (c < channels) {
      out.write(c + 1) // component id
      out.write(0x11)  // 1x1 sampling (4:4:4)
      out.write(if (c == 0) 0 else 1) // quant table
      c += 1
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); u16(19 + vals.length)
      out.write((cls << 4) | id)
      var i = 1
      while (i <= 16) { out.write(bits(i)); i += 1 }
      vals.foreach(out.write)
    }
    dht(0, 0, dcLumaBits, dcLumaVals)
    dht(1, 0, acLumaBits, acLumaVals)
    if (channels == 3) {
      dht(0, 1, dcChromaBits, dcChromaVals)
      dht(1, 1, acChromaBits, acChromaVals)
    }
    marker(0xDA); u16(6 + 2 * channels) // SOS
    out.write(channels)
    c = 0
    while (c < channels) {
      out.write(c + 1)
      out.write(if (c == 0) 0x00 else 0x11) // dc/ac table ids
      c += 1
    }
    out.write(0); out.write(63); out.write(0) // spectral selection (full)

    val dcTables = Array(encTable(dcLumaBits, dcLumaVals),
      encTable(dcChromaBits, dcChromaVals))
    val acTables = Array(encTable(acLumaBits, acLumaVals),
      encTable(acChromaBits, acChromaVals))
    val bw = new BitWriter(out)
    val preds = new Array[Int](channels)
    val block = new Array[Double](64)
    val quantized = new Array[Int](64)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        c = 0
        while (c < channels) {
          val plane = planes(c)
          // gather the 8x8 block with edge replication, level-shifted
          var bx = 0
          while (bx < 8) {
            val sy = math.min(height - 1, my * 8 + bx)
            var by = 0
            while (by < 8) {
              val sx = math.min(width - 1, mx * 8 + by)
              block(bx * 8 + by) = plane(sy * width + sx) - 128.0
              by += 1
            }
            bx += 1
          }
          val coef = fdct(block)
          val qt = if (c == 0) qLuma else qChroma
          // AC magnitudes clamp to 1023 (size category <= 10): at quality
          // ~100 every quant entry is 1 and a worst-case block (checkerboard)
          // reaches |coef| = 1024 -> size 11, absent from the Annex K AC
          // tables. DC needs no clamp: |coef0| <= 1024 so |diff| <= 2040,
          // category 11, which the DC tables cover.
          quantized(0) = math.round(coef(zigzag(0)) / qt(0)).toInt
          var i = 1
          while (i < 64) {
            val q = math.round(coef(zigzag(i)) / qt(i)).toInt
            quantized(i) = math.max(-1023, math.min(1023, q))
            i += 1
          }
          // DC
          val ti = if (c == 0) 0 else 1
          val diff = quantized(0) - preds(c)
          preds(c) = quantized(0)
          val sCat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
          val (dcCode, dcLen) = dcTables(ti)(sCat)
          bw.put(dcCode, dcLen)
          if (sCat > 0) {
            val bitsVal = if (diff < 0) diff + (1 << sCat) - 1 else diff
            bw.put(bitsVal & ((1 << sCat) - 1), sCat)
          }
          // AC
          var k = 1
          var run = 0
          while (k < 64) {
            val v = quantized(k)
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zl) = acTables(ti)(0xF0); bw.put(zc, zl); run -= 16
              }
              val size = 32 - Integer.numberOfLeadingZeros(math.abs(v))
              val (code, len) = acTables(ti)((run << 4) | size)
              bw.put(code, len)
              val bitsVal = if (v < 0) v + (1 << size) - 1 else v
              bw.put(bitsVal & ((1 << size) - 1), size)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acTables(ti)(0x00); bw.put(ec, el) } // EOB
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ----------------------------------------------------------- decoder
  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
  }

  /** Decode a baseline JPEG. Returns (width, height, channels, pixels)
    * with pixels row-major — 3-byte RGB for color, 1-byte gray for
    * grayscale. None on anything non-baseline or malformed.
    */
  def decode(bytes: Array[Byte], maxPixels: Int = 1 << 24): Option[(Int, Int, Int, Array[Byte])] = try {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8)
      return None
    var pos = 2
    def u16(o: Int): Int = ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
    val quant = new Array[Array[Int]](4) // zigzag order, per table id
    val dcHuff = new Array[HuffDec](4)
    val acHuff = new Array[HuffDec](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var scanStart = -1

    while (scanStart < 0) {
      if (pos + 4 > bytes.length) return None
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      val m = bytes(pos + 1) & 0xFF
      pos += 2
      m match {
        case 0xD8 => () // stray SOI
        case 0xD9 => return None // EOI before scan
        case 0x01 => () // TEM, no payload
        case _ if m >= 0xD0 && m <= 0xD7 => () // RST outside scan, no payload
        case _ =>
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (len < 2 || pos + len > bytes.length) return None
          val seg = pos + 2
          val segEnd = pos + len
          m match {
            case 0xDB => // DQT: possibly several tables in one segment
              var o = seg
              while (o < segEnd) {
                val pq = (bytes(o) & 0xFF) >> 4
                val tq = bytes(o) & 0x0F
                if (pq != 0) return None // 16-bit tables: not baseline-common
                if (o + 65 > segEnd) return None
                quant(tq) = Array.tabulate(64)(i => bytes(o + 1 + i) & 0xFF)
                o += 65
              }
            case 0xC4 => // DHT: possibly several tables
              var o = seg
              while (o < segEnd) {
                val cls = (bytes(o) & 0xFF) >> 4
                val id = bytes(o) & 0x0F
                if (cls > 1 || id > 3 || o + 17 > segEnd) return None
                val bits = new Array[Int](17)
                var total = 0
                var i = 1
                while (i <= 16) { bits(i) = bytes(o + i) & 0xFF; total += bits(i); i += 1 }
                if (o + 17 + total > segEnd) return None
                val vals = Array.tabulate(total)(j => bytes(o + 17 + j) & 0xFF)
                val dec = new HuffDec(bits, vals)
                if (cls == 0) dcHuff(id) = dec else acHuff(id) = dec
                o += 17 + total
              }
            case 0xC0 | 0xC1 => // SOF0 baseline (C1: extended sequential, same layout)
              if ((bytes(seg) & 0xFF) != 8) return None // 12-bit: no
              height = u16(seg + 1); width = u16(seg + 3)
              val nc = bytes(seg + 5) & 0xFF
              if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return None
              if (width.toLong * height > maxPixels) return None // bomb cap
              comps = Array.tabulate(nc) { i =>
                val o = seg + 6 + i * 3
                val id = bytes(o) & 0xFF
                val h = (bytes(o + 1) & 0xFF) >> 4
                val v = bytes(o + 1) & 0x0F
                if (h < 1 || h > 2 || v < 1 || v > 2) fail("sampling factor")
                Component(id, h, v, bytes(o + 2) & 0x0F)
              }
            case 0xC2 => return None // progressive: out of scope
            case cm if cm >= 0xC3 && cm <= 0xCF && cm != 0xC4 && cm != 0xC8 =>
              return None // other SOFs (arithmetic, lossless, ...)
            case 0xDD =>
              restartInterval = u16(seg)
            case 0xDA => // SOS
              if (comps == null) return None
              val ns = bytes(seg) & 0xFF
              if (ns != comps.length) return None // non-interleaved scans: no
              var i = 0
              while (i < ns) {
                val cid = bytes(seg + 1 + i * 2) & 0xFF
                val tbl = bytes(seg + 2 + i * 2) & 0xFF
                val comp = comps.find(_.id == cid).getOrElse(return None)
                comp.dcTable = tbl >> 4
                comp.acTable = tbl & 0x0F
                i += 1
              }
              scanStart = segEnd
            case _ => () // APPn, COM, and anything skippable
          }
          pos = segEnd
      }
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component MCU-aligned planes
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    comps.foreach { c =>
      if (quant(c.tq) == null) return None
    }

    val br = new BitReader(bytes, scanStart)
    val preds = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val nMcus = mcusX * mcusY
    var m = 0
    while (m < nMcus) {
      if (restartInterval > 0 && m > 0 && m % restartInterval == 0) {
        br.restart(((m / restartInterval) - 1) % 8)
        java.util.Arrays.fill(preds, 0)
      }
      val mx = m % mcusX
      val my = m / mcusX
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val dc = dcHuff(comp.dcTable)
        val ac = acHuff(comp.acTable)
        if (dc == null || ac == null) return None
        val qt = quant(comp.tq)
        var bv = 0
        while (bv < comp.v) {
          var bh = 0
          while (bh < comp.h) {
            java.util.Arrays.fill(coef, 0.0)
            val sCat = dc.decode(br)
            if (sCat > 15) fail("dc category")
            val diff = extend(br.bits(sCat), sCat)
            preds(ci) += diff
            coef(0) = preds(ci).toDouble * qt(0)
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = ac.decode(br)
              val r = rs >> 4
              val size = rs & 0x0F
              if (size == 0) {
                if (r == 15) k += 16 // ZRL
                else done = true     // EOB
              } else {
                k += r
                if (k > 63) fail("ac overrun")
                coef(zigzag(k)) = extend(br.bits(size), size).toDouble * qt(k)
                k += 1
              }
            }
            val px = idct(coef)
            // place into the component plane
            val baseX = (mx * comp.h + bh) * 8
            val baseY = (my * comp.v + bv) * 8
            val pw = planeW(ci)
            var x = 0
            while (x < 8) {
              var y = 0
              val rowOff = (baseY + x) * pw + baseX
              while (y < 8) {
                val v = math.round(px(x * 8 + y) + 128.0).toInt
                planes(ci)(rowOff + y) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                y += 1
              }
              x += 1
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      m += 1
    }

    // color reconstruction with nearest-neighbor upsample per component
    if (comps.length == 1) {
      val outPix = new Array[Byte](width * height)
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, outPix, y * width, width)
        y += 1
      }
      Some((width, height, 1, outPix))
    } else {
      val outPix = new Array[Byte](width * height * 3)
      val yc = comps(0); val cbc = comps(1); val crc = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = planes(0)((y * yc.v / vmax) * planeW(0) + (x * yc.h / hmax)) & 0xFF
          val cb = (planes(1)((y * cbc.v / vmax) * planeW(1) + (x * cbc.h / hmax)) & 0xFF) - 128
          val cr = (planes(2)((y * crc.v / vmax) * planeW(2) + (x * crc.h / hmax)) & 0xFF) - 128
          var r = math.round(yv + 1.402 * cr).toInt
          var g = math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt
          var b = math.round(yv + 1.772 * cb).toInt
          if (r < 0) r = 0 else if (r > 255) r = 255
          if (g < 0) g = 0 else if (g > 255) g = 255
          if (b < 0) b = 0 else if (b > 255) b = 255
          val o = (y * width + x) * 3
          outPix(o) = r.toByte; outPix(o + 1) = g.toByte; outPix(o + 2) = b.toByte
          x += 1
        }
        y += 1
      }
      Some((width, height, 3, outPix))
    }
  } catch {
    case scala.util.control.NonFatal(_) => None
  }
}
