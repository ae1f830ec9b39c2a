package graft.pipeline

/**
 * Real (non-stub) image codecs in pure Scala: Netpbm PPM — both the
 * binary `P6` and ASCII `P3` variants (Poskanzer's netpbm formats:
 * magic, whitespace-separated header tokens, `#` comments to end of
 * line, maxval, then samples) — and uncompressed 24-bit Windows BMP
 * (BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian, BGR byte
 * order, rows padded to 4 bytes, bottom-up unless biHeight < 0).
 *
 * These retire the `StubCodecs` caveat for images: `decode` really
 * parses payload bytes — header tokenization, comment skipping, row
 * padding, bottom-up flip, BGR→RGB — and the engine's image feature
 * path runs on the decoded pixels, not on a payload hash. The
 * decoded form is row-major top-left RGB, 8 bits per sample.
 *
 * Everything here is a pure function of the payload (no RNG, no
 * native handles), so any parallelism decodes identically — the same
 * determinism contract as the rest of the engine.
 */
object ImageCodecs {

  /** Row-major top-left RGB image, 3 bytes per pixel. */
  final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3)
  }

  // ------------------------------------------------------------ PPM

  /** Encode as binary PPM (`P6`, maxval 255). */
  def encodePpm(img: DecodedImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Encode as ASCII PPM (`P3`, maxval 255), 70-col-friendly lines. */
  def encodePpmAscii(img: DecodedImage): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("P3\n# graft synthetic\n").append(img.width).append(' ')
      .append(img.height).append("\n255\n")
    var i = 0
    while (i < img.rgb.length) {
      sb.append(img.rgb(i) & 0xff)
      sb.append(if ((i + 1) % 12 == 0) '\n' else ' ')
      i += 1
    }
    sb.append('\n')
    sb.toString.getBytes("US-ASCII")
  }

  // ------------------------------------------------------------ BMP

  /** Encode as uncompressed 24-bit bottom-up BMP (BGR, padded rows). */
  def encodeBmp(img: DecodedImage): Array[Byte] = {
    val rowBytes = img.width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * img.height
    val out = new Array[Byte](54 + dataSize)
    def p16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(off: Int, v: Int): Unit = { p16(off, v & 0xffff); p16(off + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    p32(2, out.length); p32(10, 54) // file size, pixel-data offset
    p32(14, 40) // BITMAPINFOHEADER size
    p32(18, img.width); p32(22, img.height) // positive height = bottom-up
    p16(26, 1); p16(28, 24) // planes, bpp
    p32(30, 0); p32(34, dataSize) // BI_RGB, image size
    var y = 0
    while (y < img.height) {
      // bottom-up: file row y holds logical row (height-1-y), BGR order
      val srcRow = (img.height - 1 - y) * rowBytes
      val dstRow = 54 + y * (rowBytes + pad)
      var x = 0
      while (x < img.width) {
        out(dstRow + x * 3) = img.rgb(srcRow + x * 3 + 2) // B
        out(dstRow + x * 3 + 1) = img.rgb(srcRow + x * 3 + 1) // G
        out(dstRow + x * 3 + 2) = img.rgb(srcRow + x * 3) // R
        x += 1
      }
      y += 1
    }
    out
  }

  // --------------------------------------------------------- decode

  /** Sniff the magic and decode; throws IllegalArgumentException on
    * unknown magic, truncation, or unsupported BMP variants. */
  def decode(payload: Array[Byte]): DecodedImage = {
    require(payload.length >= 2, "image payload too short")
    (payload(0).toChar, payload(1).toChar) match {
      case ('P', '6') => decodePpmBinary(payload)
      case ('P', '3') => decodePpmAscii(payload)
      case ('B', 'M') => decodeBmp(payload)
      case (a, b) => throw new IllegalArgumentException(
        s"unknown image magic '$a$b' (supported: P6, P3, BM)")
    }
  }

  /** Netpbm header tokenizer: whitespace-separated decimal tokens,
    * `#` starts a comment running to end of line. Returns the value
    * and the index just past the SINGLE whitespace byte that
    * terminates the token (the P6 contract: exactly one whitespace
    * after maxval, then raw samples). */
  private def readToken(b: Array[Byte], from: Int): (Int, Int) = {
    var i = from
    // skip whitespace and comments
    var skipping = true
    while (skipping) {
      while (i < b.length && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r'))
        i += 1
      if (i < b.length && b(i) == '#') {
        while (i < b.length && b(i) != '\n') i += 1
      } else skipping = false
    }
    require(i < b.length && b(i) >= '0' && b(i) <= '9',
      s"netpbm: expected decimal token at byte $i")
    var v = 0
    while (i < b.length && b(i) >= '0' && b(i) <= '9') {
      v = v * 10 + (b(i) - '0'); i += 1
    }
    (v, i)
  }

  /** Adversarial-header guard: dimensions must be positive and the
    * pixel count must fit the payload we actually hold — without this
    * a forged header could drive a negative/overflowed allocation
    * (raw NegativeArraySizeException instead of the typed error). */
  private def checkDims(w: Int, h: Int, available: Int, bytesPerPx: Int): Unit = {
    require(w > 0 && h > 0, s"image: non-positive dimensions $w x $h")
    require(w.toLong * h * 3 <= Int.MaxValue &&
      (bytesPerPx == 0 || w.toLong * h * bytesPerPx <= available.toLong),
      s"image: dimensions $w x $h exceed the payload")
  }

  private def decodePpmBinary(b: Array[Byte]): DecodedImage = {
    val (w, i1) = readToken(b, 2)
    val (h, i2) = readToken(b, i1)
    val (maxval, i3) = readToken(b, i2)
    checkDims(w, h, b.length, 3)
    require(maxval == 255, s"P6: only maxval 255 supported, got $maxval")
    require(i3 < b.length && (b(i3) == ' ' || b(i3) == '\t' || b(i3) == '\n' || b(i3) == '\r'),
      "P6: missing whitespace after maxval")
    val start = i3 + 1
    val need = w * h * 3
    require(b.length - start >= need,
      s"P6: truncated pixel data (need $need, have ${b.length - start})")
    val rgb = java.util.Arrays.copyOfRange(b, start, start + need)
    DecodedImage(w, h, rgb)
  }

  private def decodePpmAscii(b: Array[Byte]): DecodedImage = {
    val (w, i1) = readToken(b, 2)
    val (h, i2) = readToken(b, i1)
    val (maxval, i3) = readToken(b, i2)
    checkDims(w, h, b.length, 0) // ASCII samples: only the product bound applies
    require(maxval == 255, s"P3: only maxval 255 supported, got $maxval")
    val need = w * h * 3
    val rgb = new Array[Byte](need)
    var i = i3
    var n = 0
    while (n < need) {
      val (v, ni) = readToken(b, i)
      require(v <= 255, s"P3: sample $v exceeds maxval")
      rgb(n) = v.toByte; n += 1; i = ni
    }
    DecodedImage(w, h, rgb)
  }

  private def decodeBmp(b: Array[Byte]): DecodedImage = {
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def u32(off: Int): Int = u16(off) | (u16(off + 2) << 16)
    require(b.length >= 54, "BMP: truncated header")
    val dataOff = u32(10)
    val headerSize = u32(14)
    require(headerSize >= 40, s"BMP: need BITMAPINFOHEADER, got size $headerSize")
    val w = u32(18)
    val rawH = u32(22)
    val topDown = rawH < 0 // negative biHeight = top-down row order
    val h = if (topDown) -rawH else rawH
    require(u16(28) == 24, s"BMP: only 24bpp supported, got ${u16(28)}")
    require(u32(30) == 0, s"BMP: only BI_RGB (uncompressed) supported, got ${u32(30)}")
    checkDims(w, h, b.length, 3)
    val rowBytes = w * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    require(dataOff >= 54 && dataOff < b.length, s"BMP: bad data offset $dataOff")
    require(b.length.toLong - dataOff >= stride.toLong * h, "BMP: truncated pixel data")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * stride
      val dstRow = y * rowBytes
      var x = 0
      while (x < w) {
        rgb(dstRow + x * 3) = b(srcRow + x * 3 + 2) // R <- file B slot
        rgb(dstRow + x * 3 + 1) = b(srcRow + x * 3 + 1) // G
        rgb(dstRow + x * 3 + 2) = b(srcRow + x * 3) // B <- file R slot
        x += 1
      }
      y += 1
    }
    DecodedImage(w, h, rgb)
  }
}
