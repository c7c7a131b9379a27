package graft.operators

/** Codec-free BMP (Windows bitmap) encode + decode.
  *
  * Uncompressed 24-bit BMP is the one mainstream raster format that
  * needs no codec library: a fixed 54-byte header (BITMAPFILEHEADER +
  * BITMAPINFOHEADER) followed by raw BGR pixel rows, each row padded to
  * a 4-byte boundary, stored bottom-up. That makes REAL pixel decode
  * possible in this container — a plain byte walk, same standard-layout
  * approach as [[MediaHeaders]] — so the pixel half of the multimodal
  * pipeline is an actual decoder, not a stub, and its output is
  * recomputable by the DuckDB oracle from the generating formula.
  *
  * [[encode]] builds a spec-conformant BMP whose pixel at storage row
  * `s` (0 = bottom row, per the BMP bottom-up convention), column `c`,
  * channel `ch` (0=B 1=G 2=R, the BMP byte order) is
  * [[pixelValue]](docId, s, c, ch). [[decode]] knows nothing about the
  * formula: it validates the magic/bpp/compression fields, reads the
  * pixel-data offset and dimensions from the header, and walks the
  * padded rows — so a decoder bug (offset, row padding, channel order,
  * endianness) produces stats that fail the differential check.
  */
object BmpCodec {

  /** Per-channel pixel statistics of one decoded image (B, G, R order). */
  case class BmpStats(width: Int, height: Int,
      sums: Array[Long], mins: Array[Int], maxs: Array[Int])

  val HeaderBytes = 54

  /** BMP rows are padded to 4-byte boundaries. */
  def rowSize(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** Deterministic pixel formula (mod a prime so no channel is constant
    * and min/max genuinely vary per image). Defined in STORAGE order —
    * the decoder never sees the formula, and sums/mins/maxs are
    * order-free, so bottom-up vs top-down reading cannot mask a bug.
    */
  def pixelValue(docId: Long, s: Int, c: Int, ch: Int): Int =
    ((docId + s * 7L + c * 13L + ch * 29L) % 251).toInt

  /** A complete, valid 24bpp uncompressed BMP with formula pixels.
    * `bright` adds a uniform brightness offset to every channel (the
    * perceptual-dedup spec's "same image, different exposure" twin —
    * pixelValue ≤ 250, so offsets ≤ 5 never clip and every GRADIENT is
    * preserved exactly).
    */
  def encode(docId: Long, w: Int, h: Int, bright: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, s"invalid BMP dims ${w}x$h")
    require(bright >= 0 && bright <= 5, s"brightness offset $bright clips")
    val rs = rowSize(w)
    val size = HeaderBytes + h * rs
    val b = new Array[Byte](size) // zero-init → row padding bytes are 0
    def le32(i: Int, v: Int): Unit = {
      b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >>> 8) & 0xFF).toByte
      b(i + 2) = ((v >>> 16) & 0xFF).toByte; b(i + 3) = ((v >>> 24) & 0xFF).toByte
    }
    def le16(i: Int, v: Int): Unit = {
      b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >>> 8) & 0xFF).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size)          // file size
    le32(10, HeaderBytes)  // pixel-data offset
    le32(14, 40)           // BITMAPINFOHEADER size
    le32(18, w); le32(22, h)
    le16(26, 1)            // color planes
    le16(28, 24)           // bits per pixel
    le32(30, 0)            // BI_RGB (uncompressed)
    le32(34, h * rs)       // raw image size
    var s = 0
    while (s < h) {
      val base = HeaderBytes + s * rs
      var c = 0
      while (c < w) {
        var ch = 0
        while (ch < 3) {
          b(base + c * 3 + ch) = (pixelValue(docId, s, c, ch) + bright).toByte
          ch += 1
        }
        c += 1
      }
      s += 1
    }
    b
  }

  /** Decode per-channel sum/min/max by walking the pixel rows at the
    * header-declared offset. Fails loudly on anything this decoder does
    * not handle (non-BMP magic, bpp ≠ 24, compression, top-down
    * negative-height images, truncated pixel data) — a curation
    * pipeline routes such rows to a dead-letter side output rather than
    * silently fabricating stats.
    */
  def decode(bytes: Array[Byte]): BmpStats = decodeStrided(bytes, 1)

  /** Nearest-neighbor downsample + stats in one pass: visit only the
    * pixels at (s, c) where both indices are multiples of `stride` —
    * exactly the pixels a stride-`stride` nearest-neighbor resize keeps
    * (out pixel (s', c') = src pixel (s'·stride, c'·stride)), so the
    * returned stats ARE the resized image's stats without materializing
    * it. Output dims are ceil(dim / stride). The resize a real media
    * pipeline runs before feature extraction, at 1/stride² the decode
    * cost.
    */
  def decodeStrided(bytes: Array[Byte], stride: Int): BmpStats = {
    require(bytes != null && bytes.length >= HeaderBytes, "truncated BMP header")
    def u(i: Int): Int = bytes(i) & 0xFF
    def le32(i: Int): Int = u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    require(u(0) == 'B' && u(1) == 'M', "not a BMP payload")
    val off = le32(10)
    val w = le32(18)
    val h = le32(22)
    require(w > 0 && h > 0, s"unsupported BMP geometry ${w}x$h")
    require(le16(28) == 24, s"unsupported bpp ${le16(28)} (24bpp only)")
    require(le32(30) == 0, "compressed BMP not supported")
    // Row size in Long: a hostile width > ~715M overflows w*3 in Int,
    // yielding a negative row size that trivially passes the truncation
    // require and then walks off the buffer (AIOOBE instead of the
    // documented IAE). The bound itself divides instead of multiplying:
    // h·rs64 with both dims near 2^31 overflows LONG too (~1.4e19) and
    // would wrap past the check the same way. If the division bound
    // holds, rs fits in Int because bytes.length does.
    val rs64 = ((w.toLong * 3 + 3) / 4) * 4
    require(off >= HeaderBytes && off <= bytes.length &&
      h.toLong <= (bytes.length.toLong - off) / rs64,
      "truncated BMP pixel data")
    val rs = rs64.toInt
    require(stride >= 1, s"invalid stride $stride")
    val sums = new Array[Long](3)
    val mins = Array.fill(3)(255)
    val maxs = Array.fill(3)(0)
    var s = 0
    while (s < h) {
      val base = off + s * rs
      var c = 0
      while (c < w) {
        var ch = 0
        while (ch < 3) {
          val v = u(base + c * 3 + ch)
          sums(ch) += v
          if (v < mins(ch)) mins(ch) = v
          if (v > maxs(ch)) maxs(ch) = v
          ch += 1
        }
        c += stride
      }
      s += stride
    }
    BmpStats((w + stride - 1) / stride, (h + stride - 1) / stride,
      sums, mins, maxs)
  }

  /** Nearest-neighbor resample to a fixed gw × gh GRAYSCALE grid — the
    * normalization step perceptual hashing starts from: grid cell
    * (gr, gc) reads source pixel (gr·h/gh, gc·w/gw) (floor; images
    * smaller than the grid repeat pixels, exactly like an upsample) and
    * grays it as (B+G+R)/3 integer division. Returns row-major
    * gh × gw values. Same validation contract as [[decodeStrided]]:
    * succeeds or raises IllegalArgumentException, never walks off the
    * buffer.
    */
  def decodeGray(bytes: Array[Byte], gw: Int, gh: Int): Array[Int] = {
    require(bytes != null && bytes.length >= HeaderBytes, "truncated BMP header")
    def u(i: Int): Int = bytes(i) & 0xFF
    def le32(i: Int): Int = u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    require(u(0) == 'B' && u(1) == 'M', "not a BMP payload")
    val off = le32(10)
    val w = le32(18)
    val h = le32(22)
    require(w > 0 && h > 0, s"unsupported BMP geometry ${w}x$h")
    require(le16(28) == 24, s"unsupported bpp ${le16(28)} (24bpp only)")
    require(le32(30) == 0, "compressed BMP not supported")
    val rs64 = ((w.toLong * 3 + 3) / 4) * 4
    // Division bound — h·rs64 overflows Long for hostile dims (see
    // decodeStrided).
    require(off >= HeaderBytes && off <= bytes.length &&
      h.toLong <= (bytes.length.toLong - off) / rs64,
      "truncated BMP pixel data")
    val rs = rs64.toInt
    require(gw > 0 && gh > 0, s"invalid grid ${gw}x$gh")
    val out = new Array[Int](gh * gw)
    var gr = 0
    while (gr < gh) {
      val s = ((gr.toLong * h) / gh).toInt
      val base = off + s * rs
      var gc = 0
      while (gc < gw) {
        val c = ((gc.toLong * w) / gw).toInt
        out(gr * gw + gc) =
          (u(base + c * 3) + u(base + c * 3 + 1) + u(base + c * 3 + 2)) / 3
        gc += 1
      }
      gr += 1
    }
    out
  }
}
