package graft.operators

/** Codec-free media header parsing: format detection by magic bytes and
  * dimension extraction from fixed-offset header fields. This is the REAL
  * part of the multimodal decode path that needs no image library —
  * PNG IHDR and GIF logical-screen dimensions are plain big/little-endian
  * ints at fixed offsets; JPEG needs a marker walk to the SOF segment.
  * Full pixel decode is real for uncompressed BMP ([[BmpCodec]]); the
  * compressed formats would need codec libraries this container lacks.
  */
object MediaHeaders {

  case class MediaInfo(format: String, width: Int, height: Int)

  def parse(bytes: Array[Byte]): MediaInfo = {
    if (bytes == null || bytes.length < 4) return MediaInfo("unknown", -1, -1)
    def u(i: Int): Int = bytes(i) & 0xFF
    def be32(i: Int): Int = (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)

    if (bytes.length >= 24 &&
      u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G') {
      // PNG: 8-byte signature, IHDR length+type, then width/height BE32.
      MediaInfo("png", be32(16), be32(20))
    } else if (u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && bytes.length >= 10) {
      // GIF: logical screen descriptor at offset 6, LE16.
      MediaInfo("gif", le16(6), le16(8))
    } else if (u(0) == 0xFF && u(1) == 0xD8) {
      // JPEG: walk marker segments to the first SOF0-SOF3 frame header.
      // An SOF read touches bytes[i+5..i+8], so the walk may continue
      // while i+9 <= length — a minimal 11-byte SOI+SOF0 header (the
      // smallest payload mediaTable can construct, for an empty text)
      // parses; requiring one spare byte would mis-read it as (-1,-1).
      var i = 2
      while (i + 9 <= bytes.length) {
        if (u(i) != 0xFF) return MediaInfo("jpeg", -1, -1)
        // Markers may be preceded by any number of 0xFF fill bytes.
        while (i + 1 < bytes.length && u(i + 1) == 0xFF) i += 1
        if (i + 9 > bytes.length) return MediaInfo("jpeg", -1, -1)
        val marker = u(i + 1)
        if (marker >= 0xC0 && marker <= 0xC3) {
          return MediaInfo("jpeg", be16(i + 7), be16(i + 5))
        }
        // Standalone 2-byte markers: TEM (0x01), RST0-7/SOI/EOI (0xD0-D9).
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) i += 2
        else i += 2 + be16(i + 2)
      }
      MediaInfo("jpeg", -1, -1)
    } else if (bytes.length >= 12 && u(0) == 'R' && u(1) == 'I' &&
      u(2) == 'F' && u(3) == 'F' && u(8) == 'W' && u(9) == 'A') {
      MediaInfo("wav", -1, -1) // audio: no spatial dims
    } else if (bytes.length >= 26 && u(0) == 'B' && u(1) == 'M') {
      // BMP: BITMAPINFOHEADER width/height at offsets 18/22, LE32.
      def le32(i: Int): Int =
        u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
      MediaInfo("bmp", le32(18), le32(22))
    } else MediaInfo("unknown", -1, -1)
  }
}
