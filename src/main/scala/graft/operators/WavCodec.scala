package graft.operators

/** Codec-free WAV (RIFF PCM) encode + decode — the audio counterpart
  * of [[BmpCodec]]: uncompressed PCM16 WAV is a fixed RIFF container
  * (RIFF/WAVE header, `fmt ` chunk, `data` chunk of raw little-endian
  * 16-bit samples), so REAL audio decode is a chunk walk plus sample
  * arithmetic — no codec library needed, and the decoded statistics
  * are recomputable by the DuckDB oracle from the generating formula.
  *
  * [[encode]] builds a spec-conformant file whose sample at frame `f`,
  * channel `c` is [[sampleValue]](docId, f, c); every fifth document
  * also gets a junk `LIST` chunk between `fmt ` and `data`, so the
  * decoder's chunk walk is load-bearing (a fixed-offset reader would
  * mis-parse those payloads and fail the differential check).
  * [[decode]] knows nothing about the formula: it validates the RIFF
  * magic and PCM16 format, walks chunks to `data`, and accumulates
  * per-channel sum/min/max/sum-of-squares over the interleaved frames.
  */
object WavCodec {

  /** Per-channel sample statistics of one decoded clip. */
  case class WavStats(channels: Int, sampleRate: Int, nFrames: Int,
      sums: Array[Long], mins: Array[Int], maxs: Array[Int],
      sumSqs: Array[Long])

  /** Deterministic sample formula: range ±1001, prime modulus so no
    * channel is constant. Nonnegative operands → both engines' `%`
    * agree.
    */
  def sampleValue(docId: Long, f: Int, c: Int): Int =
    (((docId * 31L + f * 7L + c * 11L) % 2003L) - 1001L).toInt

  /** True when the generator inserts a junk LIST chunk before `data`. */
  def hasJunkChunk(docId: Long): Boolean = docId % 5 == 0

  /** A complete, valid PCM16 WAV with formula samples. `forceJunk`
    * overrides the default junk-chunk decision — the perceptual-dedup
    * spec's "same audio, different container framing" twin: the byte
    * layout changes, the decoded samples do not.
    */
  def encode(docId: Long, channels: Int, sampleRate: Int,
      nFrames: Int, forceJunk: Option[Boolean] = None): Array[Byte] = {
    require(channels > 0 && nFrames > 0, "invalid WAV geometry")
    val junk = // "LIST" + size + 6 pad
      if (forceJunk.getOrElse(hasJunkChunk(docId))) 8 + 6 else 0
    val dataBytes = nFrames * channels * 2
    val riffSize = 4 + (8 + 16) + junk + (8 + dataBytes)
    val b = new Array[Byte](8 + riffSize)
    var i = 0
    def ascii(s: String): Unit = { s.foreach { ch => b(i) = ch.toByte; i += 1 } }
    def le32(v: Int): Unit = {
      b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >>> 8) & 0xFF).toByte
      b(i + 2) = ((v >>> 16) & 0xFF).toByte; b(i + 3) = ((v >>> 24) & 0xFF).toByte
      i += 4
    }
    def le16(v: Int): Unit = {
      b(i) = (v & 0xFF).toByte; b(i + 1) = ((v >>> 8) & 0xFF).toByte; i += 2
    }
    ascii("RIFF"); le32(riffSize); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1) // PCM
    le16(channels)
    le32(sampleRate)
    le32(sampleRate * channels * 2) // byte rate
    le16(channels * 2)              // block align
    le16(16)                        // bits per sample
    if (junk > 0) { ascii("LIST"); le32(6); ascii("junk__") }
    ascii("data"); le32(dataBytes)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        le16(sampleValue(docId, f, c) & 0xFFFF)
        c += 1
      }
      f += 1
    }
    b
  }

  /** Decode per-channel stats by walking RIFF chunks to `fmt `/`data`.
    * Fails loudly on anything unsupported (non-RIFF, non-PCM,
    * bits ≠ 16, truncation, missing chunks).
    */
  def decode(bytes: Array[Byte]): WavStats = {
    require(bytes != null && bytes.length >= 12, "truncated RIFF header")
    def u(p: Int): Int = bytes(p) & 0xFF
    def le32(p: Int): Int = u(p) | (u(p + 1) << 8) | (u(p + 2) << 16) | (u(p + 3) << 24)
    def le16(p: Int): Int = u(p) | (u(p + 1) << 8)
    def tag(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE payload")
    var p = 12
    var channels = -1
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (p + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
      val id = tag(p)
      val size = le32(p + 4)
      // Long arithmetic: a hostile size near Int.MaxValue would wrap
      // p + 8 + size negative and slip past the bound check, turning the
      // documented IllegalArgumentException into an AIOOBE in the walk.
      require(size >= 0 && p.toLong + 8 + size <= bytes.length,
        s"truncated '$id' chunk")
      if (id == "fmt ") {
        require(size >= 16, "short fmt chunk")
        require(le16(p + 8) == 1, "compressed WAV not supported (PCM only)")
        channels = le16(p + 10)
        sampleRate = le32(p + 12)
        require(le16(p + 22) == 16, s"unsupported bits ${le16(p + 22)}")
      } else if (id == "data") {
        dataOff = p + 8
        dataLen = size
      }
      // RIFF chunks are word-aligned: odd sizes carry one pad byte.
      p += 8 + size + (size & 1)
    }
    require(channels > 0 && sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val frameBytes = channels * 2
    require(dataLen % frameBytes == 0, "data chunk not frame-aligned")
    val nFrames = dataLen / frameBytes
    val sums = new Array[Long](channels)
    val mins = Array.fill(channels)(Int.MaxValue)
    val maxs = Array.fill(channels)(Int.MinValue)
    val sumSqs = new Array[Long](channels)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val v = le16(dataOff + f * frameBytes + c * 2).toShort.toInt
        sums(c) += v
        if (v < mins(c)) mins(c) = v
        if (v > maxs(c)) maxs(c) = v
        sumSqs(c) += v.toLong * v
        c += 1
      }
      f += 1
    }
    WavStats(channels, sampleRate, nFrames, sums, mins, maxs, sumSqs)
  }

  /** Channel-0 energy envelope: the squared-sample sums of `nWindows`
    * equal time windows (frame f lands in window f·nWindows/nFrames;
    * clips shorter than the window count leave the UNREACHED windows at
    * energy 0 — interleaved across the range, not trailing, since the
    * mapping spreads the few frames evenly) — the normalization step
    * audio fingerprinting starts from. Same RIFF chunk-walk and
    * validation contract as [[decode]].
    */
  def decodeEnergies(bytes: Array[Byte], nWindows: Int): Array[Long] = {
    require(nWindows > 0, s"invalid window count $nWindows")
    require(bytes != null && bytes.length >= 12, "truncated RIFF header")
    def u(p: Int): Int = bytes(p) & 0xFF
    def le32(p: Int): Int = u(p) | (u(p + 1) << 8) | (u(p + 2) << 16) | (u(p + 3) << 24)
    def le16(p: Int): Int = u(p) | (u(p + 1) << 8)
    def tag(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE payload")
    var p = 12
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (p + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
      val id = tag(p)
      val size = le32(p + 4)
      require(size >= 0 && p.toLong + 8 + size <= bytes.length,
        s"truncated '$id' chunk")
      if (id == "fmt ") {
        require(size >= 16, "short fmt chunk")
        require(le16(p + 8) == 1, "compressed WAV not supported (PCM only)")
        channels = le16(p + 10)
        require(le16(p + 22) == 16, s"unsupported bits ${le16(p + 22)}")
      } else if (id == "data") {
        dataOff = p + 8
        dataLen = size
      }
      p += 8 + size + (size & 1)
    }
    require(channels > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val frameBytes = channels * 2
    require(dataLen % frameBytes == 0, "data chunk not frame-aligned")
    val nFrames = dataLen / frameBytes
    val out = new Array[Long](nWindows)
    var f = 0
    while (f < nFrames) {
      val v = le16(dataOff + f * frameBytes).toShort.toLong
      out(((f.toLong * nWindows) / nFrames).toInt) += v * v
      f += 1
    }
    out
  }
}
