package graft.operators

import java.io.ByteArrayOutputStream

/** Codec-free MP4 (ISO base media file format, ISO/IEC 14496-12)
  * container walk — the video analog of [[MediaHeaders]]/[[WavCodec]]:
  * the container has no video codec libraries, but a video CORPUS
  * pipeline's metadata pass never decodes samples anyway — it walks the
  * box tree (`ftyp` brand, `moov/mvhd` timescale+duration,
  * `moov/trak` count) exactly as done here. Boxes are length-prefixed
  * big-endian structures; the walk must honor the declared sizes to
  * skip unknown/`free` boxes, which [[encode]] plants deliberately so
  * the skip path is load-bearing.
  *
  * Encoder: a complete, spec-layout file — `ftyp` (major brand, minor
  * version, two compatible brands) + `moov` wrapping an mvhd version-0
  * full box (timescale/duration at their genuine offsets), an optional
  * `free` filler box, and one `trak`/`tkhd` pair per track. Geometry
  * derives deterministically from the document row so the DuckDB
  * oracle can recompute every parsed field (and the total byte length)
  * from the generating formulas while the Spark side must recover them
  * by actually walking the bytes.
  */
object Mp4Walk {

  case class Mp4Info(brand: String, timescale: Long, duration: Long,
      nTracks: Int)

  // Deterministic per-document geometry — the SINGLE definition both
  // the encoder and the oracle SQL mirror (any drift fails the
  // differential gate).
  def brandOf(id: Long): String = if (id % 2 == 0) "isom" else "mp42"
  def timescaleOf(nChars: Long): Long = 600L * (nChars % 4 + 1)
  def durationOf(nChars: Long): Long = (nChars * 37) % 100000 + 1
  def tracksOf(id: Long): Int = (id % 3 + 1).toInt
  def hasFree(id: Long): Boolean = id % 5 == 0

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
    ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload

  /** A complete minimal MP4: ftyp + moov(mvhd [+free] + trak*tkhd…). */
  def encode(id: Long, nChars: Long): Array[Byte] = {
    val ftyp = box("ftyp", brandOf(id).getBytes("US-ASCII") ++
      be32(0x200) ++ "isom".getBytes("US-ASCII") ++
      "mp42".getBytes("US-ASCII"))
    // mvhd version 0: verflags, creation, modification, THEN
    // timescale and duration — the two fields the walk recovers —
    // then rate/volume/reserved/matrix/predefined/next_track_id
    // padding to the spec's 100-byte payload.
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescaleOf(nChars)) ++ be32(durationOf(nChars)) ++
      be32(0x00010000) ++ Array.fill[Byte](2)(0) /* volume+pad */ ++
      Array.fill[Byte](10)(0) ++ Array.fill[Byte](36)(0) ++
      Array.fill[Byte](24)(0) ++ be32(tracksOf(id) + 1L))
    val free = if (hasFree(id)) box("free", Array.fill[Byte](8)(0))
      else Array.emptyByteArray
    // tkhd version 0 is a spec-exact 84-byte payload: verflags,
    // creation, modification, track_ID, then the reserved/duration/
    // layer/matrix/width/height tail (68 bytes, zeroed).
    val traks = (1 to tracksOf(id)).map { t =>
      box("trak", box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++
        be32(t.toLong) ++ Array.fill[Byte](68)(0)))
    }
    val out = new ByteArrayOutputStream()
    out.write(ftyp)
    out.write(box("moov", mvhd ++ free ++ traks.flatten.toArray))
    out.toByteArray
  }

  /** The real walk: top-level boxes by declared size; `moov` children
    * likewise. Malformed sizes fail loudly (a truncated or lying box
    * length is data corruption, not a value).
    */
  def parse(bytes: Array[Byte]): Mp4Info = {
    require(bytes != null && bytes.length >= 8, "not an MP4: too short")
    def u(i: Int): Int = bytes(i) & 0xFF
    def rd32(i: Int): Long =
      ((u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3))
    def tpe(i: Int): String =
      new String(bytes, i + 4, 4, "US-ASCII")

    var brand = ""
    var timescale = -1L
    var duration = -1L
    var nTracks = 0

    def walkMoov(start: Int, end: Int): Unit = {
      var i = start
      while (i + 8 <= end) {
        val sz = rd32(i)
        require(sz >= 8 && i + sz <= end, s"bad moov child size $sz at $i")
        tpe(i) match {
          case "mvhd" =>
            val version = u(i + 8)
            require(version == 0, s"mvhd version $version unsupported")
            timescale = rd32(i + 20)
            duration = rd32(i + 24)
          case "trak" => nTracks += 1
          case _ => // free/skip: the declared size is the walk
        }
        i += sz.toInt
      }
    }

    var i = 0
    while (i + 8 <= bytes.length) {
      val sz = rd32(i)
      require(sz >= 8 && i + sz <= bytes.length, s"bad box size $sz at $i")
      tpe(i) match {
        case "ftyp" => brand = new String(bytes, i + 8, 4, "US-ASCII")
        case "moov" => walkMoov(i + 8, i + sz.toInt)
        case _ =>
      }
      i += sz.toInt
    }
    require(brand.nonEmpty && timescale > 0,
      "not an MP4: missing ftyp/mvhd")
    Mp4Info(brand, timescale, duration, nTracks)
  }
}
