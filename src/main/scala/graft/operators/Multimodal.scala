package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, batch feature extraction with real Spark plumbing (schema,
  * partitioning, batch shape) and a STUBBED decoder.
  *
  * The container has no image/audio codecs, so [[fakeDecode]] stands in
  * for the real decoder behind the same signature — it is deterministic
  * (derived from the bytes) so the pipeline is testable end-to-end. The
  * Spark-side contract is what matters at 100 TB: binary payloads never
  * become join/group keys, feature extraction is mapPartitions in bounded
  * batches (the Scala analog of mapInPandas with a batch size), and
  * metadata travels in a typed struct column.
  */
object Multimodal {

  /** Typed row for the media table: payload + typed metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)

  /** Extracted feature row (what a real decoder+featurizer would emit).
    * The header fields come from the REAL byte parser; only `feature`
    * is the stub decoder's output.
    */
  case class MediaFeatures(media_id: Long, n_bytes: Int, mean_byte: Double,
      entropy_bucket: Int, detected_format: String, parsed_width: Int,
      parsed_height: Int, feature: Array[Float])

  /** A REAL media header for the declared format/dimensions — the byte
    * layouts [[MediaHeaders]] parses (PNG signature+IHDR, GIF89a logical
    * screen, JPEG SOI+SOF0). Width/height are encoded at the genuine
    * offsets in the genuine endianness, so parsing the payload is a real
    * decode of real header bytes, not a tautology.
    */
  private[graft] def mediaHeader(fmt: String, w: Int, h: Int): Array[Byte] =
    (fmt match {
      case "png" => Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
        0, 0, 0, 13, 'I', 'H', 'D', 'R',
        w >>> 24, (w >>> 16) & 0xFF, (w >>> 8) & 0xFF, w & 0xFF,
        h >>> 24, (h >>> 16) & 0xFF, (h >>> 8) & 0xFF, h & 0xFF)
      case "gif" => Array[Int]('G', 'I', 'F', '8', '9', 'a',
        w & 0xFF, (w >>> 8) & 0xFF, h & 0xFF, (h >>> 8) & 0xFF)
      case _ => Array[Int](0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x0B, 8,
        (h >>> 8) & 0xFF, h & 0xFF, (w >>> 8) & 0xFF, w & 0xFF)
    }).map(_.toByte)

  /** Builds the media table from documents: payload = a real media
    * header (declared format + dims at the correct offsets) followed by
    * the utf-8 text bytes standing in for pixel data. Deterministic, and
    * header-parseable by the same code a real corpus would use.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg").otherwise("gif").as("format"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"))
      .as[(Long, String, String, Int, Int)]
      .map { case (id, text, fmt, w, h) =>
        MediaRow(id, mediaHeader(fmt, w, h) ++ text.getBytes("UTF-8"),
          fmt, w, h)
      }
  }

  /** STUB decoder: the real implementation would decode the payload with
    * an image/audio codec (not available in this container). This fake is
    * deterministic in the bytes so tests and oracles are stable; the
    * signature (bytes → fixed-size float feature) is the real contract.
    */
  private[graft] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  private val FeatureDim = 8
  private val BatchSize = 64

  /** Batch feature extraction: mapPartitions over bounded batches (the
    * batch shape a vectorized decoder needs), never materializing a whole
    * partition. Header metadata (format/dims) comes from the REAL
    * byte-level parser ([[MediaHeaders]]); pixel features from the stub.
    * Output is a typed Dataset with a fixed-dim feature column.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // A real decoder would process `batch` as one vectorized call.
        batch.iterator.map { r =>
          val f = fakeDecode(r.payload, FeatureDim)
          val info = MediaHeaders.parse(r.payload)
          val n = r.payload.length
          // Long accumulator: an Int sum of unsigned bytes overflows past
          // ~8.4 MB (2^31 / 255) of payload.
          val mean =
            if (n == 0) 0.0
            else r.payload.foldLeft(0L)((acc, b) => acc + (b & 0xFF)).toDouble / n
          MediaFeatures(r.media_id, n, math.floor(mean * 1e6) / 1e6,
            (mean / 32).toInt, info.format, info.width, info.height, f)
        }
      }
    }
  }

  /** Header metadata over a binary media column — real parsing, no codec. */
  def parseHeaders(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val info = MediaHeaders.parse(r.payload)
      (r.media_id, info.format, info.width, info.height)
    }.toDF("media_id", "detected_format", "parsed_width", "parsed_height")
  }

  /** Oracle-checked metadata query: binary payload length + hex prefix —
    * the part of the multimodal path expressible in both engines.
    */
  private def meta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
      substring(hex(encode(col("text"), "UTF-8")), 1, 16).as("hex_prefix"))
      .orderBy("doc_id")

  /** Rows-only query exposing the full stubbed pipeline (media table →
    * batched feature extraction) through the driver contract.
    */
  private def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d))
      .select(col("media_id"), col("n_bytes"), col("mean_byte"),
        col("entropy_bucket"), col("detected_format"),
        col("parsed_width"), col("parsed_height"),
        r6(element_at(col("feature"), 1).cast("double")).as("f0"))
      .orderBy("media_id")
  }

  /** The oracle-checkable half of the feature pipeline split out: header
    * parse over the constructed payloads. The oracle recomputes the
    * EXPECTED format/dims from the generating formula over `documents` —
    * the Spark side must recover the same values by actually walking the
    * header bytes, so a parser regression (offset, endianness, marker
    * walk) breaks the hash match.
    */
  private def parse(s: SparkSession, d: String): DataFrame =
    parseHeaders(mediaTable(s, d)).orderBy("media_id")

  /** Frame sampling over an opaque binary payload: slice fixed 256-byte
    * "frames", keep every 2nd (the sample stride a video pipeline uses
    * to cut decode cost), fingerprint each kept frame. Pure byte
    * arithmetic — unlike the stub decoder this IS oracle-checkable, so
    * the frame-extraction plumbing (offsets, stride, per-frame schema)
    * is differentially verified; only pixel decode itself stays stubbed.
    */
  private val FrameBytes = 256
  private val FrameStride = 2
  private val MaxFrames = 4

  private def frames(s: SparkSession, d: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val frameIdx = explode(sequence(lit(0), lit(MaxFrames - 1))).as("frame_idx")
    Tables.documents(s, d)
      .select(col("doc_id"), payload.as("payload"), frameIdx)
      .withColumn("off", col("frame_idx") * FrameStride * FrameBytes)
      .filter(octet_length(col("payload")) > col("off"))
      .select(col("doc_id"), col("frame_idx"),
        substring(col("payload"), col("off") + 1, lit(FrameBytes))
          .as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).as("frame_bytes"),
        // Fingerprint the hex rendering: DuckDB's substring/md5 don't
        // take BLOBs, so the oracle slices hex text — Spark still does
        // the real binary slicing and only hashes via hex.
        md5(hex(col("frame"))).as("frame_hash"))
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, Query] = Map(
    "mm_meta" -> meta _,
    "mm_features" -> features _,
    "mm_parse" -> parse _,
    "mm_frames" -> frames _)

  /** mm_features exercises the stub decoder → rows-only check. */
  val oracle: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  substr(hex(encode(text)), 1, 16) AS hex_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_parse" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg'
        |       ELSE 'gif' END AS detected_format,
        |  CAST(n_chars % 64 + 1 AS INT) AS parsed_width,
        |  CAST(n_chars % 48 + 1 AS INT) AS parsed_height
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_frames" ->
      s"""WITH p AS (SELECT doc_id, hex(encode(text)) AS ph,
         |        octet_length(encode(text)) AS nb FROM documents),
         |f AS (SELECT doc_id, ph, nb, unnest(range(0, $MaxFrames))
         |        AS frame_idx FROM p),
         |o AS (SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
         |        substr(ph, CAST(frame_idx * ${2 * FrameStride * FrameBytes}
         |          + 1 AS INT), ${2 * FrameBytes}) AS fh
         |      FROM f
         |      WHERE nb > frame_idx * ${FrameStride * FrameBytes})
         |SELECT doc_id, frame_idx,
         |  CAST(len(fh) / 2 AS INT) AS frame_bytes,
         |  md5(fh) AS frame_hash
         |FROM o ORDER BY doc_id, frame_idx""".stripMargin)
}
