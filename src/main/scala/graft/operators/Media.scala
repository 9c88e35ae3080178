package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}

/** Multimodal columns (SURVEY §2.5 L12): image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct.
  *
  * The Spark-side plumbing is real — schema, per-partition batch
  * iteration, pruned scans — and any codec plugs in behind
  * [[MediaDecoder]]. This container ships no image/audio libraries, so
  * the default decoder is a DETERMINISTIC fake: metadata derived purely
  * from the payload bytes, reproducible on any engine (that is what makes
  * the `multimodal_meta` gate SQL-oracle-able). A deployment swaps in a
  * real codec without touching the pipeline.
  *
  * Partitioning note for 100 TB of media: payloads dominate row size, so
  * decode runs AFTER pruning/filtering (binary column stays columnar
  * parquet until the mapPartitions boundary), and the output carries only
  * the metadata — never re-shuffles the payload.
  */
object Media {

  /** Decoded media metadata (the typed struct). */
  final case class DecodedMedia(width: Int, height: Int, format: String, nBytes: Long)

  /** Codec boundary: bytes in, metadata out. Implementations must be
    * Serializable (they ship to executors) and deterministic. */
  trait MediaDecoder extends Serializable {
    def decode(content: Array[Byte]): DecodedMedia
  }

  /** Deterministic fake codec — pseudo-metadata from byte length alone,
    * arithmetic chosen to be expressible in ANSI SQL for the oracle.
    * Long arithmetic throughout so multi-GB payloads don't overflow. */
  object FakeDecoder extends MediaDecoder {
    def decode(content: Array[Byte]): DecodedMedia = {
      val n = content.length.toLong
      val width = (16L + n % 640L).toInt
      val height = (16L + (n * 7L) % 480L).toInt
      val format = (n % 3L) match {
        case 0L => "png"
        case 1L => "jpeg"
        case _  => "webp"
      }
      DecodedMedia(width, height, format, n)
    }
  }

  /** Real image-container header parser — PNG IHDR, JPEG SOFn frame
    * header, GIF logical screen descriptor, WEBP (RIFF container with
    * VP8 lossy / VP8L lossless / VP8X extended chunks) and BMP
    * (BITMAPINFOHEADER and the legacy BITMAPCOREHEADER). Pure
    * public-format byte parsing (PNG spec §11.2.2, JPEG/JFIF marker
    * segments, GIF89a spec, the WebP container + VP8/VP8L bitstream
    * specs, Windows BMP header layout), no codec library, so it runs
    * in this dependency-free container and on any executor. Payloads
    * matching no signature decode as (0, 0, "unknown") rather than
    * throwing — a corrupt blob in 100 TB of crawl data must not kill
    * the job. Full pixel decode still belongs to a library-backed
    * [[MediaDecoder]] swapped in at deployment; dimension/format
    * metadata is what the pipeline filters and routes on. */
  object HeaderDecoder extends MediaDecoder {
    private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    private def le24(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
      b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
        b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

    private val PngSig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    def decode(c: Array[Byte]): DecodedMedia = {
      val n = c.length.toLong
      if (c.length >= 24 && c.startsWith(PngSig) &&
          c(12) == 'I' && c(13) == 'H' && c(14) == 'D' && c(15) == 'R') {
        // IHDR width/height are big-endian, capped at 2^31-1 by the PNG
        // spec — a negative parse is corrupt bytes, not a giant image
        val (w, h) = (be32(c, 16), be32(c, 20))
        if (w < 0 || h < 0) DecodedMedia(0, 0, "png", n)
        else DecodedMedia(w, h, "png", n)
      }
      else if (c.length >= 4 && (c(0) & 0xFF) == 0xFF && (c(1) & 0xFF) == 0xD8)
        jpegSof(c, n)
      else if (c.length >= 10 && c(0) == 'G' && c(1) == 'I' && c(2) == 'F' && c(3) == '8')
        DecodedMedia(le16(c, 6), le16(c, 8), "gif", n) // screen descriptor, little-endian
      else if (c.length >= 16 && fourcc(c, 0, "RIFF") && fourcc(c, 8, "WEBP"))
        webp(c, n)
      else if (c.length >= 2 && c(0) == 'B' && c(1) == 'M')
        bmp(c, n)
      else DecodedMedia(0, 0, "unknown", n)
    }

    /** WEBP: the RIFF payload's first chunk names the bitstream.
      * VP8 (lossy): 3-byte frame tag, 0x9D012A start code, then
      * 14-bit LE width/height. VP8L (lossless): 0x2F signature, then
      * width-1 / height-1 as two 14-bit fields of an LE32. VP8X
      * (extended): canvas width-1 / height-1 as 24-bit LE fields.
      * A RIFF/WEBP payload too short or mis-signed for its declared
      * chunk keeps format "webp" with (0, 0) — the container was
      * identified even when the bitstream is corrupt. */
    private def webp(c: Array[Byte], n: Long): DecodedMedia = {
      if (fourcc(c, 12, "VP8 ")) {
        if (c.length >= 30 && (c(23) & 0xFF) == 0x9D && (c(24) & 0xFF) == 0x01 && (c(25) & 0xFF) == 0x2A)
          DecodedMedia(le16(c, 26) & 0x3FFF, le16(c, 28) & 0x3FFF, "webp", n)
        else DecodedMedia(0, 0, "webp", n)
      } else if (fourcc(c, 12, "VP8L")) {
        if (c.length >= 25 && (c(20) & 0xFF) == 0x2F) {
          val bits = le32(c, 21)
          DecodedMedia((bits & 0x3FFF) + 1, ((bits >>> 14) & 0x3FFF) + 1, "webp", n)
        } else DecodedMedia(0, 0, "webp", n)
      } else if (fourcc(c, 12, "VP8X")) {
        if (c.length >= 30) DecodedMedia(le24(c, 24) + 1, le24(c, 27) + 1, "webp", n)
        else DecodedMedia(0, 0, "webp", n)
      } else DecodedMedia(0, 0, "webp", n)
    }

    /** BMP: DIB header size at offset 14 picks the layout.
      * BITMAPINFOHEADER (≥40): signed LE32 width/height at 18/22 — a
      * negative height is a legal top-down bitmap (report |h|), a
      * negative width is corrupt. BITMAPCOREHEADER (12): unsigned
      * LE16 width/height at 18/20. */
    private def bmp(c: Array[Byte], n: Long): DecodedMedia = {
      if (c.length >= 26 && le32(c, 14) >= 40) {
        val (w, h) = (le32(c, 18), le32(c, 22))
        if (w < 0 || h == Int.MinValue) DecodedMedia(0, 0, "bmp", n)
        else DecodedMedia(w, math.abs(h), "bmp", n)
      }
      else if (c.length >= 22 && le32(c, 14) == 12)
        DecodedMedia(le16(c, 18), le16(c, 20), "bmp", n)
      else DecodedMedia(0, 0, "bmp", n)
    }

    /** Walk the marker segments for the first SOFn frame header:
      * `FF Cx len(2) precision(1) height(2) width(2)`. */
    private def jpegSof(c: Array[Byte], n: Long): DecodedMedia = {
      var i = 2
      while (i + 3 < c.length) {
        if ((c(i) & 0xFF) != 0xFF) return DecodedMedia(0, 0, "jpeg", n) // corrupt stream
        var j = i
        while (j + 1 < c.length && (c(j + 1) & 0xFF) == 0xFF) j += 1 // skip fill bytes
        if (j + 1 >= c.length) return DecodedMedia(0, 0, "jpeg", n) // trailing fill run
        val m = c(j + 1) & 0xFF
        m match {
          case 0xD8 | 0x01 => i = j + 2                          // SOI / TEM: bare marker
          case x if x >= 0xD0 && x <= 0xD7 => i = j + 2          // RSTn: bare marker
          case 0xD9 | 0xDA => return DecodedMedia(0, 0, "jpeg", n) // EOI / SOS before any SOF
          case x if isSof(x) =>
            return if (j + 8 < c.length)
              DecodedMedia(be16(c, j + 7), be16(c, j + 5), "jpeg", n)
            else DecodedMedia(0, 0, "jpeg", n)
          case _ =>
            if (j + 3 >= c.length) return DecodedMedia(0, 0, "jpeg", n)
            i = j + 2 + be16(c, j + 2) // payload segment: skip by declared length
        }
      }
      DecodedMedia(0, 0, "jpeg", n)
    }

    private def isSof(m: Int): Boolean =
      m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC // not DHT/JPG/DAC
  }

  /** Deterministic, VALID container bytes for gating [[HeaderDecoder]]
    * without shipping binary fixtures: a minimal-but-well-formed PNG
    * (signature + complete IHDR chunk), JPEG (SOI + SOF0 frame
    * header), GIF (GIF89a logical screen descriptor), WEBP
    * (RIFF + VP8L lossless bitstream header) or BMP
    * (BITMAPINFOHEADER), chosen by `id % 5`, whose dimensions are
    * pure arithmetic in `id` — so a SQL oracle can state the expected
    * metadata without parsing a byte. Sizes are fixed per format
    * (png 33 B, jpeg 12 B, gif 13 B, webp 25 B, bmp 54 B). Total over
    * ALL Long ids — floorMod keeps dims positive and the format
    * selector in range for negative ids (a plain % would emit
    * negative dimensions). */
  def syntheticContainer(id: Long): Array[Byte] = {
    val w = (16L + java.lang.Math.floorMod(id, 600L)).toInt
    val h = (16L + java.lang.Math.floorMod(id * 3L, 400L)).toInt
    java.lang.Math.floorMod(id, 5L) match {
      case 0L =>
        // sig(8) + len=13(4) + "IHDR"(4) + w(4) + h(4) + bitdepth/color/
        // compression/filter/interlace(5) + crc placeholder(4) = 33
        val b = java.nio.ByteBuffer.allocate(33)
        b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
        b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
        b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        b.putInt(0)
        b.array()
      case 1L =>
        // SOI(2) + SOF0 marker(2) + len=8(2) + precision(1) + h(2) +
        // w(2) + nComponents=0(1) = 12
        val b = java.nio.ByteBuffer.allocate(12)
        b.put(Array(0xFF, 0xD8, 0xFF, 0xC0).map(_.toByte))
        b.putShort(8.toShort).put(8.toByte)
        b.putShort(h.toShort).putShort(w.toShort).put(0.toByte)
        b.array()
      case 2L =>
        // "GIF89a"(6) + w,h little-endian(4) + flags/bg/aspect(3) = 13
        val b = new Array[Byte](13)
        "GIF89a".getBytes("US-ASCII").copyToArray(b)
        b(6) = (w & 0xFF).toByte; b(7) = ((w >> 8) & 0xFF).toByte
        b(8) = (h & 0xFF).toByte; b(9) = ((h >> 8) & 0xFF).toByte
        b
      case 3L =>
        // RIFF(4) + fileSize(4) + WEBP(4) + VP8L(4) + chunkLen=5(4) +
        // 0x2F signature(1) + (w-1 | (h-1)<<14) LE32(4) = 25. Dims fit
        // the 14-bit VP8L fields (w ≤ 615, h ≤ 415).
        val b = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes("US-ASCII")).putInt(17)
        b.put("WEBP".getBytes("US-ASCII")).put("VP8L".getBytes("US-ASCII")).putInt(5)
        b.put(0x2F.toByte).putInt((w - 1) | ((h - 1) << 14))
        b.array()
      case _ =>
        // "BM"(2) + fileSize(4) + reserved(4) + dataOffset(4) +
        // BITMAPINFOHEADER: size=40(4) + w(4) + h(4) + planes=1(2) +
        // bpp=24(2) + 24 zero bytes = 54
        val b = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
        b.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
        b.array()
    }
  }

  final case class MediaRow(media_id: Long, content: Array[Byte])
  final case class MediaMetaRow(media_id: Long, width: Int, height: Int, format: String, n_bytes: Long)

  /** Decode a binary media column to its metadata frame
    * `(media_id, width, height, format, n_bytes)`. Runs the decoder via
    * `mapPartitions` — one decoder instance per partition iterator, the
    * batch shape a real codec needs (amortized init, sequential byte
    * access), not a per-row UDF. */
  def decodeMeta(df: DataFrame, id: Column, content: Column, decoder: MediaDecoder = FakeDecoder): DataFrame =
    df.select(id.cast("long").as("media_id"), content.cast("binary").as("content"))
      .as[MediaRow](Encoders.product[MediaRow])
      .mapPartitions { it =>
        it.map { r =>
          val d = decoder.decode(r.content)
          MediaMetaRow(r.media_id, d.width, d.height, d.format, d.nBytes)
        }
      }(Encoders.product[MediaMetaRow])
      .toDF()
}
