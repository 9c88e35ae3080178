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
  /** Endian/byte helpers shared by the header parsers. */
  private object B {
    def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    def be24(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xFF) << 16) | ((b(i + 1) & 0xFF) << 8) | (b(i + 2) & 0xFF)
    def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def le24(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16)
    def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
      b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
        b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte
  }

  object HeaderDecoder extends MediaDecoder {
    import B._

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

  /** Unified audio/video/image metadata — the routing record a mixed
    * crawl bucket needs: video/image rows carry (width, height), audio
    * rows carry (sampleRate, channels, bits); fields outside a payload's
    * modality are 0. */
  final case class DecodedAv(width: Int, height: Int, sampleRate: Int,
      channels: Int, bits: Int, format: String, nBytes: Long)

  /** Probe boundary for mixed-modality payloads: bytes in, unified
    * [[DecodedAv]] out. Serializable + deterministic, same contract as
    * [[MediaDecoder]]. */
  trait AvDecoder extends Serializable {
    def decodeAv(content: Array[Byte]): DecodedAv
  }

  /** Real audio/video container header parser, unifying with the image
    * formats of [[HeaderDecoder]]: WAV (RIFF/WAVE `fmt ` chunk walk),
    * FLAC (STREAMINFO block), MP3 (MPEG audio frame header, ID3v2 tag
    * skipped), OGG (first-page Vorbis identification header or
    * OpusHead), MP4/ISO-BMFF (`ftyp` brand dispatch: movie brands take
    * the `moov`→`trak`→`tkhd` walk for track dimensions, HEIF still
    * brands — avif/avis/heic/heix/mif1/msf1 — take the
    * `meta`→`iprp`→`ipco`→`ispe` item-property walk). Pure
    * public-format byte parsing (RIFF spec, FLAC format spec, MPEG-1/2
    * audio frame header layout, Ogg RFC 3533 + Vorbis I / RFC 7845 id
    * headers, ISO/IEC 14496-12 box structure + 23008-12 HEIF item
    * properties) — no codec library, so it runs in this dependency-free
    * container and on any executor. Anything else falls through to the
    * image parser; corrupt/truncated payloads keep their identified
    * container format with zeroed fields, unknown signatures decode as
    * "unknown" — a 100 TB crawl partition must never die on one blob. */
  object AvHeaderDecoder extends AvDecoder {
    import B._

    def decodeAv(c: Array[Byte]): DecodedAv = {
      val n = c.length.toLong
      if (c.length >= 12 && fourcc(c, 0, "RIFF") && fourcc(c, 8, "WAVE")) wav(c, n)
      else if (c.length >= 4 && fourcc(c, 0, "fLaC")) flac(c, n)
      else if (c.length >= 4 && fourcc(c, 0, "OggS")) ogg(c, n)
      else if (c.length >= 12 && fourcc(c, 4, "ftyp")) mp4(c, n)
      else if (c.length >= 3 && c(0) == 'I' && c(1) == 'D' && c(2) == '3') mp3Id3(c, n)
      // frame-sync mask 0xE0 cannot match JPEG's SOI second byte (0xD8),
      // so a bare MPEG frame never shadows the image branch below
      else if (c.length >= 4 && (c(0) & 0xFF) == 0xFF && (c(1) & 0xE0) == 0xE0)
        mp3Frame(c, 0, n)
      else { // not an AV container — delegate to the image header parser
        val d = HeaderDecoder.decode(c)
        DecodedAv(d.width, d.height, 0, 0, 0, d.format, n)
      }
    }

    /** RIFF chunk walk for `fmt `: channels LE16 @+10, sample rate LE32
      * @+12, bits/sample LE16 @+22 (PCM layout). Chunks pad to even. */
    private def wav(c: Array[Byte], n: Long): DecodedAv = {
      var i = 12
      while (i + 8 <= c.length) {
        val size = le32(c, i + 4)
        if (fourcc(c, i, "fmt ") && size >= 16 && i + 24 <= c.length)
          return DecodedAv(0, 0, le32(c, i + 12), le16(c, i + 10), le16(c, i + 22), "wav", n)
        if (size < 0 || size > c.length - i - 8) return DecodedAv(0, 0, 0, 0, 0, "wav", n)
        i += 8 + size + (size & 1)
      }
      DecodedAv(0, 0, 0, 0, 0, "wav", n)
    }

    /** FLAC: the mandatory first metadata block is STREAMINFO (type 0);
      * at its byte 10 (absolute 18): sample rate 20 bits, channels-1
      * 3 bits, bits-per-sample-1 5 bits, big-endian packed. */
    private def flac(c: Array[Byte], n: Long): DecodedAv = {
      if (c.length >= 22 && (c(4) & 0x7F) == 0 && be24(c, 5) >= 18) {
        val sr = ((c(18) & 0xFF) << 12) | ((c(19) & 0xFF) << 4) | ((c(20) & 0xFF) >>> 4)
        val ch = ((c(20) >> 1) & 0x7) + 1
        val bits = (((c(20) & 1) << 4) | ((c(21) & 0xFF) >>> 4)) + 1
        DecodedAv(0, 0, sr, ch, bits, "flac", n)
      } else DecodedAv(0, 0, 0, 0, 0, "flac", n)
    }

    /** OGG: page header is 27 bytes + segment table; the first packet of
      * the first page identifies the codec — `\x01vorbis` (channels u8
      * @+11, rate LE32 @+12) or `OpusHead` (channels u8 @+9, input rate
      * LE32 @+12). Other codecs keep format "ogg" with zeroed fields. */
    private def ogg(c: Array[Byte], n: Long): DecodedAv = {
      if (c.length < 27) return DecodedAv(0, 0, 0, 0, 0, "ogg", n)
      val p = 27 + (c(26) & 0xFF)
      if (p + 16 <= c.length && (c(p) & 0xFF) == 1 && c(p + 1) == 'v' && c(p + 2) == 'o' &&
          c(p + 3) == 'r' && c(p + 4) == 'b' && c(p + 5) == 'i' && c(p + 6) == 's')
        DecodedAv(0, 0, le32(c, p + 12), c(p + 11) & 0xFF, 0, "ogg", n)
      else if (p + 16 <= c.length && fourcc(c, p, "Opus") && fourcc(c, p + 4, "Head"))
        DecodedAv(0, 0, le32(c, p + 12), c(p + 9) & 0xFF, 0, "ogg", n)
      else DecodedAv(0, 0, 0, 0, 0, "ogg", n)
    }

    /** ID3v2 tag: synchsafe 28-bit size at bytes 6–9, frame follows. */
    private def mp3Id3(c: Array[Byte], n: Long): DecodedAv = {
      if (c.length < 10) return DecodedAv(0, 0, 0, 0, 0, "mp3", n)
      val size = ((c(6) & 0x7F) << 21) | ((c(7) & 0x7F) << 14) | ((c(8) & 0x7F) << 7) | (c(9) & 0x7F)
      val off = 10 + size
      if (off + 4 <= c.length && (c(off) & 0xFF) == 0xFF && (c(off + 1) & 0xE0) == 0xE0)
        mp3Frame(c, off, n)
      else DecodedAv(0, 0, 0, 0, 0, "mp3", n)
    }

    /** MPEG audio frame header: version bits pick the sample-rate table
      * (MPEG1 / MPEG2 = half / MPEG2.5 = quarter), 2-bit rate index,
      * channel mode 3 = mono. Reserved version/layer/rate-index values
      * are corrupt, not a frame. */
    private def mp3Frame(c: Array[Byte], off: Int, n: Long): DecodedAv = {
      val ver = (c(off + 1) >> 3) & 0x3
      val layer = (c(off + 1) >> 1) & 0x3
      val srIdx = (c(off + 2) >> 2) & 0x3
      if (ver == 1 || layer == 0 || srIdx == 3) return DecodedAv(0, 0, 0, 0, 0, "mp3", n)
      val base = srIdx match { case 0 => 44100; case 1 => 48000; case _ => 32000 }
      val sr = ver match { case 3 => base; case 2 => base / 2; case _ => base / 4 }
      val ch = if (((c(off + 3) >> 6) & 0x3) == 3) 1 else 2
      DecodedAv(0, 0, sr, ch, 0, "mp3", n)
    }

    /** Scan sibling boxes `[from, end)` for `name`; -1 if absent. Box =
      * BE32 size + fourcc; size < 8 (includes the 64-bit `largesize`
      * escape and size-0 "to end of file") stops the walk — corrupt or
      * beyond this parser's scope, degrade rather than guess. */
    private def findBox(c: Array[Byte], from: Int, end: Int, name: String): Int = {
      var i = from
      while (i + 8 <= end) {
        val size = be32(c, i)
        if (size < 8 || size > end - i) return -1
        if (fourcc(c, i + 4, name)) return i
        i += size
      }
      -1
    }

    /** ISO-BMFF: dispatch on the `ftyp` major brand first — AVIF/HEIF
      * still images are ISO-BMFF containers too, but carry their
      * dimensions in the item-property tree (`meta`→`iprp`→`ipco`→
      * `ispe`), not in a movie track; before round 12 they fell through
      * to the `moov` walk and blanked to ("mp4", 0×0), under-reporting
      * a top-tier crawl image format exactly the way WEBP did before
      * round 11. Movie brands keep the `moov`→`trak`→`tkhd` walk; tkhd
      * width/height are 16.16 fixed-point at +84 (version 0) / +96
      * (version 1). */
    private def mp4(c: Array[Byte], n: Long): DecodedAv = {
      val brand = new String(c, 8, 4, "US-ASCII") // caller guarantees length >= 12
      brand match {
        case "avif" | "avis" => ispeDims(c, n, "avif")
        // heic/heix = HEVC-coded HEIF; mif1/msf1 = the generic HEIF
        // structural brands, overwhelmingly HEIC in the wild — report
        // "heic" rather than inventing a fourth format name
        case "heic" | "heix" | "mif1" | "msf1" => ispeDims(c, n, "heic")
        case _ => mp4Moov(c, n)
      }
    }

    /** HEIF still images (ISO/IEC 23008-12): spatial extent lives in the
      * `ispe` item property — `meta` (a FullBox: children start past the
      * 4 version/flags bytes) → `iprp` → `ipco` → `ispe`, width/height
      * BE32 at +12/+16. The first `ispe` in `ipco` is read (the primary
      * item's extent in practice; per-item `ipma` association needs the
      * full item table, beyond a header probe's scope). Absent or
      * corrupt boxes degrade to zeroed dims with the format retained —
      * same never-throw contract as every other branch. */
    private def ispeDims(c: Array[Byte], n: Long, fmt: String): DecodedAv = {
      val none = DecodedAv(0, 0, 0, 0, 0, fmt, n)
      val meta = findBox(c, 0, c.length, "meta")
      if (meta < 0 || be32(c, meta) < 12) return none
      val iprp = findBox(c, meta + 12, meta + be32(c, meta), "iprp")
      if (iprp < 0) return none
      val ipco = findBox(c, iprp + 8, iprp + be32(c, iprp), "ipco")
      if (ipco < 0) return none
      val ispe = findBox(c, ipco + 8, ipco + be32(c, ipco), "ispe")
      if (ispe < 0 || be32(c, ispe) < 20) return none
      val (w, h) = (be32(c, ispe + 12), be32(c, ispe + 16))
      if (w < 0 || h < 0) none else DecodedAv(w, h, 0, 0, 0, fmt, n)
    }

    private def mp4Moov(c: Array[Byte], n: Long): DecodedAv = {
      val none = DecodedAv(0, 0, 0, 0, 0, "mp4", n)
      val moov = findBox(c, 0, c.length, "moov")
      if (moov < 0) return none
      val trak = findBox(c, moov + 8, moov + be32(c, moov), "trak")
      if (trak < 0) return none
      val tkhd = findBox(c, trak + 8, trak + be32(c, trak), "tkhd")
      if (tkhd < 0 || be32(c, tkhd) < 12) return none // need room for version+flags
      val v = c(tkhd + 8) & 0xFF
      val at = if (v == 1) tkhd + 96 else tkhd + 84
      if (v > 1 || at + 8 > tkhd + be32(c, tkhd)) none
      else DecodedAv(be32(c, at) >>> 16, be32(c, at + 4) >>> 16, 0, 0, 0, "mp4", n)
    }
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

  /** Deterministic, VALID audio/video container bytes for gating
    * [[AvHeaderDecoder]], the AV twin of [[syntheticContainer]]: a
    * minimal-but-well-formed WAV (RIFF/WAVE + complete `fmt ` chunk),
    * FLAC (magic + STREAMINFO), MP3 (one MPEG1 Layer III frame header),
    * OGG (one page wrapping a Vorbis identification header) or an
    * ISO-BMFF container, chosen by `id % 5`; the ISO-BMFF slot
    * sub-cycles by `floorDiv(id,5) % 3` over MP4 (`ftyp isom` +
    * `moov`/`trak`/`tkhd`), AVIF (`ftyp avif` + `meta`/`ispe`) and HEIC
    * (`ftyp mif1` + the same `ispe` tree). All metadata is pure
    * arithmetic in `id` — a SQL oracle states the expected fields
    * without parsing a byte. Sizes are fixed per format (wav 44 B,
    * flac 42 B, mp3 4 B, ogg 58 B, mp4 124 B, avif/heic 64 B). floorMod
    * keeps every field in its format's legal range over ALL Long ids.
    * MP3's sample rate comes from the header's 2-bit table index, so it
    * cycles {44100, 48000, 32000} rather than a continuous range. */
  def syntheticAvContainer(id: Long): Array[Byte] = {
    import java.lang.Math.floorMod
    val rate = (8000L + floorMod(id, 40000L)).toInt
    val ch2 = (1L + floorMod(id, 2L)).toInt   // 1–2 channels (wav/ogg)
    floorMod(id, 5L) match {
      case 0L =>
        // RIFF(4) size(4) WAVE(4) + "fmt "(4) len=16(4) + audioFormat=1
        // ch rate byteRate blockAlign bits(16) + "data"(4) len=0(4) = 44
        val bits = (8L * (1L + floorMod(id, 3L))).toInt // 8/16/24
        val block = ch2 * bits / 8
        val b = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes("US-ASCII")).putInt(36).put("WAVE".getBytes("US-ASCII"))
        b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        b.putShort(1.toShort).putShort(ch2.toShort).putInt(rate)
        b.putInt(rate * block).putShort(block.toShort).putShort(bits.toShort)
        b.put("data".getBytes("US-ASCII")).putInt(0)
        b.array()
      case 1L =>
        // fLaC(4) + block header type=0/len=34(4) + STREAMINFO(34) = 42;
        // rate 20 bits, ch-1 3 bits, bits-1 5 bits packed BE at bytes 10–13
        val ch = (1L + floorMod(id, 8L)).toInt // 3-bit field: 1–8
        val bits = 16
        val b = new Array[Byte](42)
        "fLaC".getBytes("US-ASCII").copyToArray(b)
        b(4) = 0; b(5) = 0; b(6) = 0; b(7) = 34
        b(18) = ((rate >> 12) & 0xFF).toByte
        b(19) = ((rate >> 4) & 0xFF).toByte
        b(20) = (((rate & 0xF) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)).toByte
        b(21) = (((bits - 1) & 0xF) << 4).toByte
        b
      case 2L =>
        // One MPEG1 Layer III header: sync, version=3 layer=1 noCRC,
        // bitrate index 9, 2-bit rate table index, channel mode 0/3
        val srIdx = floorMod(id, 3L).toInt // 44100 / 48000 / 32000
        val mode = if (floorMod(id, 2L) == 0L) 0 else 3 // stereo / mono
        Array(0xFF.toByte, 0xFB.toByte,
          (0x90 | (srIdx << 2)).toByte, (mode << 6).toByte)
      case 3L =>
        // OggS page: 27-byte header + 1-entry segment table + 30-byte
        // Vorbis identification packet = 58
        val b = java.nio.ByteBuffer.allocate(58).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(2.toByte) // version, BOS flag
        b.putLong(0L).putInt(1).putInt(0).putInt(0)                    // granule serial seq crc
        b.put(1.toByte).put(30.toByte)                                 // nsegs, segment length
        b.put(1.toByte).put("vorbis".getBytes("US-ASCII")).putInt(0)   // packet type, tag, version
        b.put(ch2.toByte).putInt(rate)
        b.putInt(0).putInt(0).putInt(0).put(0xB8.toByte).put(1.toByte) // bitrates, blocksizes, framing
        b.array()
      case _ =>
        // ISO-BMFF slot, sub-cycled by floorDiv(id,5) mod 3 over the
        // three brand families the parser must distinguish: a movie
        // (ftyp isom + moov/trak/tkhd, 124 B), an AVIF still (ftyp avif
        // + meta/iprp/ipco/ispe, 64 B), a HEIC still (ftyp mif1 — the
        // generic HEIF brand, mapped to "heic" — same ispe tree, 64 B).
        // Dimension arithmetic is identical across the three; only the
        // box that carries it moves.
        val w = (16L + floorMod(id, 600L)).toInt
        val h = (16L + floorMod(id * 3L, 400L)).toInt
        floorMod(java.lang.Math.floorDiv(id, 5L), 3L) match {
          case 0L =>
            // ftyp(16) + moov(8 + trak(8 + tkhd(92 v0))) = 124; tkhd
            // dims are 16.16 fixed-point
            val b = java.nio.ByteBuffer.allocate(124) // ISO-BMFF is big-endian
            b.putInt(16).put("ftyp".getBytes("US-ASCII"))
              .put("isom".getBytes("US-ASCII")).putInt(0)
            b.putInt(108).put("moov".getBytes("US-ASCII"))
            b.putInt(100).put("trak".getBytes("US-ASCII"))
            b.putInt(92).put("tkhd".getBytes("US-ASCII"))
            b.putInt(0)                       // version 0 + flags
            b.putInt(0).putInt(0).putInt(1)   // ctime mtime trackId
            b.putInt(0).putInt(0)             // reserved, duration
            b.position(b.position() + 16)     // reserved(8) layer alt volume reserved
            b.putInt(0x00010000).putInt(0).putInt(0) // unity matrix rows
            b.putInt(0).putInt(0x00010000).putInt(0)
            b.putInt(0).putInt(0).putInt(0x40000000)
            b.putInt(w << 16).putInt(h << 16)
            b.array()
          case sub =>
            heifContainer(if (sub == 1L) "avif" else "mif1", w, h)
        }
    }
  }

  /** Minimal well-formed HEIF still: ftyp(16) + meta FullBox(12 +
    * iprp(8 + ipco(8 + ispe(20)))) = 64 bytes, ispe width/height BE32. */
  private def heifContainer(brand: String, w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(64)
    b.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put(brand.getBytes("US-ASCII")).putInt(0)
    b.putInt(48).put("meta".getBytes("US-ASCII")).putInt(0) // version+flags
    b.putInt(36).put("iprp".getBytes("US-ASCII"))
    b.putInt(28).put("ipco".getBytes("US-ASCII"))
    b.putInt(20).put("ispe".getBytes("US-ASCII")).putInt(0).putInt(w).putInt(h)
    b.array()
  }

  final case class MediaRow(media_id: Long, content: Array[Byte])
  final case class MediaMetaRow(media_id: Long, width: Int, height: Int, format: String, n_bytes: Long)
  final case class AvMetaRow(media_id: Long, width: Int, height: Int,
      sample_rate: Int, channels: Int, bits: Int, format: String, n_bytes: Long)

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

  // ---------------------------------------------------------------- L48
  /** Pixel boundary for perceptual hashing: decode + downsample a
    * payload to the 32×32 grayscale pHash input. Like
    * [[MediaDecoder]], the REAL implementation belongs to an image
    * library absent from this environment — [[FakePixelDecoder]] is
    * the deterministic stand-in that keeps the Spark-side plumbing and
    * the hash math real and testable. Return None for undecodable
    * payloads (they drop out of hashing, like NULL keys). */
  trait PixelDecoder extends Serializable {
    /** 1024 grays (32×32 row-major) in [0, 255], or None. */
    def decodeGray32(content: Array[Byte]): Option[Array[Double]]
  }

  /** Deterministic fake pixel decode: tile the payload bytes over the
    * 32×32 grid (`p(i) = content(i mod len) & 0xFF`). Content-local by
    * construction — byte-identical payloads decode identically and
    * small byte edits perturb few pixels — so near-duplicate DETECTION
    * behaves like it would on real pixels while the codec stays
    * dependency-free. Empty/NULL payloads are undecodable. */
  object FakePixelDecoder extends PixelDecoder {
    def decodeGray32(content: Array[Byte]): Option[Array[Double]] =
      if (content == null || content.isEmpty) None
      else Some(Array.tabulate(1024)(i => (content(i % content.length) & 0xFF).toDouble))
  }

  /** REAL pixel decoder for the three formats a dependency-free JVM
    * can decode from the public specs alone: PNG (zlib `Inflater` +
    * the five §9 scanline filters — bit depth 8, color types 0/2/3/6
    * with PLTE lookup for palette images, sequential AND Adam7
    * interlaced per §8.2 — palette icons/logos/screenshots are a real
    * share of web images, the r18 capability gap #3), BMP (uncompressed
    * 24-bit BI_RGB, bottom-up or top-down), and baseline-sequential
    * JPEG (ITU T.81 via [[Jpeg]] — the dominant crawl format; its Y
    * channel IS the luma, so no color math;
    * progressive/arithmetic/12-bit out of subset → None). RGB
    * collapses to gray through the integer-weight BT.601
    * luma `(299·R + 587·G + 114·B) / 1000.0` — exact for R=G=B, no
    * float-coefficient drift — then a deterministic box average
    * downsamples to the 32×32 pHash input (ascending-index sums; when
    * source dims are exact multiples of 32 the average is exact, so a
    * block-replicated upscale hashes IDENTICALLY to its base image —
    * the law the multimodal_phash_real gate plants across formats and
    * scales). Everything else — sub-8/16-bit depth PNG, a palette
    * image without a usable PLTE or with an index past it,
    * compressed or non-24-bit BMP, truncated streams, dims outside
    * (0, 4096] — degrades to None (drops out of hashing), the
    * [[HeaderDecoder]] corrupt-tolerance discipline: a bad blob in
    * 100 TB of crawl bytes must not kill the job. IDAT CRCs are NOT
    * verified (the inflate itself detects truncation/garbage; CRC adds
    * a full extra pass per image for integrity the hash doesn't need). */
  object RealPixelDecoder extends PixelDecoder {
    import B._

    private val PngSig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    def decodeGray32(content: Array[Byte]): Option[Array[Double]] = {
      if (content == null || content.length < 2) None
      else if (content.length >= 33 && content.startsWith(PngSig)) pngGray(content)
      else if (content(0) == 'B' && content(1) == 'M') bmpGray(content)
      else if ((content(0) & 0xFF) == 0xFF && (content(1) & 0xFF) == 0xD8)
        Jpeg.decodeYGray(content) // baseline sequential; luma IS the gray
      else None
    }.map { case (px, w, h) => boxResize32(px, w, h) }

    private def luma(r: Int, g: Int, b: Int): Double =
      (299 * r + 587 * g + 114 * b) / 1000.0

    /** Deterministic 32×32 box downsample: output (r, c) averages the
      * source block [⌊r·h/32⌋, ⌊(r+1)·h/32⌋) × [⌊c·w/32⌋, ⌊(c+1)·w/32⌋)
      * (at least one pixel — upscaling small images point-samples). */
    private def boxResize32(px: Array[Double], w: Int, h: Int): Array[Double] = {
      val out = new Array[Double](1024)
      var r = 0
      while (r < 32) {
        val y0 = (r.toLong * h / 32).toInt
        val y1 = math.max(y0 + 1, ((r + 1).toLong * h / 32).toInt)
        var c = 0
        while (c < 32) {
          val x0 = (c.toLong * w / 32).toInt
          val x1 = math.max(x0 + 1, ((c + 1).toLong * w / 32).toInt)
          var s = 0.0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += px(y * w + x); x += 1 }
            y += 1
          }
          out(r * 32 + c) = s / ((y1 - y0) * (x1 - x0))
          c += 1
        }
        r += 1
      }
      out
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Adam7 pass grid (PNG §8.2): (x0, y0, dx, dy) per pass. */
    private val Adam7: Array[(Int, Int, Int, Int)] = Array(
      (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    private def pngGray(c: Array[Byte]): Option[(Array[Double], Int, Int)] = try {
      if (!(c(12) == 'I' && c(13) == 'H' && c(14) == 'D' && c(15) == 'R')) return None
      val w = be32(c, 16); val h = be32(c, 20)
      val depth = c(24) & 0xFF; val ctype = c(25) & 0xFF; val interlace = c(28) & 0xFF
      if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return None
      if (depth != 8 || interlace > 1) return None
      // ctype 3 = palette: one index channel, PLTE lookup below (tRNS
      // alpha is ignored like the RGBA alpha channel — luma only)
      val ch = ctype match { case 0 => 1; case 2 => 3; case 3 => 1; case 6 => 4; case _ => return None }
      // walk the chunk stream: concatenate IDAT payloads, capture PLTE
      val idat = new java.io.ByteArrayOutputStream()
      var plte: Array[Byte] = null
      var off = 8
      var sawEnd = false
      while (!sawEnd) {
        if (off + 12 > c.length) return None // truncated chunk header
        val len = be32(c, off)
        if (len < 0 || off + 12 + len > c.length) return None
        if (c(off + 4) == 'I' && c(off + 5) == 'D' && c(off + 6) == 'A' && c(off + 7) == 'T')
          idat.write(c, off + 8, len)
        else if (c(off + 4) == 'P' && c(off + 5) == 'L' && c(off + 6) == 'T' && c(off + 7) == 'E')
          plte = java.util.Arrays.copyOfRange(c, off + 8, off + 8 + len)
        if (c(off + 4) == 'I' && c(off + 5) == 'E' && c(off + 6) == 'N' && c(off + 7) == 'D')
          sawEnd = true
        off += 12 + len
      }
      if (idat.size == 0) return None
      if (ctype == 3 && (plte == null || plte.length == 0 || plte.length % 3 != 0))
        return None // palette image without a usable PLTE
      // pass layout: 7 independently-filtered sub-images when
      // interlaced (each with its own filter bytes and zeroed `prev`),
      // else one full-size pass — the same defilter walk serves both
      val passes = if (interlace == 1) Adam7 else Array((0, 0, 1, 1))
      val passDims = passes.map { case (x0, y0, dx, dy) =>
        (if (w > x0) (w - x0 + dx - 1) / dx else 0,
          if (h > y0) (h - y0 + dy - 1) / dy else 0)
      }
      val rawLen = passDims.map { case (wP, hP) =>
        if (wP > 0 && hP > 0) hP.toLong * (1L + wP.toLong * ch) else 0L
      }.sum
      if (rawLen <= 0 || rawLen > (4096L * 4096L * 4 + 4096 * 8)) return None
      val raw = new Array[Byte](rawLen.toInt)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(idat.toByteArray)
        var got = 0
        while (got < raw.length && !inf.finished()) {
          val k = inf.inflate(raw, got, raw.length - got)
          if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return None
          got += k
        }
        if (got < raw.length) return None
      } finally inf.end()
      // defilter scanlines (PNG §9: None/Sub/Up/Average/Paeth) and
      // collapse to luma in one pass, scattering interlaced pixels to
      // their (x0 + i·dx, y0 + row·dy) home
      val px = new Array[Double](w * h)
      var base = 0
      var p = 0
      while (p < passes.length) {
        val (x0, y0, dx, dy) = passes(p)
        val (wP, hP) = passDims(p)
        if (wP > 0 && hP > 0) {
          val stride = wP * ch
          val prev = new Array[Int](stride)
          val cur = new Array[Int](stride)
          var row = 0
          while (row < hP) {
            val ft = raw(base) & 0xFF
            if (ft > 4) return None
            var i = 0
            while (i < stride) {
              val x = raw(base + 1 + i) & 0xFF
              val a = if (i >= ch) cur(i - ch) else 0
              val b = prev(i)
              val d = if (i >= ch) prev(i - ch) else 0
              cur(i) = (ft match {
                case 0 => x
                case 1 => x + a
                case 2 => x + b
                case 3 => x + ((a + b) >> 1)
                case _ => x + paeth(a, b, d)
              }) & 0xFF
              i += 1
            }
            var xx = 0
            while (xx < wP) {
              val g =
                if (ctype == 3) {
                  val idx = cur(xx)
                  if (3 * idx + 2 >= plte.length) return None // index past PLTE
                  luma(plte(3 * idx) & 0xFF, plte(3 * idx + 1) & 0xFF,
                    plte(3 * idx + 2) & 0xFF)
                } else if (ch == 1) cur(xx).toDouble
                else luma(cur(xx * ch), cur(xx * ch + 1), cur(xx * ch + 2))
              px((y0 + row * dy) * w + (x0 + xx * dx)) = g
              xx += 1
            }
            System.arraycopy(cur, 0, prev, 0, stride)
            base += 1 + stride
            row += 1
          }
        }
        p += 1
      }
      Some((px, w, h))
    } catch { case scala.util.control.NonFatal(_) => None }

    private def bmpGray(c: Array[Byte]): Option[(Array[Double], Int, Int)] = try {
      if (c.length < 54 || le32(c, 14) < 40) return None
      val w = le32(c, 18); val hRaw = le32(c, 22)
      val bpp = le16(c, 28); val comp = le32(c, 30)
      if (bpp != 24 || comp != 0) return None
      if (hRaw == Int.MinValue) return None
      val h = math.abs(hRaw); val topDown = hRaw < 0
      if (w <= 0 || h <= 0 || w > 4096 || h > 4096) return None
      val dataOff = le32(c, 10)
      val rowBytes = ((w * 3 + 3) / 4) * 4
      if (dataOff < 54 || dataOff.toLong + rowBytes.toLong * h > c.length) return None
      val px = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        val base = dataOff + srcRow * rowBytes
        var x = 0
        while (x < w) {
          val b = c(base + x * 3) & 0xFF
          val g = c(base + x * 3 + 1) & 0xFF
          val r = c(base + x * 3 + 2) & 0xFF
          px(y * w + x) = luma(r, g, b)
          x += 1
        }
        y += 1
      }
      Some((px, w, h))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Well-formed image bytes whose PIXELS are arithmetic in `k` — the
    * [[syntheticContainer]] discipline extended below the header: an
    * 8×8 grid of 4×4-pixel blocks, block b bright (220) iff bit b of
    * the splitmix64 finalizer of `k` is set, else dark (35). Emitted
    * as a real zlib-deflated PNG (gray / RGB / RGBA with R=G=B, so
    * luma reproduces the gray exactly) or a real 24-bit BMP, at an
    * integer `scale` via block replication — the box resize averages
    * scale² IDENTICAL values, so every (format, scale) rendering of
    * the same `k` decodes to the SAME 32×32 grays and pHash-collides
    * at hamming 0. Different `k` give independent 64-bit block
    * patterns (far apart with overwhelming probability). */
  def syntheticPixelPattern(k: Long): Array[Int] = {
    var z = k + 0x9E3779B97F4A7C15L // splitmix64 finalizer
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val bits = z ^ (z >>> 31)
    Array.tabulate(1024) { i =>
      val blk = (i / 32 / 4) * 8 + (i % 32 / 4)
      if (((bits >>> blk) & 1L) == 1L) 220 else 35
    }
  }

  /** PNG writer for the synthetic gates/specs: filter-0 scanlines,
    * one deflated IDAT, valid CRCs. `colorType` 0 (gray), 2 (RGB),
    * 3 (palette — a 256-entry identity-gray PLTE, pixel = index, so
    * luma reproduces the gray exactly) or 6 (RGBA); RGB(A) channels
    * all carry the gray value. `adam7 = true` writes the interlaced
    * layout (§8.2: 7 independently-filtered sub-images). */
  def pngBytes(grays: Array[Int], w: Int, h: Int, colorType: Int,
      adam7: Boolean = false): Array[Byte] = {
    require(grays.length == w * h, s"pixel count ${grays.length} != $w x $h")
    val ch = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case 6 => 4
      case other => throw new IllegalArgumentException(s"unsupported colorType $other")
    }
    def emitRow(raw: Array[Byte], base: Int, y: Int, x0: Int, dx: Int, wP: Int): Unit = {
      raw(base) = 0 // filter: None
      var i = 0
      while (i < wP) {
        val g = grays(y * w + x0 + i * dx).toByte
        var j = 0
        while (j < math.min(ch, 3)) { raw(base + 1 + i * ch + j) = g; j += 1 }
        if (ch == 4) raw(base + 1 + i * ch + 3) = 0xFF.toByte
        i += 1
      }
    }
    val passes =
      if (adam7) Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      else Seq((0, 0, 1, 1))
    val dims = passes.map { case (x0, y0, dx, dy) =>
      (if (w > x0) (w - x0 + dx - 1) / dx else 0,
        if (h > y0) (h - y0 + dy - 1) / dy else 0)
    }
    val rawLen = dims.map { case (wP, hP) =>
      if (wP > 0 && hP > 0) hP * (1 + wP * ch) else 0
    }.sum
    val raw = new Array[Byte](rawLen)
    var base = 0
    passes.zip(dims).foreach { case ((x0, y0, dx, dy), (wP, hP)) =>
      if (wP > 0 && hP > 0) {
        var row = 0
        while (row < hP) {
          emitRow(raw, base, y0 + row * dy, x0, dx, wP)
          base += 1 + wP * ch
          row += 1
        }
      }
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(if (adam7) 1.toByte else 0.toByte).array()
    val plte =
      if (colorType == 3) chunk("PLTE", Array.tabulate(768)(i => (i / 3).toByte))
      else Array.emptyByteArray
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ plte ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** 24-bit uncompressed bottom-up BMP with R=G=B=gray. */
  def bmpBytes(grays: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(grays.length == w * h, s"pixel count ${grays.length} != $w x $h")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val b = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
    b.putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      val imgRow = h - 1 - y // bottom-up storage
      var x = 0
      while (x < w) {
        val g = grays(imgRow * w + x).toByte
        b.put(g).put(g).put(g)
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y += 1
    }
    b.array()
  }

  /** The per-doc payload of the multimodal_phash_real gate: ids 2k and
    * 2k+1 render the SAME `k` pattern through DIFFERENT (format,
    * colorType, scale) paths — even ids as PNG at scale 1+(k mod 2)
    * with colorType cycling gray/RGB/RGBA by k mod 3; odd ids by
    * k mod 6: 0 → BMP at scale 2; 1 → baseline JPEG grayscale at
    * scale 2; 2 → baseline JPEG YCbCr 4:2:0 (restart markers every 3
    * MCUs) at scale 2; 3 → PNG at scale 1 with the next colorType;
    * 4 → PROGRESSIVE JPEG grayscale (successive approximation: DC
    * first/refine + AC first/refine scans) at scale 2; 5 → PROGRESSIVE
    * JPEG YCbCr 4:2:0 (interleaved DC scan + per-component AC scans)
    * at scale 2 — so a hamming-0 pair certifies decode + defilter/
    * dequant + luma + resize end-to-end across codecs AND both JPEG
    * coding processes, not just byte equality.
    *
    * JPEG crosses its LOSSY boundary exactly because the pattern's
    * 4×4 cells land as flat 8×8 blocks at scale 2 (cell edges at
    * multiples of 8) and [[Jpeg]]'s fixture encoders use all-ones
    * quantization: a flat block's DCT is the lone integer DC, so
    * encode→decode reproduces the grays bit-for-bit — the verdict-
    * prescribed "patterns quantization preserves" (and, for the
    * progressive variants, the exactness survives the spectral/
    * approximation scan splits).
    *
    * Fixture-format v2 (r18): odd ids moved from a k mod 4 to a k mod
    * 6 residue cycle to admit the progressive variants, so bytes for
    * pre-existing ids changed (e.g. k=4 was BMP, is now progressive
    * JPEG). v3 (r19): EVEN ids' colorType cycle widened from k mod 3
    * to k mod 4 (gray/RGB/RGBA/PALETTE) and k mod 5 < 2 renderings
    * are Adam7-INTERLACED — palette and interlaced decode join the
    * cross-codec law, and bytes for pre-existing even ids changed
    * again. All in-repo oracles/specs are updated; anything EXTERNAL
    * that pinned v1/v2 fixture bytes must re-derive. */
  def syntheticPixelImage(id: Long): Array[Byte] = {
    val k = java.lang.Math.floorDiv(id, 2L)
    val base = syntheticPixelPattern(k)
    def scaled(s: Int): (Array[Int], Int, Int) =
      (Array.tabulate(32 * s * 32 * s) { i =>
        val y = i / (32 * s); val x = i % (32 * s)
        base((y / s) * 32 + x / s)
      }, 32 * s, 32 * s)
    val km2 = java.lang.Math.floorMod(k, 2L).toInt
    val ctypes = Array(0, 2, 6)
    if (java.lang.Math.floorMod(id, 2L) == 0L) {
      val (px, w, h) = scaled(1 + km2)
      val ctypes4 = Array(0, 2, 6, 3)
      pngBytes(px, w, h, ctypes4(java.lang.Math.floorMod(k, 4L).toInt),
        adam7 = java.lang.Math.floorMod(k, 5L) < 2L)
    } else java.lang.Math.floorMod(k, 6L).toInt match {
      case 0 =>
        val (px, w, h) = scaled(2)
        bmpBytes(px, w, h)
      case 1 =>
        val (px, w, h) = scaled(2)
        Jpeg.encodeGray(px, w, h)
      case 2 =>
        val (px, w, h) = scaled(2)
        Jpeg.encodeGray420(px, w, h, restartInterval = 3)
      case 3 =>
        val (px, w, h) = scaled(1)
        pngBytes(px, w, h, ctypes(java.lang.Math.floorMod(k + 1L, 3L).toInt))
      case 4 =>
        val (px, w, h) = scaled(2)
        Jpeg.encodeGrayProgressive(px, w, h, useSA = true, restartInterval = 5)
      case _ =>
        val (px, w, h) = scaled(2)
        Jpeg.encodeGray420Progressive(px, w, h)
    }
  }

  // 32×32 DCT-II basis, built once per JVM — rebuilding inside
  // phash64 cost 1024 cos() calls per image (ADVICE r15).
  private lazy val phashCosTab: Array[Array[Double]] =
    Array.tabulate(32, 32)((k, x) => math.cos((2 * x + 1) * k * math.Pi / 64.0))

  /** 64-bit perceptual hash of a 32×32 grayscale image — the standard
    * pHash construction (DCT low-frequency signs; the published
    * image near-dup method behind every "visually identical" dedup):
    * 2-D DCT-II of the 32×32 grays, keep the top-left 8×8
    * low-frequency block, threshold each coefficient against the
    * MEDIAN of the 63 non-DC coefficients — sorted index 31, the true
    * middle of 63 values (the DC term is overall brightness —
    * excluding it from the median makes the hash brightness-shift
    * tolerant), bit k (row-major) set iff coeff > median. Pure JVM
    * double arithmetic — deterministic everywhere. */
  def phash64(gray32: Array[Double]): Long = {
    require(gray32.length == 1024, s"phash64 expects 32x32 grays, got ${gray32.length}")
    val n = 32
    // DCT-II separable: first rows, then columns
    val cosTab = phashCosTab
    val rows = Array.ofDim[Double](n, n)
    var r = 0
    while (r < n) {
      var k = 0
      while (k < 8) { // only the first 8 frequencies are ever read
        var s = 0.0; var x = 0
        while (x < n) { s += gray32(r * n + x) * cosTab(k)(x); x += 1 }
        rows(r)(k) = s; k += 1
      }
      r += 1
    }
    val coeffs = new Array[Double](64)
    var kr = 0
    while (kr < 8) {
      var kc = 0
      while (kc < 8) {
        var s = 0.0; var x = 0
        while (x < n) { s += rows(x)(kc) * cosTab(kr)(x); x += 1 }
        coeffs(kr * 8 + kc) = s; kc += 1
      }
      kr += 1
    }
    val nonDc = coeffs.drop(1).sorted
    val med = nonDc(31) // true median of 63 values (ADVICE r15: the
    // rank-30/31 average was an even-count formula applied to an odd
    // count — consistent, but not the canonical pHash threshold)
    var bits = 0L; var i = 0
    while (i < 64) { if (coeffs(i) > med) bits |= (1L << i); i += 1 }
    bits
  }

  /** Per-payload perceptual-hash signatures `(doc_id, sig)` — the
    * [[decodeMeta]] mapPartitions codec boundary feeding
    * [[graft.operators.Dedup.pairsFromSigs64]]'s banding: only the
    * 8-byte signature leaves the scan, the payload never shuffles.
    * Undecodable payloads drop. Column names match the signature
    * contract (`doc_id`, `sig`) so the export/oracle machinery applies
    * unchanged. */
  def phashSignatures(
      df: DataFrame, id: Column, content: Column,
      decoder: PixelDecoder = FakePixelDecoder): DataFrame = {
    df.select(id.cast("long").as("media_id"), content.cast("binary").as("content"))
      .as[MediaRow](Encoders.product[MediaRow])
      .mapPartitions { it =>
        it.flatMap { r =>
          decoder.decodeGray32(r.content).map(g => (r.media_id, phash64(g)))
        }
      }(Encoders.product[(Long, Long)])
      .toDF("doc_id", "sig")
  }

  /** Perceptual near-duplicate image pairs `(id_a, id_b, hamming)` —
    * pHash signatures through the shared 4×16-bit pigeonhole
    * banding (recall 1 for hamming ≤ 3, hot-bucket guard on
    * degenerate chunks, one narrow (sig, id) shuffle). The image twin
    * of text SimHash dedup. */
  def phashPairs(
      df: DataFrame, id: Column, content: Column, maxHamming: Int = 3,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      decoder: PixelDecoder = FakePixelDecoder): DataFrame =
    Dedup.pairsFromSigs64(phashSignatures(df, id, content, decoder), maxHamming, maxBucket)

  /** Decode a mixed audio/video/image binary column to the unified
    * metadata frame `(media_id, width, height, sample_rate, channels,
    * bits, format, n_bytes)` — same mapPartitions codec boundary as
    * [[decodeMeta]], emitting only metadata (the payload never
    * re-shuffles). */
  def decodeAvMeta(df: DataFrame, id: Column, content: Column,
      decoder: AvDecoder = AvHeaderDecoder): DataFrame =
    df.select(id.cast("long").as("media_id"), content.cast("binary").as("content"))
      .as[MediaRow](Encoders.product[MediaRow])
      .mapPartitions { it =>
        it.map { r =>
          val d = decoder.decodeAv(r.content)
          AvMetaRow(r.media_id, d.width, d.height, d.sampleRate, d.channels,
            d.bits, d.format, d.nBytes)
        }
      }(Encoders.product[AvMetaRow])
      .toDF()
}
