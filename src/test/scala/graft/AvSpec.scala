package graft

import org.apache.spark.sql.functions.col

import graft.operators.Media
import graft.operators.Media.{AvHeaderDecoder, DecodedAv, syntheticAvContainer}

/** L12 (audio/video): real WAV/FLAC/MP3/OGG/MP4 container header
  * parsing, degradation on corrupt/truncated payloads, delegation to
  * the image parser, and the distributed decodeAvMeta path. */
class AvSpec extends SparkSpec {

  object Blobs extends GSchema {
    val media_id = col[Long]("media_id")
    val content  = col[Array[Byte]]("content")
  }

  // Canonical 44-byte PCM WAV: 22050 Hz, 2 ch, 16-bit.
  private val wavBytes = {
    val b = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1.toShort).putShort(2.toShort).putInt(22050)
    b.putInt(22050 * 4).putShort(4.toShort).putShort(16.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(0)
    b.array()
  }

  // WAV whose fmt chunk sits behind a LIST chunk with an ODD payload
  // size — exercises the chunk walk and its even-padding rule.
  private val wavListFirst = {
    val b = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(40).put("WAVE".getBytes("US-ASCII"))
    b.put("LIST".getBytes("US-ASCII")).putInt(3).put("IN".getBytes("US-ASCII")).put(0.toByte)
    b.put(0.toByte) // pad byte: chunks align to even offsets
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1.toShort).putShort(1.toShort).putInt(8000)
    b.putInt(8000).putShort(1.toShort).putShort(8.toShort)
    b.array()
  }

  // FLAC STREAMINFO: 96000 Hz, 2 ch, 24-bit — exercises the bit
  // packing across the byte-20/21 boundary.
  private val flacBytes = {
    val b = new Array[Byte](42)
    "fLaC".getBytes("US-ASCII").copyToArray(b)
    b(7) = 34
    b(18) = (96000 >> 12).toByte
    b(19) = ((96000 >> 4) & 0xFF).toByte
    b(20) = (((96000 & 0xF) << 4) | ((2 - 1) << 1) | ((24 - 1) >> 4)).toByte
    b(21) = (((24 - 1) & 0xF) << 4).toByte
    b
  }

  // MPEG1 Layer III frame behind a 10-byte-payload ID3v2 tag:
  // 48 kHz (rate index 1), stereo (mode 0).
  private val mp3Id3Bytes = Array[Int](
    'I', 'D', '3', 4, 0, 0, 0, 0, 0, 10,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0xFF, 0xFB, 0x94, 0x00
  ).map(_.toByte)

  // MPEG2 frame (half-rate table): index 0 → 22050 Hz, mono (mode 3).
  private val mp3Mpeg2Bytes = Array[Int](0xFF, 0xF3, 0x90, 0xC0).map(_.toByte)

  // Ogg page wrapping an OpusHead id header: 48 kHz input rate, 2 ch.
  private val oggOpusBytes = {
    val b = java.nio.ByteBuffer.allocate(27 + 1 + 19).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(2.toByte)
    b.putLong(0L).putInt(1).putInt(0).putInt(0)
    b.put(1.toByte).put(19.toByte)
    b.put("OpusHead".getBytes("US-ASCII")).put(1.toByte).put(2.toByte)
    b.putShort(312.toShort).putInt(48000).putShort(0.toShort).put(0.toByte)
    b.array()
  }

  // ISO-BMFF with a VERSION 1 tkhd (64-bit times): dims at tkhd+96.
  private val mp4V1Bytes = {
    val b = java.nio.ByteBuffer.allocate(136)
    b.putInt(16).put("ftyp".getBytes("US-ASCII")).put("isom".getBytes("US-ASCII")).putInt(0)
    b.putInt(120).put("moov".getBytes("US-ASCII"))
    b.putInt(112).put("trak".getBytes("US-ASCII"))
    b.putInt(104).put("tkhd".getBytes("US-ASCII"))
    b.putInt(0x01000000)               // version 1 + flags
    b.putLong(0L).putLong(0L)          // 64-bit ctime mtime
    b.putInt(1).putInt(0).putLong(0L)  // trackId reserved duration
    b.position(b.position() + 16)      // reserved layer alt volume reserved
    b.putInt(0x00010000).putInt(0).putInt(0)
    b.putInt(0).putInt(0x00010000).putInt(0)
    b.putInt(0).putInt(0).putInt(0x40000000)
    b.putInt(1280 << 16).putInt(720 << 16)
    b.array()
  }

  // AVIF still: ftyp(avif) + meta FullBox > iprp > ipco > ispe, 2048×1536.
  private val avifBytes = {
    val b = java.nio.ByteBuffer.allocate(64)
    b.putInt(16).put("ftyp".getBytes("US-ASCII")).put("avif".getBytes("US-ASCII")).putInt(0)
    b.putInt(48).put("meta".getBytes("US-ASCII")).putInt(0)
    b.putInt(36).put("iprp".getBytes("US-ASCII"))
    b.putInt(28).put("ipco".getBytes("US-ASCII"))
    b.putInt(20).put("ispe".getBytes("US-ASCII")).putInt(0).putInt(2048).putInt(1536)
    b.array()
  }

  // HEIC still with DECOYS on every level of the walk: a free box before
  // meta, a pasp property before ispe inside ipco — the sibling scans
  // must step over both. Brand "heic" (the mif1 mapping is covered by
  // the synthetic round-trip). 4032×3024.
  private val heicBytes = {
    val b = java.nio.ByteBuffer.allocate(88)
    b.putInt(16).put("ftyp".getBytes("US-ASCII")).put("heic".getBytes("US-ASCII")).putInt(0)
    b.putInt(8).put("free".getBytes("US-ASCII"))
    b.putInt(64).put("meta".getBytes("US-ASCII")).putInt(0)
    b.putInt(52).put("iprp".getBytes("US-ASCII"))
    b.putInt(44).put("ipco".getBytes("US-ASCII"))
    b.putInt(16).put("pasp".getBytes("US-ASCII")).putInt(1).putInt(1)
    b.putInt(20).put("ispe".getBytes("US-ASCII")).putInt(0).putInt(4032).putInt(3024)
    b.array()
  }

  test("AvHeaderDecoder parses real WAV/FLAC/MP3/OGG/MP4 headers") {
    assert(AvHeaderDecoder.decodeAv(wavBytes) == DecodedAv(0, 0, 22050, 2, 16, "wav", 44L))
    assert(AvHeaderDecoder.decodeAv(wavListFirst) ==
      DecodedAv(0, 0, 8000, 1, 8, "wav", wavListFirst.length.toLong))
    assert(AvHeaderDecoder.decodeAv(flacBytes) == DecodedAv(0, 0, 96000, 2, 24, "flac", 42L))
    assert(AvHeaderDecoder.decodeAv(mp3Id3Bytes) ==
      DecodedAv(0, 0, 48000, 2, 0, "mp3", mp3Id3Bytes.length.toLong))
    assert(AvHeaderDecoder.decodeAv(mp3Mpeg2Bytes) == DecodedAv(0, 0, 22050, 1, 0, "mp3", 4L))
    assert(AvHeaderDecoder.decodeAv(oggOpusBytes) ==
      DecodedAv(0, 0, 48000, 2, 0, "ogg", oggOpusBytes.length.toLong))
    assert(AvHeaderDecoder.decodeAv(mp4V1Bytes) == DecodedAv(1280, 720, 0, 0, 0, "mp4", 136L))
  }

  test("AVIF/HEIC stills: ftyp brand routes to the ispe walk, decoy boxes stepped over") {
    assert(AvHeaderDecoder.decodeAv(avifBytes) == DecodedAv(2048, 1536, 0, 0, 0, "avif", 64L))
    assert(AvHeaderDecoder.decodeAv(heicBytes) == DecodedAv(4032, 3024, 0, 0, 0, "heic", 88L))
    // every ISO-BMFF HEIF brand maps to its format family
    def rebrand(base: Array[Byte], brand: String): Array[Byte] = {
      val c = base.clone(); brand.getBytes("US-ASCII").copyToArray(c, 8); c
    }
    assert(AvHeaderDecoder.decodeAv(rebrand(avifBytes, "avis")).format == "avif")
    for (br <- Seq("heix", "mif1", "msf1"))
      assert(AvHeaderDecoder.decodeAv(rebrand(avifBytes, br)) ==
        DecodedAv(2048, 1536, 0, 0, 0, "heic", 64L), br)
    // a brandless ISO-BMFF still takes the movie path and degrades to mp4
    assert(AvHeaderDecoder.decodeAv(rebrand(avifBytes, "isom")).format == "mp4")
    // an AVIF with no meta box (ftyp only) keeps the format, zeroed dims
    assert(AvHeaderDecoder.decodeAv(avifBytes.take(16)) ==
      DecodedAv(0, 0, 0, 0, 0, "avif", 16L))
    // an ispe too short for its dims degrades rather than reading past it
    val shortIspe = avifBytes.clone()
    shortIspe(47) = 12 // ispe box size 20 → 12: header + version only
    assert(AvHeaderDecoder.decodeAv(shortIspe) == DecodedAv(0, 0, 0, 0, 0, "avif", 64L))
  }

  test("corrupt and truncated AV payloads degrade, never throw") {
    // truncation at every prefix length of every fixture: format-or-unknown
    // with zeroed fields, nBytes = what arrived — a crawl partition must
    // survive arbitrary mid-object cuts
    for (bytes <- Seq(wavBytes, flacBytes, mp3Id3Bytes, oggOpusBytes, mp4V1Bytes,
                      avifBytes, heicBytes);
         cut <- 0 until bytes.length) {
      val d = AvHeaderDecoder.decodeAv(bytes.take(cut))
      assert(d.nBytes == cut.toLong, s"cut=$cut")
    }
    // a WAV whose leading chunk declares a size beyond the payload stops
    // the walk and keeps the format with zeroed fields
    val lying = wavListFirst.clone(); lying(16) = 0x7F
    assert(AvHeaderDecoder.decodeAv(lying) ==
      DecodedAv(0, 0, 0, 0, 0, "wav", lying.length.toLong))
    // a FLAC whose first block is not STREAMINFO degrades
    val notSI = flacBytes.clone(); notSI(4) = 4
    assert(AvHeaderDecoder.decodeAv(notSI).format == "flac")
    assert(AvHeaderDecoder.decodeAv(notSI).sampleRate == 0)
    // reserved MPEG version bits (01) are corrupt, not a frame
    assert(AvHeaderDecoder.decodeAv(Array(0xFF.toByte, 0xEB.toByte, 0x90.toByte, 0.toByte)) ==
      DecodedAv(0, 0, 0, 0, 0, "mp3", 4L))
    // an Ogg page carrying an unrecognized codec keeps the container format
    val theora = oggOpusBytes.clone(); theora(28) = 0x80.toByte
    assert(AvHeaderDecoder.decodeAv(theora) == DecodedAv(0, 0, 0, 0, 0, "ogg", theora.length.toLong))
    // an MP4 with no moov box (streaming-fragment shape) keeps the format
    assert(AvHeaderDecoder.decodeAv(mp4V1Bytes.take(16)) == DecodedAv(0, 0, 0, 0, 0, "mp4", 16L))
  }

  test("non-AV payloads delegate to the image header parser") {
    val png = Media.syntheticContainer(0L) // id 0 → png
    val d = AvHeaderDecoder.decodeAv(png)
    assert(d == DecodedAv(16, 16, 0, 0, 0, "png", png.length.toLong))
    // RIFF/WEBP is an image, not a WAV — must not be claimed by the AV side
    val webp = Media.syntheticContainer(3L)
    assert(AvHeaderDecoder.decodeAv(webp).format == "webp")
    val junk = "definitely not a media payload".getBytes("UTF-8")
    assert(AvHeaderDecoder.decodeAv(junk) == DecodedAv(0, 0, 0, 0, 0, "unknown", junk.length.toLong))
    assert(AvHeaderDecoder.decodeAv(Array.emptyByteArray).format == "unknown")
  }

  test("syntheticAvContainer round-trips through AvHeaderDecoder for all formats") {
    import java.lang.Math.{floorDiv, floorMod}
    // ids 4/9/14/19/24 walk the ISO-BMFF sub-cycle mp4→avif→heic→mp4→avif
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 14L, 19L, 24L,
                   39999L, 40001L, 123456L, -1L, -6L, -11L, -7L, -40000L, Long.MinValue)) {
      val bytes = syntheticAvContainer(id)
      val d = AvHeaderDecoder.decodeAv(bytes)
      val rate = (8000L + floorMod(id, 40000L)).toInt
      val ch2 = (1L + floorMod(id, 2L)).toInt
      val exp = floorMod(id, 5L) match {
        case 0L => DecodedAv(0, 0, rate, ch2, (8L * (1L + floorMod(id, 3L))).toInt, "wav", 44L)
        case 1L => DecodedAv(0, 0, rate, (1L + floorMod(id, 8L)).toInt, 16, "flac", 42L)
        case 2L =>
          val sr = floorMod(id, 3L) match { case 0L => 44100; case 1L => 48000; case _ => 32000 }
          DecodedAv(0, 0, sr, if (floorMod(id, 2L) == 0L) 2 else 1, 0, "mp3", 4L)
        case 3L => DecodedAv(0, 0, rate, ch2, 0, "ogg", 58L)
        case _ =>
          val (w, h) = ((16L + floorMod(id, 600L)).toInt, (16L + floorMod(id * 3L, 400L)).toInt)
          floorMod(floorDiv(id, 5L), 3L) match {
            case 0L => DecodedAv(w, h, 0, 0, 0, "mp4", 124L)
            case 1L => DecodedAv(w, h, 0, 0, 0, "avif", 64L)
            case _  => DecodedAv(w, h, 0, 0, 0, "heic", 64L)
          }
      }
      assert(d == exp, s"id=$id")
      // truncating any synthetic container degrades, never throws
      for (cut <- Seq(1, 3, 13, 27)) {
        assert(AvHeaderDecoder.decodeAv(bytes.take(math.min(cut, bytes.length))).nBytes ==
          math.min(cut, bytes.length).toLong)
      }
    }
  }

  test("AvHeaderDecoder runs through the distributed decodeAvMeta path") {
    import spark.implicits._
    val media = Tio.fromRows(spark, Blobs, Seq(
      Blob(1L, wavBytes), Blob(2L, mp4V1Bytes), Blob(3L, Media.syntheticContainer(0L)))).toNative
    val out = Media.decodeAvMeta(media, col("media_id"), col("content"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("sample_rate"),
          r.getAs[Int]("channels"), r.getAs[Int]("bits"), r.getAs[String]("format")))).toMap
    assert(out == Map(
      1L -> ((0, 0, 22050, 2, 16, "wav")),
      2L -> ((1280, 720, 0, 0, 0, "mp4")),
      3L -> ((16, 16, 0, 0, 0, "png"))))
  }
}
