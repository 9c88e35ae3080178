package graft

import org.apache.spark.sql.functions.col

import graft.operators.Media

final case class Blob(media_id: Long, content: Array[Byte])

/** L12: binary payload + typed metadata plumbing; decoder swap. */
class MultimodalSpec extends SparkSpec {

  object Blobs extends GSchema {
    val media_id = col[Long]("media_id")
    val content  = col[Array[Byte]]("content")
  }

  private def df = {
    import spark.implicits._
    Tio.fromRows(spark, Blobs, Seq(
      Blob(1L, "abc".getBytes("UTF-8")),
      Blob(2L, Array.fill[Byte](700)(7)),
      Blob(3L, Array.emptyByteArray),
    )).toNative
  }

  test("decodeMeta derives deterministic metadata via mapPartitions") {
    val out = Media.decodeMeta(df, col("media_id"), col("content"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[String]("format"), r.getAs[Long]("n_bytes")))).toMap
    assert(out(1L) == ((19, 37, "png", 3L)))     // n=3: 16+3, 16+21, 3%3=0
    assert(out(2L) == ((16 + 700 % 640, 16 + (700 * 7) % 480, "jpeg", 700L))) // 700%3=1
    assert(out(3L) == ((16, 16, "png", 0L)))
  }

  private val pngBytes = Array[Int](
    0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // signature
    0, 0, 0, 13, 'I', 'H', 'D', 'R',             // IHDR chunk length + type
    0, 0, 0x02, 0x80,                            // width  = 640
    0, 0, 0x01, 0xE0                             // height = 480
  ).map(_.toByte)

  private val jpegBytes = Array[Int](
    0xFF, 0xD8,                                            // SOI
    0xFF, 0xE0, 0x00, 0x10,                                // APP0, len 16
    'J', 'F', 'I', 'F', 0, 1, 2, 0, 0, 1, 0, 1, 0, 0,      // 14 payload bytes
    0xFF, 0xC0, 0x00, 0x11,                                // SOF0, len 17
    8, 0x01, 0x00, 0x02, 0x00,                             // precision, h=256, w=512
    3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1                  // component specs
  ).map(_.toByte)

  private val gifBytes = Array[Int](
    'G', 'I', 'F', '8', '9', 'a',
    0x40, 0x01,                                            // width  = 320 (LE)
    0xC8, 0x00                                             // height = 200 (LE)
  ).map(_.toByte)

  // RIFF + VP8 lossy: 3-byte frame tag, 0x9D012A start code, 14-bit
  // LE dims (w=550, h=368)
  private val webpVp8Bytes = Array[Int](
    'R', 'I', 'F', 'F', 22, 0, 0, 0, 'W', 'E', 'B', 'P',
    'V', 'P', '8', ' ', 10, 0, 0, 0,
    0x30, 0x01, 0x00,                                      // frame tag
    0x9D, 0x01, 0x2A,                                      // start code
    0x26, 0x02,                                            // width 550
    0x70, 0x01                                             // height 368
  ).map(_.toByte)

  // RIFF + VP8L lossless: 0x2F signature, (w-1)|((h-1)<<14) LE32
  // (w=800, h=600)
  private val webpVp8lBytes = {
    val b = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(17)
    b.put("WEBPVP8L".getBytes("US-ASCII")).putInt(5)
    b.put(0x2F.toByte).putInt(799 | (599 << 14))
    b.array()
  }

  // RIFF + VP8X extended: canvas w-1 / h-1 as 24-bit LE at 24/27
  // (w=1920, h=1080)
  private val webpVp8xBytes = {
    val b = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(22)
    b.put("WEBPVP8X".getBytes("US-ASCII")).putInt(10)
    b.putInt(0x00000002)                                   // flags + reserved
    b.put((1919 & 0xFF).toByte).put(((1919 >> 8) & 0xFF).toByte).put(0.toByte)
    b.put((1079 & 0xFF).toByte).put(((1079 >> 8) & 0xFF).toByte).put(0.toByte)
    b.array()
  }

  private def bmpInfo(w: Int, h: Int) = {
    val b = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1.toShort).putShort(24.toShort)
    b.array()
  }

  test("HeaderDecoder parses real PNG/JPEG/GIF headers and tolerates junk") {
    import Media.{DecodedMedia, HeaderDecoder}
    assert(HeaderDecoder.decode(pngBytes) == DecodedMedia(640, 480, "png", pngBytes.length.toLong))
    assert(HeaderDecoder.decode(jpegBytes) == DecodedMedia(512, 256, "jpeg", jpegBytes.length.toLong))
    assert(HeaderDecoder.decode(gifBytes) == DecodedMedia(320, 200, "gif", gifBytes.length.toLong))
    val junk = "definitely not an image payload".getBytes("UTF-8")
    assert(HeaderDecoder.decode(junk) == DecodedMedia(0, 0, "unknown", junk.length.toLong))
    // truncated JPEG (SOI only) degrades gracefully, no exception
    assert(HeaderDecoder.decode(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xC0.toByte)).format == "jpeg")
    assert(HeaderDecoder.decode(Array.emptyByteArray).format == "unknown")
  }

  test("HeaderDecoder parses WEBP VP8/VP8L/VP8X and BMP headers") {
    import Media.{DecodedMedia, HeaderDecoder}
    assert(HeaderDecoder.decode(webpVp8Bytes) == DecodedMedia(550, 368, "webp", webpVp8Bytes.length.toLong))
    assert(HeaderDecoder.decode(webpVp8lBytes) == DecodedMedia(800, 600, "webp", 25L))
    assert(HeaderDecoder.decode(webpVp8xBytes) == DecodedMedia(1920, 1080, "webp", 30L))
    assert(HeaderDecoder.decode(bmpInfo(1024, 768)) == DecodedMedia(1024, 768, "bmp", 54L))
    // top-down BMP stores a negative height — a legal file, |h| reported
    assert(HeaderDecoder.decode(bmpInfo(1024, -768)) == DecodedMedia(1024, 768, "bmp", 54L))
    // negative width is corrupt, degrades to (0, 0) but keeps the format
    assert(HeaderDecoder.decode(bmpInfo(-5, 10)) == DecodedMedia(0, 0, "bmp", 54L))
    // legacy BITMAPCOREHEADER: 12-byte DIB header, LE16 dims
    val core = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    core.put('B'.toByte).put('M'.toByte).putInt(26).putInt(0).putInt(26)
    core.putInt(12).putShort(320.toShort).putShort(240.toShort)
    assert(HeaderDecoder.decode(core.array()) == DecodedMedia(320, 240, "bmp", 26L))
    // a RIFF that is not WEBP (e.g. WAVE audio) is not an image
    val wave = "RIFF1234WAVEfmt ".getBytes("US-ASCII")
    assert(HeaderDecoder.decode(wave).format == "unknown")
    // truncation degrades to (0, 0) with the format kept, never throws
    for (bytes <- Seq(webpVp8Bytes, webpVp8lBytes, webpVp8xBytes); cut <- Seq(16, 20, 22)) {
      val d = HeaderDecoder.decode(bytes.take(cut))
      assert(d == DecodedMedia(0, 0, "webp", cut.toLong), s"cut=$cut")
    }
    assert(HeaderDecoder.decode(bmpInfo(64, 64).take(20)) == DecodedMedia(0, 0, "bmp", 20L))
    // an unknown future RIFF/WEBP chunk keeps the container format
    val odd = "RIFF1234WEBPXYZW".getBytes("US-ASCII")
    assert(HeaderDecoder.decode(odd) == DecodedMedia(0, 0, "webp", 16L))
  }

  test("HeaderDecoder runs through the distributed decodeMeta path") {
    import spark.implicits._
    val media = Tio.fromRows(spark, Blobs, Seq(
      Blob(1L, pngBytes), Blob(2L, jpegBytes), Blob(3L, gifBytes))).toNative
    val out = Media.decodeMeta(media, col("media_id"), col("content"), Media.HeaderDecoder)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[String]("format")))).toMap
    assert(out == Map(
      1L -> ((640, 480, "png")),
      2L -> ((512, 256, "jpeg")),
      3L -> ((320, 200, "gif"))))
  }

  test("syntheticContainer round-trips through HeaderDecoder for all five formats") {
    import Media.{DecodedMedia, HeaderDecoder, syntheticContainer}
    // ids covering each format branch, the modular dim wrap, and
    // negative ids (floorMod keeps dims positive and formats in range)
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 599L, 601L, 1203L, 123456L, -1L, -599L, Long.MinValue)) {
      val expW = (16L + java.lang.Math.floorMod(id, 600L)).toInt
      val expH = (16L + java.lang.Math.floorMod(id * 3L, 400L)).toInt
      val expFmt = java.lang.Math.floorMod(id, 5L) match {
        case 0L => "png"; case 1L => "jpeg"; case 2L => "gif"; case 3L => "webp"; case _ => "bmp" }
      val bytes = syntheticContainer(id)
      assert(HeaderDecoder.decode(bytes) == DecodedMedia(expW, expH, expFmt, bytes.length.toLong),
        s"id=$id")
    }
    // truncating any synthetic container degrades, never throws
    for (id <- 0L to 4L; cut <- Seq(1, 5, 9, 11)) {
      val d = HeaderDecoder.decode(syntheticContainer(id).take(cut))
      assert(d.nBytes == cut.toLong)
    }
  }

  test("a custom decoder plugs in behind the MediaDecoder trait") {
    object UpperBound extends Media.MediaDecoder {
      def decode(b: Array[Byte]): Media.DecodedMedia =
        Media.DecodedMedia(1, 1, "raw", b.length.toLong)
    }
    val out = Media.decodeMeta(df, col("media_id"), col("content"), UpperBound)
      .collect().map(r => (r.getAs[String]("format"), r.getAs[Int]("width"))).toSet
    assert(out == Set(("raw", 1)))
  }

  // ---------------------------------------------------------------- L48

  // smooth image-like content (two gradients + a blob) — DCT energy
  // concentrates in low frequencies, the regime pHash is built for
  private val fixtureGray = Array.tabulate(1024) { i =>
    val r = i / 32; val c = i % 32
    120.0 + 3.0 * r - 2.0 * c + 40.0 * math.exp(-((r - 10) * (r - 10) + (c - 20) * (c - 20)) / 50.0)
  }

  test("phash64: deterministic, brightness-shift tolerant, locality-preserving") {
    // pinned literal: cross-version drift in the hash silently breaks
    // every persisted signature index — fail loudly instead (re-pinned
    // round 16 when the threshold moved to the true odd-count median)
    assert(Media.phash64(fixtureGray) == 3947906683530299627L)
    assert(Media.phash64(fixtureGray) == Media.phash64(fixtureGray.clone()))
    // constant brightness shift moves ONLY the DC coefficient -> at
    // most bit 0 can flip (the design point of the non-DC median)
    val shifted = fixtureGray.map(_ + 10.0)
    assert(java.lang.Long.bitCount(
      Media.phash64(fixtureGray) ^ Media.phash64(shifted)) <= 1)
    // small perturbations stay close; an unrelated image is far
    val perturbed = fixtureGray.clone()
    (0 until 5).foreach(i => perturbed(i * 97 % 1024) += 3.0)
    assert(java.lang.Long.bitCount(
      Media.phash64(fixtureGray) ^ Media.phash64(perturbed)) <= 6)
    val rnd = new scala.util.Random(3)
    val other = Array.fill(1024)(rnd.nextInt(256).toDouble)
    val far = java.lang.Long.bitCount(Media.phash64(fixtureGray) ^ Media.phash64(other))
    assert(far >= 12, s"unrelated images must be far apart, got $far")
  }

  test("FakePixelDecoder: deterministic byte tiling; empty/NULL undecodable") {
    val bytes = Array.tabulate(40)(i => (i * 7).toByte)
    val g = Media.FakePixelDecoder.decodeGray32(bytes).get
    assert(g.length == 1024)
    assert(g(0) == (bytes(0) & 0xFF).toDouble && g(41) == (bytes(1) & 0xFF).toDouble)
    assert(Media.FakePixelDecoder.decodeGray32(bytes).get.sameElements(g))
    assert(Media.FakePixelDecoder.decodeGray32(Array.emptyByteArray).isEmpty)
    assert(Media.FakePixelDecoder.decodeGray32(null).isEmpty)
  }

  test("RealPixelDecoder: PNG gray/RGB/RGBA, BMP, and 2x block upscale all decode to the same grays") {
    val k = 42L
    val base = Media.syntheticPixelPattern(k).map(_.toDouble)
    def scaled2 = {
      val b = Media.syntheticPixelPattern(k)
      Array.tabulate(64 * 64)(i => b((i / 64 / 2) * 32 + (i % 64) / 2))
    }
    val renders = Seq(
      "png gray 32" -> Media.pngBytes(Media.syntheticPixelPattern(k), 32, 32, 0),
      "png rgb 32" -> Media.pngBytes(Media.syntheticPixelPattern(k), 32, 32, 2),
      "png rgba 64" -> Media.pngBytes(scaled2, 64, 64, 6),
      "bmp 32" -> Media.bmpBytes(Media.syntheticPixelPattern(k), 32, 32),
      "bmp 64" -> Media.bmpBytes(scaled2, 64, 64))
    for ((name, bytes) <- renders) {
      val g = Media.RealPixelDecoder.decodeGray32(bytes)
      assert(g.isDefined, s"$name must decode")
      assert(g.get.sameElements(base), s"$name grays differ from the base pattern")
    }
    // a different k decodes to a different pattern
    val other = Media.RealPixelDecoder.decodeGray32(
      Media.pngBytes(Media.syntheticPixelPattern(k + 1), 32, 32, 0)).get
    assert(!other.sameElements(base))
  }

  test("RealPixelDecoder: PNG Sub/Up/Average/Paeth filters defilter per the spec") {
    // hand-built 4x2 gray PNG with per-row filter types; expected
    // reconstruction computed by the §9 formulas by hand
    def png(rows: Seq[(Int, Seq[Int])], w: Int, h: Int): Array[Byte] = {
      val raw = rows.flatMap { case (ft, bs) => ft +: bs }.map(_.toByte).toArray
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
        val b = java.nio.ByteBuffer.allocate(12 + data.length)
        b.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
        val crc = new java.util.zip.CRC32()
        crc.update(typ.getBytes("US-ASCII")); crc.update(data)
        b.putInt(crc.getValue.toInt).array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(0.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }
    // row 0 Sub:   [10, 5, 5, 5]  -> 10 15 20 25
    // row 1 Up:    [1, 2, 3, 4]   -> 11 17 23 29
    val subUp = png(Seq((1, Seq(10, 5, 5, 5)), (2, Seq(1, 2, 3, 4))), 4, 2)
    // resize 4x2 -> point/average samples; easier: decode then check
    // via the internals — read back through a 32x32 resize of constant
    // regions is lossy, so check with a 32-wide image instead below.
    assert(Media.RealPixelDecoder.decodeGray32(subUp).isDefined)
    // full-size 32x32 single-row-filter checks: Sub row then Paeth row
    // reconstructed == filter-0 encoding of the same pixels
    val pix = Array.tabulate(1024)(i => (i * 7 + 3) % 256)
    def filt(ft: Int, row: Array[Int], prev: Array[Int]): Seq[Int] = {
      def paeth(a: Int, b: Int, c: Int) = {
        val p = a + b - c
        val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      row.indices.map { i =>
        val a = if (i > 0) row(i - 1) else 0
        val b = prev(i)
        val c = if (i > 0) prev(i - 1) else 0
        val pred = ft match {
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 => paeth(a, b, c)
        }
        (row(i) - pred) & 0xFF
      }
    }
    val rows = (0 until 32).map(r => pix.slice(r * 32, r * 32 + 32))
    val filtered = rows.zipWithIndex.map { case (row, r) =>
      val prev = if (r == 0) Array.fill(32)(0) else rows(r - 1)
      val ft = 1 + (r % 4) // cycle Sub/Up/Average/Paeth
      (ft, filt(ft, row, prev))
    }
    val fancy = Media.RealPixelDecoder.decodeGray32(png(filtered, 32, 32)).get
    val plain = Media.RealPixelDecoder.decodeGray32(
      png(rows.map(r => (0, r.toSeq)), 32, 32)).get
    assert(fancy.sameElements(plain), "filtered encoding must reconstruct the same pixels")
    assert(plain.sameElements(pix.map(_.toDouble)))
  }

  test("RealPixelDecoder: corrupt/unsupported payloads degrade to None") {
    val good = Media.pngBytes(Media.syntheticPixelPattern(7L), 32, 32, 0)
    assert(Media.RealPixelDecoder.decodeGray32(good).isDefined)
    assert(Media.RealPixelDecoder.decodeGray32(null).isEmpty)
    assert(Media.RealPixelDecoder.decodeGray32(Array.emptyByteArray).isEmpty)
    assert(Media.RealPixelDecoder.decodeGray32("not an image at all".getBytes).isEmpty)
    // truncated IDAT stream
    assert(Media.RealPixelDecoder.decodeGray32(good.dropRight(30)).isEmpty)
    // header-only PNG (the multimodal_real synthetic container: no IDAT)
    assert(Media.RealPixelDecoder.decodeGray32(Media.syntheticContainer(0L)).isEmpty)
    // a sequential stream MISLABELED interlaced inflates short of the
    // Adam7 pass layout's byte count → None (IHDR data sits at
    // absolute offsets 16..28; CRC is not checked)
    val interlaced = good.clone(); interlaced(28) = 1
    assert(Media.RealPixelDecoder.decodeGray32(interlaced).isEmpty)
    // 16-bit depth stays out of subset
    val deep = good.clone(); deep(24) = 16.toByte
    assert(Media.RealPixelDecoder.decodeGray32(deep).isEmpty)
    // a stream mislabeled palette has NO PLTE chunk → None
    val pal = good.clone(); pal(25) = 3.toByte
    assert(Media.RealPixelDecoder.decodeGray32(pal).isEmpty)
    // a palette image whose indexes run past a SHORT PLTE → None:
    // rewrite the 256-entry PLTE of a real palette PNG down to 16
    // entries (index bytes up to 220 remain in the IDAT)
    val realPal = Media.pngBytes(Media.syntheticPixelPattern(7L), 32, 32, 3)
    assert(Media.RealPixelDecoder.decodeGray32(realPal).isDefined)
    val shortPal = {
      val plteOff = 8 + 25 // after IHDR chunk
      val head = java.util.Arrays.copyOfRange(realPal, 0, plteOff)
      val tail = java.util.Arrays.copyOfRange(realPal, plteOff + 12 + 768, realPal.length)
      val data = Array.tabulate(48)(i => (i / 3).toByte)
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put("PLTE".getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update("PLTE".getBytes("US-ASCII")); crc.update(data)
      b.putInt(crc.getValue.toInt)
      head ++ b.array() ++ tail
    }
    assert(Media.RealPixelDecoder.decodeGray32(shortPal).isEmpty)
    // BMP: 8-bit and compressed reject; 24-bit BI_RGB decodes
    val bmp = Media.bmpBytes(Media.syntheticPixelPattern(7L), 32, 32)
    assert(Media.RealPixelDecoder.decodeGray32(bmp).isDefined)
    val bpp8 = bmp.clone(); bpp8(28) = 8.toByte
    assert(Media.RealPixelDecoder.decodeGray32(bpp8).isEmpty)
    val rle = bmp.clone(); rle(30) = 1.toByte
    assert(Media.RealPixelDecoder.decodeGray32(rle).isEmpty)
  }

  test("palette + Adam7: every pass boundary and color type decodes to the sequential grays") {
    // dims chosen so every Adam7 pass hits its empty/partial/full
    // boundary (w or h of 1 and 2 empty passes 2/4/6 or 3/5/7; odd
    // dims exercise the ceil in every pass's sub-dims)
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 3), (5, 7), (8, 8), (9, 9), (16, 5), (32, 32));
        ct <- Seq(0, 2, 6, 3)) {
      val grays = Array.tabulate(w * h)(i => (i * 37 + 11) % 256)
      val seq = Media.RealPixelDecoder.decodeGray32(Media.pngBytes(grays, w, h, ct))
      val il = Media.RealPixelDecoder.decodeGray32(Media.pngBytes(grays, w, h, ct, adam7 = true))
      assert(seq.isDefined && il.isDefined, s"($w x $h, ct=$ct) must decode both ways")
      assert(seq.get.sameElements(il.get), s"($w x $h, ct=$ct) interlaced grays must match sequential")
    }
    // palette decodes to the same grays as the gray color type
    val g = Array.tabulate(32 * 32)(i => (i * 7) % 256)
    val gray = Media.RealPixelDecoder.decodeGray32(Media.pngBytes(g, 32, 32, 0)).get
    val pal = Media.RealPixelDecoder.decodeGray32(Media.pngBytes(g, 32, 32, 3)).get
    assert(gray.sameElements(pal))
    // cross-codec: the JDK's independent ImageIO codec reads our
    // palette and interlaced bytes back to the same grays
    for (bytes <- Seq(Media.pngBytes(g, 32, 32, 3),
        Media.pngBytes(g, 32, 32, 0, adam7 = true))) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      val viaImageIO = Array.tabulate(32 * 32) { i =>
        // raw raster sample — no color management; the identity-gray
        // palette makes index == gray, so band 0 IS the gray either way
        img.getRaster.getSample(i % 32, i / 32, 0).toDouble
      }
      val ours = Media.RealPixelDecoder.decodeGray32(bytes).get
      assert(viaImageIO.sameElements(ours), "ImageIO and our decoder must agree")
    }
  }

  test("syntheticPixelImage: every (format, scale) path of a pair hashes identically") {
    // cover all residue classes: k mod 60 spans colorType(4) ×
    // interlace(5) × scale(2) on the even member and the mod-6 cycle
    // on the odd member
    val sawCt = scala.collection.mutable.Set.empty[Int]
    var sawInterlaced = false
    for (k <- 0L to 59L) {
      val even = Media.syntheticPixelImage(2 * k)
      sawCt += (even(25) & 0xFF)
      if ((even(28) & 0xFF) == 1) sawInterlaced = true
      val a = Media.RealPixelDecoder.decodeGray32(even)
      val b = Media.RealPixelDecoder.decodeGray32(Media.syntheticPixelImage(2 * k + 1))
      assert(a.isDefined && b.isDefined, s"k=$k must decode on both sides")
      assert(Media.phash64(a.get) == Media.phash64(b.get), s"k=$k pair must collide")
      assert(a.get.sameElements(b.get), s"k=$k grays must be identical")
    }
    assert(sawCt == Set(0, 2, 6, 3), s"all four color types must be exercised: $sawCt")
    assert(sawInterlaced, "Adam7 renderings must be exercised")
  }

  test("phashPairs: byte-identical payloads pair at hamming 0; undecodable drop") {
    import spark.implicits._
    val a = Array.tabulate(64)(i => (i * 13 + 1).toByte)
    val b = Array.tabulate(64)(i => (i * 29 + 5).toByte)
    val rows = Seq(
      (1L, a), (2L, a.clone()),          // planted identical pair
      (3L, b),                           // unrelated
      (4L, Array.emptyByteArray))        // undecodable
      .toDF("media_id", "content")
    val pairs = Media.phashPairs(rows, col("media_id"), col("content"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.contains((1L, 2L, 0)), s"planted pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // signatures: only (doc_id, sig) leave the codec boundary
    val sigs = Media.phashSignatures(rows, col("media_id"), col("content"))
    assert(sigs.columns.toSeq == Seq("doc_id", "sig"))
    assert(sigs.count() == 3L)
  }
}
