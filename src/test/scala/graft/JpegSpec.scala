package graft

import graft.operators.{Jpeg, Media}

/** L48 JPEG pixel path: flat-block exactness through the lossy
  * boundary (the all-ones-quantization law), gray and 4:2:0 variants,
  * restart markers, padding MCUs, cross-validation BOTH WAYS against
  * the JDK's independent ImageIO codec, corrupt/truncation sweeps,
  * and the cross-codec pHash law with the PNG/BMP twins. */
class JpegSpec extends SparkSpec {

  private def flatBlocks(k: Long, w: Int, h: Int): Array[Int] = {
    // every 8x8 block flat: value from the splitmix-derived pattern
    val base = Media.syntheticPixelPattern(k)
    Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      base(((y / 8) % 32) * 32 + (x / 8) % 32)
    }
  }

  test("gray round trip: flat 8x8 blocks survive encode->decode bit-exactly") {
    for (k <- 0L to 3L) {
      val px = flatBlocks(k, 64, 48)
      val got = Jpeg.decodeYGray(Jpeg.encodeGray(px, 64, 48))
      assert(got.isDefined)
      val (g, w, h) = got.get
      assert(w == 64 && h == 48)
      assert(g.map(_.toInt).sameElements(px), s"k=$k grays must round-trip exactly")
    }
  }

  test("4:2:0 round trip: luma exact, flat chroma transparent, interleaved MCUs") {
    val px = flatBlocks(5L, 64, 64)
    val (g, w, h) = Jpeg.decodeYGray(Jpeg.encodeGray420(px, 64, 64)).get
    assert(w == 64 && h == 64)
    assert(g.map(_.toInt).sameElements(px))
  }

  test("restart markers: DRI/RSTn streams decode identically, gray and 4:2:0") {
    val px = flatBlocks(9L, 64, 64)
    val plain = Jpeg.decodeYGray(Jpeg.encodeGray(px, 64, 64)).get._1
    for (ri <- Seq(1, 3, 7)) {
      val rst = Jpeg.decodeYGray(Jpeg.encodeGray(px, 64, 64, restartInterval = ri)).get._1
      assert(rst.sameElements(plain), s"gray ri=$ri")
    }
    val plain420 = Jpeg.decodeYGray(Jpeg.encodeGray420(px, 64, 64)).get._1
    for (ri <- Seq(1, 3)) {
      val rst = Jpeg.decodeYGray(Jpeg.encodeGray420(px, 64, 64, restartInterval = ri)).get._1
      assert(rst.sameElements(plain420), s"420 ri=$ri")
    }
  }

  test("non-flat content round-trips within quantization tolerance") {
    // a gradient is NOT block-flat: with all-ones tables the error is
    // bounded by DCT rounding (±1 per pixel in practice)
    val px = Array.tabulate(64 * 64)(i => (i / 64 + i % 64) % 256)
    val (g, _, _) = Jpeg.decodeYGray(Jpeg.encodeGray(px, 64, 64)).get
    val maxErr = g.map(_.toInt).zip(px).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 1, s"max per-pixel error $maxErr")
  }

  test("cross-validation: the JDK ImageIO codec reads our fixture bytes back") {
    val px = flatBlocks(11L, 64, 64)
    for ((name, bytes) <- Seq(
        "gray" -> Jpeg.encodeGray(px, 64, 64),
        "420" -> Jpeg.encodeGray420(px, 64, 64))) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"$name: ImageIO must accept the stream")
      assert(img.getWidth == 64 && img.getHeight == 64)
      var maxErr = 0
      var i = 0
      val raster = img.getRaster
      while (i < px.length) {
        // raw code values — getRGB would route a gray-colorspace image
        // through the linear-gray -> sRGB transform (gamma)
        val lum = raster.getSample(i % 64, i / 64, 0)
        maxErr = maxErr max math.abs(lum - px(i))
        i += 1
      }
      // ImageIO's IDCT and (for 420) chroma upsampling differ from
      // ours; flat blocks with ones-quantization still land within a
      // couple of codes
      assert(maxErr <= 2, s"$name: ImageIO disagrees by $maxErr")
    }
  }

  test("cross-validation: our decoder reads an ImageIO-written real-world JPEG") {
    // ImageIO writes a baseline JFIF (APP0, real quant tables, 4:2:0
    // for RGB input) — an INDEPENDENT encoder driving our decoder
    val w = 80; val h = 56 // deliberately not MCU-aligned: padding MCUs
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      if (((x / 8) + (y / 8)) % 2 == 0) 200 else 60
    }
    for (i <- px.indices) img.setRGB(i % w, i / w, px(i) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val got = Jpeg.decodeYGray(bos.toByteArray)
    assert(got.isDefined, "must decode the ImageIO stream")
    val (g, gw, gh) = got.get
    assert(gw == w && gh == h)
    // lossy + default quality: require the structure, not exact codes
    val err = g.map(_.toInt).zip(px).map { case (a, b) => math.abs(a - b) }
    assert(err.sum.toDouble / err.length < 8.0, s"mean err ${err.sum.toDouble / err.length}")
  }

  test("corrupt/unsupported payloads degrade to None, never a throw") {
    val good = Jpeg.encodeGray(flatBlocks(1L, 64, 64), 64, 64)
    assert(Jpeg.decodeYGray(good).isDefined)
    assert(Jpeg.decodeYGray(null).isEmpty)
    assert(Jpeg.decodeYGray(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decodeYGray("nope".getBytes).isEmpty)
    // truncation at every interesting boundary
    for (cut <- Seq(2, 10, 30, good.length / 2, good.length - 3))
      assert(Jpeg.decodeYGray(good.take(cut)).isEmpty, s"cut=$cut")
    // progressive SOF2 is out of subset: flip the SOF marker
    val prog = good.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(Jpeg.decodeYGray(prog).isEmpty)
    // garbled entropy data must not throw either
    val garbled = good.clone()
    for (i <- good.length - 20 until good.length - 4) garbled(i) = 0x55
    Jpeg.decodeYGray(garbled) // any Option is fine; no exception
    // header-only synthetic container (multimodal_real payloads)
    assert(Jpeg.decodeYGray(Media.syntheticContainer(1L)).isEmpty ||
      Media.syntheticContainer(1L)(0) != 0xFF.toByte)
  }

  test("cross-codec law: JPEG-routed pairs decode to the SAME grays as their PNG twins") {
    // odd ids with k mod 4 = 1 (gray JPEG) and 2 (4:2:0 JPEG): their
    // even twins are PNGs of the same pattern
    var sawGray = false
    var saw420 = false
    for (k <- 0L to 15L) {
      val routed = java.lang.Math.floorMod(k, 4L)
      if (routed == 1L || routed == 2L) {
        val png = Media.RealPixelDecoder.decodeGray32(Media.syntheticPixelImage(2 * k)).get
        val jpg = Media.RealPixelDecoder.decodeGray32(Media.syntheticPixelImage(2 * k + 1)).get
        assert(png.sameElements(jpg), s"k=$k JPEG twin must decode to the PNG grays")
        assert(Media.phash64(png) == Media.phash64(jpg))
        if (routed == 1L) sawGray = true else saw420 = true
      }
    }
    assert(sawGray && saw420, "both JPEG variants must be exercised")
  }
}
