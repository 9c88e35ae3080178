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
    // a BASELINE stream mislabeled SOF2 is malformed progressive (its
    // SOS says Ss=0, Se=63 — not a valid progressive band): None
    val prog = good.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(Jpeg.decodeYGray(prog).isEmpty)
    // lossless/arithmetic SOF codes stay out of subset
    for (m <- Seq(0xC3, 0xC9, 0xCB)) {
      val bad = good.clone()
      bad(sof + 1) = m.toByte
      assert(Jpeg.decodeYGray(bad).isEmpty, f"SOF $m%02x")
    }
    // garbled entropy data must not throw either
    val garbled = good.clone()
    for (i <- good.length - 20 until good.length - 4) garbled(i) = 0x55
    Jpeg.decodeYGray(garbled) // any Option is fine; no exception
    // header-only synthetic container (multimodal_real payloads)
    assert(Jpeg.decodeYGray(Media.syntheticContainer(1L)).isEmpty ||
      Media.syntheticContainer(1L)(0) != 0xFF.toByte)
  }

  test("cross-codec law: JPEG-routed pairs decode to the SAME grays as their PNG twins") {
    // odd ids with k mod 6 in {1, 2, 4, 5} route through JPEG (baseline
    // gray / baseline 4:2:0 / progressive gray / progressive 4:2:0);
    // their even twins are PNGs of the same pattern
    val sawRoutes = scala.collection.mutable.Set.empty[Long]
    for (k <- 0L to 23L) {
      val routed = java.lang.Math.floorMod(k, 6L)
      if (routed == 1L || routed == 2L || routed == 4L || routed == 5L) {
        val png = Media.RealPixelDecoder.decodeGray32(Media.syntheticPixelImage(2 * k)).get
        val jpg = Media.RealPixelDecoder.decodeGray32(Media.syntheticPixelImage(2 * k + 1)).get
        assert(png.sameElements(jpg), s"k=$k JPEG twin must decode to the PNG grays")
        assert(Media.phash64(png) == Media.phash64(jpg))
        sawRoutes += routed
      }
    }
    assert(sawRoutes == Set(1L, 2L, 4L, 5L), s"all four JPEG variants must be exercised: $sawRoutes")
  }

  // ------------------------------------------------------------------
  // Progressive (SOF2)
  // ------------------------------------------------------------------

  test("progressive gray round trip: spectral-selection script, flat blocks exact") {
    for (k <- 0L to 3L) {
      val px = flatBlocks(k, 64, 48)
      val got = Jpeg.decodeYGray(Jpeg.encodeGrayProgressive(px, 64, 48))
      assert(got.isDefined, s"k=$k")
      val (g, w, h) = got.get
      assert(w == 64 && h == 48)
      assert(g.map(_.toInt).sameElements(px), s"k=$k progressive grays must round-trip exactly")
    }
  }

  test("progressive gray: successive-approximation script (DC/AC refine scans) exact") {
    val px = flatBlocks(7L, 64, 64)
    val (g, w, h) = Jpeg.decodeYGray(Jpeg.encodeGrayProgressive(px, 64, 64, useSA = true)).get
    assert(w == 64 && h == 64)
    assert(g.map(_.toInt).sameElements(px))
    // SA script rejects non-flat content (the documented fixture contract)
    val grad = Array.tabulate(64 * 64)(i => (i / 64 + i % 64) % 256)
    intercept[IllegalArgumentException] {
      Jpeg.encodeGrayProgressive(grad, 64, 64, useSA = true)
    }
  }

  test("refinement scan with Ah != Al+1 is out of subset: None, not wrong pixels") {
    // G.1.1.1.2: successive approximation refines one bit per scan, so
    // a refinement scan must carry Ah == Al + 1; a crafted script that
    // violates it takes the documented None path instead of decoding
    // to bounded-but-wrong pixels
    val sa = Jpeg.encodeGrayProgressive(flatBlocks(3L, 64, 64), 64, 64, useSA = true)
    assert(Jpeg.decodeYGray(sa).isDefined)
    val bad = sa.clone()
    var patched = false
    var i = 0
    while (i < bad.length - 1 && !patched) {
      // entropy data byte-stuffs FF as FF 00, so FF DA is always a real SOS
      if ((bad(i) & 0xFF) == 0xFF && (bad(i + 1) & 0xFF) == 0xDA) {
        val ns = bad(i + 4) & 0xFF
        val ahalIx = i + 7 + 2 * ns
        val ah = (bad(ahalIx) & 0xFF) >> 4
        val al = bad(ahalIx) & 0x0F
        if (ah != 0) { bad(ahalIx) = (((al + 2) << 4) | al).toByte; patched = true }
      }
      i += 1
    }
    assert(patched, "SA fixture must contain a refinement scan")
    assert(Jpeg.decodeYGray(bad).isEmpty, "Ah != Al+1 must degrade to None")
  }

  test("progressive non-flat content matches the baseline decode exactly") {
    // same fdct, same all-ones quantization, same idct — the spectral
    // split must be arithmetic-transparent, so progressive == baseline
    // bit-for-bit even where both differ from the source by rounding
    val px = Array.tabulate(64 * 64)(i => (i * 37 + (i / 64) * 11) % 256)
    val base = Jpeg.decodeYGray(Jpeg.encodeGray(px, 64, 64)).get._1
    val prog = Jpeg.decodeYGray(Jpeg.encodeGrayProgressive(px, 64, 64)).get._1
    assert(prog.sameElements(base))
  }

  test("progressive restarts: DRI + per-scan RSTn decode identically") {
    val px = flatBlocks(13L, 64, 64)
    val plain = Jpeg.decodeYGray(Jpeg.encodeGrayProgressive(px, 64, 64)).get._1
    for (ri <- Seq(1, 3, 7)) {
      val rst = Jpeg.decodeYGray(
        Jpeg.encodeGrayProgressive(px, 64, 64, restartInterval = ri)).get._1
      assert(rst.sameElements(plain), s"ri=$ri")
      val sa = Jpeg.decodeYGray(
        Jpeg.encodeGrayProgressive(px, 64, 64, useSA = true, restartInterval = ri)).get._1
      assert(sa.sameElements(plain), s"SA ri=$ri")
    }
  }

  test("progressive 4:2:0: interleaved DC scan + chroma AC scans, luma exact") {
    val px = flatBlocks(17L, 64, 64)
    val (g, w, h) = Jpeg.decodeYGray(Jpeg.encodeGray420Progressive(px, 64, 64)).get
    assert(w == 64 && h == 64)
    assert(g.map(_.toInt).sameElements(px))
    // non-flat luma: must equal the baseline 4:2:0 decode bit-for-bit
    val px2 = Array.tabulate(64 * 64)(i => (i * 53 + (i / 64) * 29) % 256)
    val base = Jpeg.decodeYGray(Jpeg.encodeGray420(px2, 64, 64)).get._1
    val prog = Jpeg.decodeYGray(Jpeg.encodeGray420Progressive(px2, 64, 64)).get._1
    assert(prog.sameElements(base))
  }

  test("cross-validation: ImageIO reads our progressive bytes; we read ImageIO progressive") {
    // our progressive stream through the JDK's independent decoder
    val px = flatBlocks(19L, 64, 64)
    for ((name, bytes) <- Seq(
        "prog-gray" -> Jpeg.encodeGrayProgressive(px, 64, 64),
        "prog-sa" -> Jpeg.encodeGrayProgressive(px, 64, 64, useSA = true),
        "prog-420" -> Jpeg.encodeGray420Progressive(px, 64, 64))) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"$name: ImageIO must accept the stream")
      var maxErr = 0
      val raster = img.getRaster
      for (i <- px.indices)
        maxErr = maxErr max math.abs(raster.getSample(i % 64, i / 64, 0) - px(i))
      assert(maxErr <= 2, s"$name: ImageIO disagrees by $maxErr")
    }
    // an ImageIO-WRITTEN progressive stream (the JDK writer's own
    // multi-scan SA script over real quant tables) through our decoder,
    // cross-checked against ImageIO's own read-back of the same bytes
    val w = 80; val h = 56 // padding MCUs too
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (i <- 0 until w * h) {
      val y = i / w; val x = i % w
      img.getRaster.setSample(x, y, 0, (x * 3 + y * 5 + (x / 8) * 40) % 256)
    }
    val ios = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
    assert(ios.hasNext)
    val writer = ios.next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val mos = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(mos)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); mos.close()
    val bytes = bos.toByteArray
    // confirm the writer actually produced SOF2
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC2),
      "fixture must be progressive")
    val got = Jpeg.decodeYGray(bytes)
    assert(got.isDefined, "must decode the ImageIO progressive stream")
    val (g, gw, gh) = got.get
    assert(gw == w && gh == h)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxErr = 0
    for (i <- 0 until w * h)
      maxErr = maxErr max math.abs(
        g(i).toInt - back.getRaster.getSample(i % w, i / w, 0))
    // both decoders read the SAME lossy stream; only IDCT rounding may differ
    assert(maxErr <= 1, s"progressive decode disagrees with ImageIO by $maxErr")
  }

  test("mutation fuzz: single-byte corruption anywhere never throws, across all codecs") {
    // the 100 TB contract in distilled form: every decode path holds
    // the Bail discipline under arbitrary bit damage — seeded, so a
    // counterexample reproduces
    val px = flatBlocks(21L, 64, 64)
    val fixtures = Seq(
      "base-gray" -> Jpeg.encodeGray(px, 64, 64, restartInterval = 3),
      "base-420" -> Jpeg.encodeGray420(px, 64, 64, restartInterval = 3),
      "prog-gray" -> Jpeg.encodeGrayProgressive(px, 64, 64),
      "prog-sa" -> Jpeg.encodeGrayProgressive(px, 64, 64, useSA = true, restartInterval = 5),
      "prog-420" -> Jpeg.encodeGray420Progressive(px, 64, 64))
    val rng = new scala.util.Random(77)
    for ((name, bytes) <- fixtures; trial <- 1 to 120) {
      val b = bytes.clone()
      val i = rng.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rng.nextInt(8))).toByte
      try Jpeg.decodeYGray(b) // any Option is acceptable; a throw is a bug
      catch { case e: Throwable =>
        fail(s"$name trial $trial flipped byte $i: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("truncated progressive streams degrade to None, never a throw") {
    val good = Jpeg.encodeGrayProgressive(flatBlocks(3L, 64, 64), 64, 64, useSA = true)
    assert(Jpeg.decodeYGray(good).isDefined)
    for (cut <- Seq(10, 30, good.length / 3, good.length / 2, good.length - 3))
      assert(Jpeg.decodeYGray(good.take(cut)).isEmpty, s"cut=$cut")
    val garbled = good.clone()
    for (i <- good.length - 20 until good.length - 4) garbled(i) = 0x55
    Jpeg.decodeYGray(garbled) // any Option; no exception
  }
}
