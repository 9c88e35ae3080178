package graft.operators

/** Dependency-free baseline JPEG codec (ITU-T T.81, public spec) for
  * the pHash pixel path (SURVEY §2.5 L48).
  *
  * Most web-crawl images are JPEG; before this, [[Media.RealPixelDecoder]]
  * covered PNG/BMP only, so the dominant crawl format silently dropped
  * out of image near-dup (the r16 verdict's top capability gap). This
  * decoder covers BASELINE SEQUENTIAL DCT (SOF0, and SOF1's identical
  * 8-bit case): Annex B marker segments, Annex C canonical Huffman
  * construction, the F.2.2 entropy decoder with byte unstuffing and
  * restart markers, dequantization, inverse zigzag, a separable
  * double-precision 8×8 IDCT, and Y-plane assembly.
  *
  * Only the LUMA plane is materialized: pHash consumes gray, and
  * JPEG's Y channel IS the BT.601 luma the PNG/BMP paths compute from
  * RGB — so all three codecs meet on the same gray contract. Chroma
  * blocks are entropy-decoded (the interleaved MCU stream cannot be
  * advanced without them) but never dequantized or transformed.
  *
  * Out-of-subset → `None`, never a throw (the [[Media.HeaderDecoder]]
  * corrupt-tolerance discipline: a bad blob in 100 TB of crawl bytes
  * must not kill the job): progressive (SOF2) and arithmetic coding,
  * 12-bit precision, 16-bit quant tables, dims outside (0, 4096],
  * truncated or garbled streams.
  *
  * The encoder half exists for the gates/specs (the
  * [[Media.pngBytes]]/[[Media.bmpBytes]] precedent): baseline gray or
  * YCbCr 4:2:0, ALL-ONES quantization tables, the Annex K.3 standard
  * Huffman tables. With all-ones tables a flat 8×8 block round-trips
  * EXACTLY (its DCT is the lone integer DC = 8·(v−128); AC sums cancel
  * and quantize to zero), which is what lets the multimodal_phash_real
  * gate plant block-aligned patterns that cross JPEG's lossy boundary
  * bit-exactly — the verdict-prescribed fixture design.
  */
object Jpeg {

  // ------------------------------------------------------------------
  // Shared tables
  // ------------------------------------------------------------------

  /** Zigzag order: position k in the scan → raster index in the 8×8. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // T.81 Annex K.3 — the standard ("typical") Huffman tables. BITS is
  // 1-indexed by code length 1..16; HUFFVAL in code order.
  private val LumDcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val LumDcVals = Array.tabulate(12)(identity)
  private val ChmDcBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val ChmDcVals = Array.tabulate(12)(identity)
  private val LumAcBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val LumAcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)
  private val ChmAcBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val ChmAcVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)

  /** 8-point DCT basis with the C(0) = 1/√2 factor folded in:
    * Basis(u)(x) = a(u)·cos((2x+1)uπ/16). Built once per JVM (the
    * phashCosTab discipline). */
  private lazy val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val a = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    a * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  /** Control-flow exception for out-of-subset / corrupt input — caught
    * at the [[decodeYGray]] boundary and surfaced as None. */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  /** Canonical Huffman decode table (Annex C + F.2.2.3): min/max code
    * and value pointer per code length. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val huffVal = vals
    locally {
      var code = 0
      var p = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = p
        minCode(l) = code
        code += bits(l)
        p += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
      if (p != vals.length) bail()
    }
  }

  /** Entropy-segment bit reader: byte-unstuffing (FF00 → FF), stops at
    * any real marker; restart alignment per F.2.1.3.1. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0
    /** Set when the reader ran into a non-RST marker mid-read. */
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) bail()
        var b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= data.length) bail()
          val b2 = data(pos) & 0xFF
          if (b2 == 0x00) pos += 1 // stuffed FF data byte
          else bail() // real marker inside an entropy run we still need
        }
        cur = b
        cnt = 8
      }
      cnt -= 1
      (cur >>> cnt) & 1
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (code > t.maxCode(l)) {
        if (l >= 16) bail()
        code = (code << 1) | nextBit()
        l += 1
      }
      t.huffVal(t.valPtr(l) + code - t.minCode(l))
    }

    /** RECEIVE + EXTEND (F.2.2.1): read `s` magnitude bits, sign-extend. */
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }

    /** Consume an expected restart marker: drop partial bits, expect
      * FFD0+m at the byte position. Returns false on anything else. */
    def restart(m: Int): Boolean = {
      cnt = 0
      if (pos + 2 > data.length) return false
      val ok = (data(pos) & 0xFF) == 0xFF && (data(pos + 1) & 0xFF) == (0xD0 + m)
      if (ok) pos += 2
      ok
    }
  }

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0, var pred: Int = 0)

  /** Decode the luma plane of a baseline JPEG: `(grays, w, h)` with
    * grays row-major integer-valued doubles in [0, 255] (the
    * [[Media.RealPixelDecoder]] gray contract), or None when the
    * stream is out of subset or corrupt. */
  def decodeYGray(c: Array[Byte]): Option[(Array[Double], Int, Int)] = try {
    if (c == null || c.length < 4) return None
    if ((c(0) & 0xFF) != 0xFF || (c(1) & 0xFF) != 0xD8) return None

    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var yPlane: Array[Int] = null
    var yW = 0
    var yH = 0

    def be16(i: Int): Int = {
      if (i + 2 > c.length) bail()
      ((c(i) & 0xFF) << 8) | (c(i + 1) & 0xFF)
    }

    var pos = 2
    var done = false
    while (!done) {
      // seek the next marker (skip fill bytes)
      if (pos + 2 > c.length) bail()
      if ((c(pos) & 0xFF) != 0xFF) bail()
      while (pos < c.length && (c(pos) & 0xFF) == 0xFF) pos += 1
      if (pos >= c.length) bail()
      val marker = c(pos) & 0xFF
      pos += 1
      marker match {
        case 0xD9 => done = true // EOI
        case 0x01 => () // TEM, standalone
        case m if m >= 0xD0 && m <= 0xD7 => () // stray RST, standalone
        case 0xDB => // DQT
          val len = be16(pos)
          val end = pos + len
          var p = pos + 2
          while (p < end) {
            val pq = (c(p) & 0xF0) >> 4
            val tq = c(p) & 0x0F
            if (pq != 0 || tq > 3) bail() // 16-bit tables out of subset
            if (p + 65 > c.length) bail()
            qtabs(tq) = Array.tabulate(64)(k => c(p + 1 + k) & 0xFF)
            if (qtabs(tq).exists(_ == 0)) bail()
            p += 65
          }
          pos = end
        case 0xC4 => // DHT
          val len = be16(pos)
          val end = pos + len
          var p = pos + 2
          while (p < end) {
            val tc = (c(p) & 0xF0) >> 4
            val th = c(p) & 0x0F
            if (tc > 1 || th > 3) bail()
            if (p + 17 > c.length) bail()
            val bits = new Array[Int](17)
            var n = 0
            var l = 1
            while (l <= 16) { bits(l) = c(p + l) & 0xFF; n += bits(l); l += 1 }
            if (p + 17 + n > c.length || n > 256) bail()
            val vals = Array.tabulate(n)(k => c(p + 17 + k) & 0xFF)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + n
          }
          pos = end
        case 0xC0 | 0xC1 => // SOF0 / SOF1 (8-bit sequential)
          val len = be16(pos)
          if ((c(pos + 2) & 0xFF) != 8) bail() // precision
          h = be16(pos + 3)
          w = be16(pos + 5)
          if (w <= 0 || h <= 0 || w > 4096 || h > 4096) bail()
          val nf = c(pos + 7) & 0xFF
          if (nf < 1 || nf > 4 || len < 8 + 3 * nf) bail()
          comps = Array.tabulate(nf) { i =>
            val p = pos + 8 + 3 * i
            val hv = c(p + 1) & 0xFF
            val comp = Component(c(p) & 0xFF, (hv >> 4) & 0xF, hv & 0xF, c(p + 2) & 0x0F)
            if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4) bail()
            comp
          }
          pos += len
        case m if m >= 0xC2 && m <= 0xCF && m != 0xC4 =>
          return None // progressive, lossless, arithmetic, hierarchical
        case 0xDD => // DRI
          val len = be16(pos)
          restartInterval = be16(pos + 2)
          pos += len
        case 0xDA => // SOS — decode one scan
          if (comps == null) bail()
          val len = be16(pos)
          val ns = c(pos + 2) & 0xFF
          if (ns < 1 || ns > comps.length) bail()
          val scan = Array.tabulate(ns) { i =>
            val cid = c(pos + 3 + 2 * i) & 0xFF
            val tt = c(pos + 4 + 2 * i) & 0xFF
            val comp = comps.find(_.id == cid).getOrElse(bail())
            comp.td = (tt >> 4) & 0xF
            comp.ta = tt & 0xF
            comp.pred = 0
            comp
          }
          val hMax = comps.map(_.h).max
          val vMax = comps.map(_.v).max
          if (yPlane == null) {
            // luma = the first frame component (JFIF: id 1)
            val y = comps(0)
            yW = ceilDiv(w * y.h, hMax)
            yH = ceilDiv(h * y.v, vMax)
            yPlane = new Array[Int](ceilDiv(yW, 8) * 8 * ceilDiv(yH, 8) * 8)
          }
          val reader = new BitReader(c, pos + len)
          decodeScan(reader, scan, comps(0), w, h, hMax, vMax,
            restartInterval, qtabs, dcTabs, acTabs, yPlane, yW, yH)
          pos = reader.pos
        case _ => // APPn, COM, anything else with a length field
          val len = be16(pos)
          if (len < 2) bail()
          pos += len
      }
    }
    if (yPlane == null || w == 0) return None
    // crop the padded block grid to the component dims as doubles
    val stride = ceilDiv(yW, 8) * 8
    val out = new Array[Double](yW * yH)
    var y = 0
    while (y < yH) {
      var x = 0
      while (x < yW) { out(y * yW + x) = yPlane(y * stride + x).toDouble; x += 1 }
      y += 1
    }
    Some((out, yW, yH))
  } catch {
    case _: Bail => None
    case _: ArrayIndexOutOfBoundsException => None
  }

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Decode one scan's entropy data. Interleaved (Ns > 1) MCUs per
    * A.2.3; non-interleaved per A.2.2. Only `yComp` blocks are
    * dequantized + transformed into `yPlane`; other components are
    * entropy-decoded and dropped. */
  private def decodeScan(
      r: BitReader, scan: Array[Component], yComp: Component,
      w: Int, h: Int, hMax: Int, vMax: Int, ri: Int,
      qtabs: Array[Array[Int]], dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      yPlane: Array[Int], yW: Int, yH: Int): Unit = {

    val yBlocksW = ceilDiv(yW, 8)
    val yBlocksH = ceilDiv(yH, 8)
    val yStride = yBlocksW * 8
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)

    def decodeBlock(comp: Component, store: Boolean, bx: Int, by: Int): Unit = {
      val dcT = dcTabs(comp.td)
      val acT = acTabs(comp.ta)
      if (dcT == null || acT == null) bail()
      java.util.Arrays.fill(coef, 0)
      val q = qtabs(comp.tq)
      if (q == null) bail()
      val s = r.decodeHuff(dcT)
      if (s > 11) bail()
      comp.pred += r.receiveExtend(s)
      coef(0) = comp.pred * q(0)
      var k = 1
      var open = true
      while (open && k < 64) {
        val rs = r.decodeHuff(acT)
        val run = (rs >> 4) & 0xF
        val size = rs & 0xF
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else open = false // EOB
        } else {
          k += run
          if (k > 63) bail()
          coef(Zigzag(k)) = r.receiveExtend(size) * q(k)
          k += 1
        }
      }
      // padding MCU blocks past the component's block grid are
      // entropy-decoded (the stream interleaves them) but dropped
      if (store && bx < yBlocksW && by < yBlocksH) {
        idctToPlane(coef, tmp, yPlane, by * 8 * yStride + bx * 8, yStride)
      }
    }

    var nextRst = 0
    if (scan.length == 1) {
      val comp = scan(0)
      val cw = ceilDiv(w * comp.h, hMax)
      val ch = ceilDiv(h * comp.v, vMax)
      val bw = ceilDiv(cw, 8)
      val bh = ceilDiv(ch, 8)
      val isY = comp eq yComp
      var mcu = 0
      val total = bw * bh
      while (mcu < total) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          if (!r.restart(nextRst)) bail()
          nextRst = (nextRst + 1) & 7
          scan.foreach(_.pred = 0)
        }
        decodeBlock(comp, isY, mcu % bw, mcu / bw)
        mcu += 1
      }
    } else {
      val mcusW = ceilDiv(w, 8 * hMax)
      val mcusH = ceilDiv(h, 8 * vMax)
      var mcu = 0
      val total = mcusW * mcusH
      while (mcu < total) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          if (!r.restart(nextRst)) bail()
          nextRst = (nextRst + 1) & 7
          scan.foreach(_.pred = 0)
        }
        val mx = mcu % mcusW
        val my = mcu / mcusW
        var ci = 0
        while (ci < scan.length) {
          val comp = scan(ci)
          val isY = comp eq yComp
          var by = 0
          while (by < comp.v) {
            var bx = 0
            while (bx < comp.h) {
              decodeBlock(comp, isY, mx * comp.h + bx, my * comp.v + by)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
    }
  }

  /** Separable 8×8 inverse DCT (dequantized coefficients in raster
    * order) → level-shifted, clamped pixels written into the plane. */
  private def idctToPlane(
      coef: Array[Int], tmp: Array[Double],
      plane: Array[Int], base: Int, stride: Int): Unit = {
    val b = Basis
    // rows: g(v, x) = Σ_u F(v, u)·Basis(u)(x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * b(u)(x); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    // cols: p(y, x) = ¼·Σ_v g(v, x)·Basis(v)(y), then +128, clamp
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * b(vv)(y); vv += 1 }
        val p = math.round(0.25 * s + 128.0).toInt
        plane(base + y * stride + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------------
  // Encoder (fixtures/specs)
  // ------------------------------------------------------------------

  /** Canonical Huffman encode table: value → (code, length). */
  private final class HuffEnc(bits: Array[Int], vals: Array[Int]) {
    val codes = new Array[Int](256)
    val sizes = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l)) {
          codes(vals(k)) = code
          sizes(vals(k)) = l
          code += 1
          k += 1
          i += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0
          n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = {
      if (n > 0) {
        acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1) // pad with 1s
        out.write(acc & 0xFF)
        if ((acc & 0xFF) == 0xFF) out.write(0x00)
        acc = 0
        n = 0
      }
    }
  }

  private def magnitude(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Forward 8×8 DCT (double, rounded to nearest) of one level-shifted
    * block with all-ones quantization; emits zigzag-order coefficients. */
  private def fdctQuantOnes(px: Array[Int], zz: Array[Int]): Unit = {
    val b = Basis
    val tmp = new Array[Double](64)
    // rows: g(y, u) = Σ_x p'(y, x)·Basis(u)(x)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (px(y * 8 + x) - 128) * b(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var k = 0
    while (k < 64) {
      val r = Zigzag(k)
      val v = r / 8
      val u = r % 8
      var s = 0.0
      var yy = 0
      while (yy < 8) { s += tmp(yy * 8 + u) * b(v)(yy); yy += 1 }
      zz(k) = math.round(0.25 * s).toInt
      k += 1
    }
  }

  private def encodeBlock(
      bw: BitWriter, zz: Array[Int], pred: Int,
      dc: HuffEnc, ac: HuffEnc): Int = {
    val diff = zz(0) - pred
    val s = magnitude(diff)
    bw.put(dc.codes(s), dc.sizes(s))
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { bw.put(ac.codes(0xF0), ac.sizes(0xF0)); run -= 16 }
        val sz = magnitude(zz(k))
        val rs = (run << 4) | sz
        bw.put(ac.codes(rs), ac.sizes(rs))
        bw.put(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(ac.codes(0x00), ac.sizes(0x00)) // EOB
    zz(0)
  }

  private def writeSeg(o: java.io.ByteArrayOutputStream, marker: Int, body: Array[Int]): Unit = {
    o.write(0xFF); o.write(marker)
    val len = body.length + 2
    o.write((len >> 8) & 0xFF); o.write(len & 0xFF)
    body.foreach(b => o.write(b & 0xFF))
  }

  private def dqtOnes(o: java.io.ByteArrayOutputStream, tq: Int): Unit =
    writeSeg(o, 0xDB, Array(tq) ++ Array.fill(64)(1))

  private def dht(o: java.io.ByteArrayOutputStream, tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit =
    writeSeg(o, 0xC4, Array(tcTh) ++ bits.drop(1) ++ vals)

  /** Grayscale (1-component) baseline JPEG of `grays` with all-ones
    * quantization — flat 8×8 blocks round-trip exactly. Dims must be
    * multiples of 8 (the fixture contract; general JPEG pads edges,
    * which the exactness law doesn't need). `restartInterval` > 0
    * emits DRI + RSTn markers every that-many blocks (the decoder's
    * F.2.1.3.1 path needs a real fixture). */
  def encodeGray(grays: Array[Int], w: Int, h: Int, restartInterval: Int = 0): Array[Byte] = {
    require(grays.length == w * h, s"pixel count ${grays.length} != $w x $h")
    require(w % 8 == 0 && h % 8 == 0, s"fixture dims must be block-aligned: $w x $h")
    val o = new java.io.ByteArrayOutputStream()
    o.write(0xFF); o.write(0xD8) // SOI
    dqtOnes(o, 0)
    writeSeg(o, 0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF,
      1, /* comp id */ 1, 0x11, 0))
    dht(o, 0x00, LumDcBits, LumDcVals)
    dht(o, 0x10, LumAcBits, LumAcVals)
    if (restartInterval > 0)
      writeSeg(o, 0xDD, Array((restartInterval >> 8) & 0xFF, restartInterval & 0xFF))
    writeSeg(o, 0xDA, Array(1, 1, 0x00, 0, 63, 0))
    var bw = new BitWriter(o)
    val px = new Array[Int](64)
    val zz = new Array[Int](64)
    var pred = 0
    var rst = 0
    var mcu = 0
    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          o.write(0xFF); o.write(0xD0 + rst)
          rst = (rst + 1) & 7
          pred = 0
          bw = new BitWriter(o)
        }
        var i = 0
        while (i < 64) {
          px(i) = grays((by * 8 + i / 8) * w + bx * 8 + i % 8)
          i += 1
        }
        fdctQuantOnes(px, zz)
        pred = encodeBlock(bw, zz, pred, lumDcEnc, lumAcEnc)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    o.write(0xFF); o.write(0xD9) // EOI
    o.toByteArray
  }

  /** 3-component YCbCr 4:2:0 baseline JPEG of a GRAY image (R=G=B, so
    * Y = the gray exactly and Cb = Cr = 128 → all-zero chroma blocks);
    * all-ones quantization. Dims must be multiples of 16 (one MCU).
    * `restartInterval` > 0 emits DRI + RSTn every that-many MCUs. */
  def encodeGray420(grays: Array[Int], w: Int, h: Int, restartInterval: Int = 0): Array[Byte] = {
    require(grays.length == w * h, s"pixel count ${grays.length} != $w x $h")
    require(w % 16 == 0 && h % 16 == 0, s"fixture dims must be MCU-aligned: $w x $h")
    val o = new java.io.ByteArrayOutputStream()
    o.write(0xFF); o.write(0xD8)
    dqtOnes(o, 0)
    dqtOnes(o, 1)
    writeSeg(o, 0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    dht(o, 0x00, LumDcBits, LumDcVals)
    dht(o, 0x10, LumAcBits, LumAcVals)
    dht(o, 0x01, ChmDcBits, ChmDcVals)
    dht(o, 0x11, ChmAcBits, ChmAcVals)
    if (restartInterval > 0)
      writeSeg(o, 0xDD, Array((restartInterval >> 8) & 0xFF, restartInterval & 0xFF))
    writeSeg(o, 0xDA, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    var bw = new BitWriter(o)
    val px = new Array[Int](64)
    val zz = new Array[Int](64)
    val zeroZz = new Array[Int](64) // flat-128 chroma: all-zero coefficients
    var predY = 0
    var predCb = 0
    var predCr = 0
    var rst = 0
    val mcusW = w / 16
    val mcusH = h / 16
    var mcu = 0
    while (mcu < mcusW * mcusH) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        o.write(0xFF); o.write(0xD0 + rst)
        rst = (rst + 1) & 7
        predY = 0; predCb = 0; predCr = 0
        bw = new BitWriter(o)
      }
      val mx = mcu % mcusW
      val my = mcu / mcusW
      var by = 0
      while (by < 2) {
        var bx = 0
        while (bx < 2) {
          var i = 0
          while (i < 64) {
            px(i) = grays((my * 16 + by * 8 + i / 8) * w + mx * 16 + bx * 8 + i % 8)
            i += 1
          }
          fdctQuantOnes(px, zz)
          predY = encodeBlock(bw, zz, predY, lumDcEnc, lumAcEnc)
          bx += 1
        }
        by += 1
      }
      predCb = encodeBlock(bw, zeroZz, predCb, chmDcEnc, chmAcEnc)
      predCr = encodeBlock(bw, zeroZz, predCr, chmDcEnc, chmAcEnc)
      mcu += 1
    }
    bw.flush()
    o.write(0xFF); o.write(0xD9)
    o.toByteArray
  }

  private lazy val lumDcEnc = new HuffEnc(LumDcBits, LumDcVals)
  private lazy val lumAcEnc = new HuffEnc(LumAcBits, LumAcVals)
  private lazy val chmDcEnc = new HuffEnc(ChmDcBits, ChmDcVals)
  private lazy val chmAcEnc = new HuffEnc(ChmAcBits, ChmAcVals)
}
