package graft.hashing

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Row-level hashing kernels for the dedup operators (SURVEY §2.5
  * L2/L3). Called from codegen'd Catalyst expressions
  * ([[graft.plans.MinHashSigExpr]] / [[graft.plans.SimHash64Expr]]), so
  * each is a single static call per row with tight JVM loops inside —
  * one pass over the token array, no per-element boxing.
  *
  * Re-expresses the minhash/simhash text-dedup recipes from the
  * published near-dup literature (Broder '97 minhash; Charikar '02
  * simhash) on Spark's own XXH64 kernel.
  */
object MinHashUtil {

  private final val Seed1 = 0x9E3779B97F4A7C15L
  private final val Seed2 = 0xC2B2AE3D27D4EB4FL

  /** k-permutation minhash signature of a string array in ONE pass:
    * two base xxhash64 values per element, then h_j = h1 + j·h2
    * (Kirsch–Mitzenmacher double hashing — standard public technique,
    * avoids k independent hash passes over the array). */
  def signature(tokens: ArrayData, numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
        var j = 0
        var h = h1
        while (j < numHashes) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Minhash + LSH banding fused into ONE pass: the k-hash signature is
    * computed as in [[signature]], then each of `bands` contiguous
    * signature slices is folded into a single 64-bit bucket key
    * (seeded by the band index so bands are decorrelated).
    *
    * Fused because the two-step form (signature expression, then a
    * `transform` lambda hashing each slice) re-evaluates the signature
    * once PER BAND after Catalyst collapses the projections — lambda
    * re-evaluation is invisible to CollapseProject's reference counting,
    * a 64× slowdown measured at sf0.1. */
  def bandBuckets(tokens: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val n = tokens.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
        var j = 0
        var h = h1
        while (j < numHashes) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var j = 0
      while (j < r) { h = XXH64.hashLong(mins(b * r + j), h); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Shingling kernel: word k-shingles from a token array in one pass.
  * The higher-order-function formulation (`transform(sequence(...),
  * i => concat_ws(slice(toks, i, k)))`) re-evaluates the token
  * subexpression once PER SHINGLE — tokenization ran ~80× per document,
  * 6.4 s for 5000 docs at sf0.1. Here the token array is the expression
  * child (evaluated once) and the join loop is tight JVM code. */
object ShingleUtil {
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  /** k-shingles: ["a b c", "b c d", ...]; shorter inputs collapse to the
    * single whole-text shingle (same contract as the SQL mirror). */
  def shingles(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      i += 1
    }
    if (n >= k) {
      val out = new Array[Any](n - k + 1)
      var s = 0
      while (s <= n - k) {
        out(s) = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, s, s + k): _*)
        s += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array[Any](UTF8String.concatWs(Space, toks: _*)))
    }
  }
}

/** Vector kernels for the ANN/embedding operators — called from
  * codegen'd expressions, one tight pass per row, no boxing. */
object VecUtil {

  /** Cosine as dot/(‖a‖·‖b‖), double accumulation left-to-right —
    * bit-identical to the documented oracle formula. Mismatched lengths
    * throw (reading past numElements on UnsafeArrayData is an unsafe
    * out-of-bounds read — silent garbage or a JVM crash); a zero-norm
    * side yields NaN, which [[org.apache.spark.sql.graftexpr.CosineSimExpr]]
    * maps to SQL NULL so it can never outrank real scores in top-k. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_sim: array length mismatch ($n vs ${b.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) Double.NaN else dot / denom
  }

  /** Top-`top` centroid ids for `v` by cosine, given UNIT-normalized
    * centroids flattened [cid][dim]. Ranking by the raw dot product
    * equals ranking by cosine when every centroid has norm 1 (the row's
    * own norm is a shared positive factor), so assignment is ONE
    * k·dim pass — no per-row norm recomputation. Ties break to the
    * smaller cid (iteration order + strict insert), deterministically.
    * The output is truncated to the FILLED prefix: an all-NaN vector
    * inserts nothing and yields an empty list (so degenerate rows join
    * no inverted list), never Int.MinValue sentinel "ids" — callers
    * rely on every returned id being a real, distinct centroid. */
  def topCentroids(v: ArrayData, centroids: Array[Double], dim: Int, top: Int, isFloat: Boolean): ArrayData = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"centroid_ids: vector length ${v.numElements()} != quantizer dim $dim")
    val k = centroids.length / dim
    val n = math.min(top, k)
    val bestDot = new Array[Double](n)
    val bestCid = new Array[Int](n)
    java.util.Arrays.fill(bestDot, Double.NegativeInfinity)
    java.util.Arrays.fill(bestCid, Int.MinValue)
    var c = 0
    while (c < k) {
      var dot = 0.0
      var d = 0
      val off = c * dim
      while (d < dim) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        dot += x * centroids(off + d)
        d += 1
      }
      // insertion into the running top-n, ordered (dot desc, cid asc)
      if (dot > bestDot(n - 1)) {
        var i = n - 1
        while (i > 0 && dot > bestDot(i - 1)) {
          bestDot(i) = bestDot(i - 1); bestCid(i) = bestCid(i - 1); i -= 1
        }
        bestDot(i) = dot; bestCid(i) = c
      }
      c += 1
    }
    var filled = 0
    while (filled < n && bestCid(filled) != Int.MinValue) filled += 1
    if (filled == n) new GenericArrayData(bestCid)
    else new GenericArrayData(java.util.Arrays.copyOf(bestCid, filled))
  }

  /** Product-quantization encode: unit-normalize `v`, then per subspace
    * the L2-nearest codebook row. `codebooks` is flattened
    * [sub][code][subDim]; output is `m` code ids (ints in [0, k)).
    * Ties break to the smaller code (strict `<`), deterministically.
    * A degenerate vector (zero norm / NaN) returns an EMPTY array —
    * callers filter on size, mirroring [[topCentroids]]'s contract. */
  def pqEncode(v: ArrayData, codebooks: Array[Double], m: Int, subDim: Int, k: Int, isFloat: Boolean): ArrayData = {
    val dim = m * subDim
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${v.numElements()} != m*subDim $dim")
    var n2 = 0.0
    var i = 0
    while (i < dim) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      n2 += x * x; i += 1
    }
    val norm = math.sqrt(n2)
    if (norm == 0.0 || java.lang.Double.isNaN(norm))
      return new GenericArrayData(Array.empty[Int])
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (s * k + c) * subDim
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val x = if (isFloat) v.getFloat(s * subDim + d).toDouble else v.getDouble(s * subDim + d)
          val diff = x / norm - codebooks(off + d)
          d2 += diff * diff; d += 1
        }
        if (d2 < bd) { bd = d2; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC lookup table for one probe: lut[s·k + c] = dot(probe_sub_s /
    * ‖probe‖, codebook[s][c]). With data vectors PQ-encoded at unit
    * norm, Σ_s lut[s][code_s] ≈ cosine(probe, v) — the O(m)-per-pair
    * approximate score. Degenerate probes return an EMPTY array. */
  def pqLut(v: ArrayData, codebooks: Array[Double], m: Int, subDim: Int, k: Int, isFloat: Boolean): ArrayData = {
    val dim = m * subDim
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"pq_lut: vector length ${v.numElements()} != m*subDim $dim")
    var n2 = 0.0
    var i = 0
    while (i < dim) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      n2 += x * x; i += 1
    }
    val norm = math.sqrt(n2)
    if (norm == 0.0 || java.lang.Double.isNaN(norm))
      return new GenericArrayData(Array.empty[Double])
    val lut = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val off = (s * k + c) * subDim
        var dot = 0.0
        var d = 0
        while (d < subDim) {
          val x = if (isFloat) v.getFloat(s * subDim + d).toDouble else v.getDouble(s * subDim + d)
          dot += (x / norm) * codebooks(off + d)
          d += 1
        }
        lut(s * k + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }

  /** ADC score: Σ_s lut[s·k + codes_s]. Empty codes, a LUT of the
    * wrong shape, or a code value outside [0, k) — codes written by a
    * quantizer with a different k whose LUT is size-coincident — all
    * yield NaN (the expression maps it to SQL NULL, which can never
    * outrank real scores — same contract as [[cosine]]), never an
    * executor ArrayIndexOutOfBoundsException. */
  def pqAdc(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    if (m == 0 || lut.numElements() != m * k) return Double.NaN
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= k) return Double.NaN
      acc += lut.getDouble(s * k + c)
      s += 1
    }
    acc
  }

  /** All sign-LSH tables in one pass: `planes` is the flattened
    * [table][bit][dim] hyperplane tensor; output = one bucket id per
    * table (bit p set iff dot(v, plane_p) ≥ 0). */
  def hyperplaneBuckets(
      v: ArrayData, planes: Array[Double], tables: Int, bits: Int, isFloat: Boolean): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < bits) {
        val off = (t * bits + p) * dim
        var dot = 0.0
        var d = 0
        while (d < dim) {
          val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          dot += x * planes(off + d)
          d += 1
        }
        if (dot >= 0.0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** PCA projection: center `v` on the mean then take k dot products,
    * each an ASCENDING-index fold from 0.0 — the exact IEEE chain the
    * SQL oracle (and the old `zip_with`+`aggregate` HOF form) compute,
    * so swapping the interpreted chain for this kernel is
    * bit-invisible. `mc` packs `[mean(d) :: comp_0(d) :: … ::
    * comp_{k-1}(d)]` as ONE flat reference array. Faithful to the HOF
    * chain's edge semantics: a wrong-length vector or one with NULL
    * elements yields k NULL components (zip_with padding / null
    * arithmetic did the same); NaN elements propagate to NaN
    * components. */
  def pcaProject(v: ArrayData, mc: Array[Double], d: Int, k: Int, isFloat: Boolean): ArrayData = {
    if (v.numElements() != d) return new GenericArrayData(new Array[Any](k))
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) return new GenericArrayData(new Array[Any](k))
      i += 1
    }
    val centered = new Array[Double](d)
    i = 0
    while (i < d) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      centered(i) = x - mc(i)
      i += 1
    }
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = (c + 1) * d
      var s = 0.0
      var j = 0
      while (j < d) { s += centered(j) * mc(off + j); j += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }
}

object SimHashUtil {

  private final val Seed = 0x27D4EB2F165667C5L

  /** 64-bit simhash of a string array in one pass: per-element xxhash64,
    * each bit votes ±1, sign of the vote vector becomes the output bit. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Token-set membership kernel for the retrieval operators
  * ([[graft.operators.Bm25]] score): filter a token array to the
  * elements of a fixed keep-set in ONE tight pass, preserving
  * duplicates and order (term frequency must survive, so
  * `array_intersect` — which dedups — cannot express this). The
  * lambda form (`filter(toks, t => t.isin(query: _*))`) evaluates an
  * INTERPRETED predicate per token with an O(|query|) scan per call —
  * on the one full-corpus scan BM25 scoring pays, that is a measured
  * CPU tax; here it is one hash-set probe per token inside codegen. */
object TokenSetUtil {
  import org.apache.spark.unsafe.types.UTF8String

  /** Elements of `tokens` present in `set` (duplicates kept, order
    * kept; null elements never match). */
  def keep(tokens: ArrayData, set: java.util.HashSet[UTF8String]): ArrayData = {
    val n = tokens.numElements()
    val buf = new java.util.ArrayList[Any](math.min(n, 16))
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (set.contains(t)) buf.add(t)
      }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }
}

/** Fused hashed-n-gram bucket kernel for the DSIR feature space
  * ([[graft.operators.Dsir.bucketsOfTokens]] — unigrams + consecutive
  * bigrams of the normalized tokens, each mapped into `buckets`
  * buckets). Replaces the `transform(concat(toks, bigrams(toks)), g =>
  * hash(g) % buckets)` HOF chain: that form materializes every bigram
  * as a UTF8String concat, and the md5 branch additionally renders a
  * 32-char hex string, substrings it and re-parses it with `conv` —
  * four string allocations per gram. Here the grams never materialize:
  * per token one cached byte array, per bigram a digest/buffer update
  * over (left, ' ', right), and the bucket id is read straight off the
  * hash bytes. BIT-IDENTICAL to the HOF chain by construction — the
  * md5 path hashes the same UTF-8 bytes and takes the same first-8-hex
  * -chars value (= the digest's first 4 bytes as an unsigned 32-bit
  * int); the xx path is the same XXH64(seed 42) + pmod — asserted
  * exhaustively in GramBucketsSpec.
  *
  * Null-element contract (never occurs from [[graft.operators
  * .NgramLM.tokens]], which filters empties from a split) mirrors the
  * HOF chain exactly: md5 of a NULL gram is NULL → NULL element; the
  * xxhash64 expression SKIPS null inputs leaving the seed, so a null
  * gram yields pmod(42, buckets). */
object GramBucketUtil {

  private final val XxSeed = 42L // spark.sql.functions.xxhash64's fixed seed

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 hex chars of the digest as an unsigned 32-bit value —
    * exactly `conv(substring(md5(g), 1, 8), 16, 10)` — mod buckets. */
  private def md5Bucket(d: Array[Byte], buckets: Int): Long =
    (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % buckets

  def bucketsMd5(tokens: ArrayData, buckets: Int): ArrayData = {
    val n = tokens.numElements()
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](n + (if (n >= 2) n - 1 else 0))
    val md = Md5.get()
    i = 0
    while (i < n) {
      if (tb(i) == null) out(i) = null
      else {
        md.reset()
        md.update(tb(i))
        out(i) = md5Bucket(md.digest(), buckets)
      }
      i += 1
    }
    i = 0
    while (i < n - 1) {
      if (tb(i) == null || tb(i + 1) == null) out(n + i) = null
      else {
        md.reset()
        md.update(tb(i))
        md.update(' '.toByte)
        md.update(tb(i + 1))
        out(n + i) = md5Bucket(md.digest(), buckets)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def bucketsXx(tokens: ArrayData, buckets: Int): ArrayData = {
    val n = tokens.numElements()
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val b = buckets.toLong
    def pmod(h: Long): Long = { val r = h % b; if (r < 0) r + b else r }
    val out = new Array[Any](n + (if (n >= 2) n - 1 else 0))
    i = 0
    while (i < n) {
      out(i) =
        if (tb(i) == null) pmod(XxSeed) // xxhash64 skips null input
        else pmod(XXH64.hashUnsafeBytes(
          tb(i), org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, tb(i).length, XxSeed))
      i += 1
    }
    var buf = new Array[Byte](64)
    i = 0
    while (i < n - 1) {
      val a = tb(i); val c = tb(i + 1)
      out(n + i) =
        if (a == null || c == null) pmod(XxSeed) // null gram: hash skips it
        else {
          val len = a.length + 1 + c.length
          if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
          System.arraycopy(a, 0, buf, 0, a.length)
          buf(a.length) = ' '.toByte
          System.arraycopy(c, 0, buf, a.length + 1, c.length)
          pmod(XXH64.hashUnsafeBytes(
            buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, XxSeed))
        }
      i += 1
    }
    new GenericArrayData(out)
  }
}
