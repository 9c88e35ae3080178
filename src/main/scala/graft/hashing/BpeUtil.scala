package graft.hashing

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation kernel (Sennrich 2016 character-level merges) —
  * called from the codegen'd [[org.apache.spark.sql.graftexpr.BpeCountExpr]]
  * / `BpeSegmentsExpr`: one tight pass per word with a per-THREAD
  * word→pieces memo (the reference object is shared by every task
  * thread running the same codegen'd plan, so the memo must be
  * ThreadLocal; the rank table itself is frozen after construction).
  * Zipf makes the memo hit rate extreme — the hot path is one HashMap
  * probe per word occurrence. */
object BpeUtil {

  private val Sep = " " // symbols never contain spaces (whitespace-split tokens)

  /** Frozen merge-rank table + per-thread segmentation memo. */
  final class Table(mergesFlat: Array[String]) extends Serializable {
    require(mergesFlat.length % 2 == 0, "merges must be (left, right) pairs")
    private val rank = new java.util.HashMap[String, Integer](mergesFlat.length)
    locally {
      var i = 0
      while (i < mergesFlat.length / 2) {
        // first occurrence of a pair keeps the lower (earlier) rank
        rank.putIfAbsent(mergesFlat(2 * i) + Sep + mergesFlat(2 * i + 1), Integer.valueOf(i))
        i += 1
      }
    }

    @transient private lazy val memo =
      new ThreadLocal[java.util.HashMap[String, Array[String]]] {
        override def initialValue() = new java.util.HashMap[String, Array[String]]()
      }

    def segmentCached(word: String): Array[String] = {
      val m = memo.get()
      var p = m.get(word)
      if (p == null) {
        p = segment(word)
        if (m.size >= 65536) m.clear() // bound the memo; Zipf refills the head fast
        m.put(word, p)
      }
      p
    }

    /** Exhaustive merge: start from code points; at each step merge the
      * adjacent pair with the LOWEST rank (leftmost occurrence on ties
      * — the left-to-right strict-< scan pins it). */
    def segment(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      var syms = {
        val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
        var i = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          out += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        out.toArray
      }
      var merging = syms.length > 1
      while (merging) {
        var bestRank = Int.MaxValue
        var bestI = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.get(syms(i) + Sep + syms(i + 1))
          if (r != null && r.intValue < bestRank) { bestRank = r.intValue; bestI = i }
          i += 1
        }
        if (bestI < 0) merging = false
        else {
          val out = new Array[String](syms.length - 1)
          System.arraycopy(syms, 0, out, 0, bestI)
          out(bestI) = syms(bestI) + syms(bestI + 1)
          System.arraycopy(syms, bestI + 2, out, bestI + 1, syms.length - bestI - 2)
          syms = out
          merging = syms.length > 1
        }
      }
      syms
    }
  }

  // ------------------------------------------------------------------
  // Byte-level variant (GPT-2 / Radford et al. 2019, the published
  // merges.txt format): words come from regex pretokenization, seed as
  // UTF-8 BYTES lifted to printable unicode, and the SAME exhaustive
  // lowest-rank-leftmost merge engine applies — [[Table.segment]] seeds
  // by code point and every mapped byte-char is one BMP code point.
  // ------------------------------------------------------------------

  /** The GPT-2 byte→unicode printable map (encoder.py
    * `bytes_to_unicode`, re-derived from the published algorithm):
    * printable latin-1 bytes map to themselves, the 68 others —
    * controls, space, DEL..NBSP region, SHY — map to 256+n in
    * ascending byte order, so every byte is a VISIBLE single char and
    * published merges.txt files (written in this space: `Ġ` = 0x20,
    * `Ċ` = 0x0A) load verbatim. */
  val ByteToChar: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** A word lifted to the mapped byte space: UTF-8 bytes, each as its
    * [[ByteToChar]] char ("hi " → "hiĠ"). */
  def toByteWord(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    bytesToMapped(bytes)
  }

  /** Raw bytes lifted to the mapped space (tiktoken vocab loading —
    * .tiktoken tokens are base64 BYTE strings, not text). */
  def bytesToMapped(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(ByteToChar(bytes(i) & 0xFF)); i += 1 }
    sb.toString
  }

  /** Inverse of [[bytesToMapped]] (fixture writers — serialize a
    * mapped-space token back to its bytes for base64 export; not a hot
    * path). Throws on a char outside the mapped alphabet. */
  def mappedToBytes(mapped: String): Array[Byte] = {
    val out = new Array[Byte](mapped.length)
    var i = 0
    while (i < mapped.length) {
      val b = CharToByte.get(mapped.charAt(i))
      require(b != null, s"char U+${mapped.charAt(i).toInt.toHexString} not in the byte map")
      out(i) = b.byteValue
      i += 1
    }
    out
  }
  private lazy val CharToByte: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer](512)
    var b = 0
    while (b < 256) { m.put(Character.valueOf(ByteToChar(b)), Integer.valueOf(b)); b += 1 }
    m
  }

  /** The GPT-2 pretokenizer (Radford et al. 2019; the tiktoken/HF
    * `gpt2` pattern) with one documented variance: `\s` is the
    * Java∩RE2 ASCII class, not Python's Unicode one — Unicode spaces
    * (NBSP etc.) fall to the punctuation branch on BOTH engines, which
    * keeps the oracle cross-engine exact. Leftmost-first alternation:
    * contractions, space?+letters, space?+digits, space?+punct,
    * whitespace-not-before-word, whitespace. */
  val Gpt2Pretokenizer: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")

  /** Pretokenize into GPT-2 words (leading spaces attached — the
    * published behavior). Driver/spec helper; the hot path inlines the
    * matcher walk in [[countBytes]]. */
  def pretokenize(text: String): Array[String] = {
    val m = Gpt2Pretokenizer.matcher(text)
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    while (m.find()) out += m.group()
    out.toArray
  }

  /** Σ byte-level piece counts over raw text: one matcher walk, each
    * word lifted to the byte space and segmented through the shared
    * per-thread memo. */
  def countBytes(text: UTF8String, t: Table): Long = {
    val m = Gpt2Pretokenizer.matcher(text.toString)
    var total = 0L
    while (m.find()) total += t.segmentCached(toByteWord(m.group())).length
    total
  }

  /** All byte-level pieces in document order (mapped space — specs and
    * packing inspection). */
  def segmentsBytes(text: UTF8String, t: Table): ArrayData = {
    val m = Gpt2Pretokenizer.matcher(text.toString)
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    while (m.find()) {
      val pieces = t.segmentCached(toByteWord(m.group()))
      var j = 0
      while (j < pieces.length) { out += UTF8String.fromString(pieces(j)); j += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  /** Σ per-word piece counts over a token array (null elements skip). */
  def countTokens(tokens: ArrayData, t: Table): Long = {
    val n = tokens.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i))
        total += t.segmentCached(tokens.getUTF8String(i).toString).length
      i += 1
    }
    total
  }

  // ------------------------------------------------------------------
  // tiktoken-format vocabularies (cl100k/o200k: `base64(bytes) rank`
  // lines + special tokens). Segmentation is tiktoken's own published
  // byte_pair_merge: ranks key the MERGED byte string (not the pair),
  // and encode short-circuits when the whole pretoken is itself a
  // vocab token. Held in the mapped space so the walk shares the
  // ByteToChar machinery and the same frozen-table/per-thread-memo
  // codegen discipline as [[Table]].
  // ------------------------------------------------------------------

  /** Frozen tiktoken rank table + per-thread memo.
    *
    * @param tokensByRank vocab tokens in ascending rank order, mapped
    *                     space (rank VALUES don't matter to greedy
    *                     minimization, only their order — the loader
    *                     sorts, so sparse rank files work)
    * @param specials     special tokens (raw text, e.g.
    *                     `<|endoftext|>`), matched whole BEFORE
    *                     pretokenization, one piece each
    * @param pattern      the vocab's pretokenizer regex */
  final class TiktokenTable(tokensByRank: Array[String],
      specials: Array[String], pattern: String) extends Serializable {
    private val rank = new java.util.HashMap[String, Integer](tokensByRank.length)
    locally {
      var i = 0
      while (i < tokensByRank.length) {
        rank.putIfAbsent(tokensByRank(i), Integer.valueOf(i))
        i += 1
      }
    }

    @transient private lazy val pat = java.util.regex.Pattern.compile(pattern)
    // longest-first alternation so overlapping specials match greedily
    @transient private lazy val specialPat: java.util.regex.Pattern =
      if (specials.isEmpty) null
      else java.util.regex.Pattern.compile(
        specials.sortBy(s => -s.length).map(java.util.regex.Pattern.quote).mkString("|"))

    @transient private lazy val memo =
      new ThreadLocal[java.util.HashMap[String, Array[String]]] {
        override def initialValue() = new java.util.HashMap[String, Array[String]]()
      }

    def segmentCached(word: String): Array[String] = {
      val m = memo.get()
      var p = m.get(word)
      if (p == null) {
        p = segment(word)
        if (m.size >= 65536) m.clear()
        m.put(word, p)
      }
      p
    }

    /** tiktoken byte_pair_merge over a mapped-space word: seed one
      * piece per char (= per byte); repeatedly merge the adjacent pair
      * whose CONCATENATION has the lowest vocab rank (leftmost on
      * equal — only reachable by identical concatenations); whole-word
      * vocab hits short-circuit to one piece (tiktoken's encode does
      * exactly this before falling to the merge walk). */
    def segment(bw: String): Array[String] = {
      if (bw.isEmpty) return Array.empty
      if (rank.containsKey(bw)) return Array(bw)
      var syms = {
        // every mapped byte-char is one BMP char: split per char
        val out = new Array[String](bw.length)
        var i = 0
        while (i < bw.length) { out(i) = String.valueOf(bw.charAt(i)); i += 1 }
        out
      }
      var merging = syms.length > 1
      while (merging) {
        var bestRank = Int.MaxValue
        var bestI = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.get(syms(i) + syms(i + 1))
          if (r != null && r.intValue < bestRank) { bestRank = r.intValue; bestI = i }
          i += 1
        }
        if (bestI < 0) merging = false
        else {
          val out = new Array[String](syms.length - 1)
          System.arraycopy(syms, 0, out, 0, bestI)
          out(bestI) = syms(bestI) + syms(bestI + 1)
          System.arraycopy(syms, bestI + 2, out, bestI + 1, syms.length - bestI - 2)
          syms = out
          merging = syms.length > 1
        }
      }
      syms
    }

    /** Piece count of one raw-text span: pretokenize with the vocab's
      * pattern bounded to [a, b) (opaque region bounds — a lookahead at
      * the span end sees end-of-input, which is exactly tiktoken's
      * split-on-specials-then-encode-each-chunk semantics). */
    private def countSpan(s: String, a: Int, b: Int): Long = {
      if (a >= b) return 0L
      val m = pat.matcher(s)
      m.region(a, b)
      var total = 0L
      while (m.find()) total += segmentCached(toByteWord(m.group())).length
      total
    }

    /** Σ piece count over raw text: special tokens match whole (one
      * piece each) before pretokenization, remaining spans encode
      * independently. */
    def countText(text: UTF8String): Long = {
      val s = text.toString
      var total = 0L
      var from = 0
      if (specialPat != null) {
        val m = specialPat.matcher(s)
        while (m.find()) {
          total += countSpan(s, from, m.start)
          total += 1L
          from = m.end
        }
      }
      total + countSpan(s, from, s.length)
    }

    /** All pieces in document order: mapped-space pieces for ordinary
      * text, the special token's RAW text for specials (inspection). */
    def segmentsText(text: UTF8String): ArrayData = {
      val s = text.toString
      val out = new scala.collection.mutable.ArrayBuffer[Any](16)
      def span(a: Int, b: Int): Unit = if (a < b) {
        val m = pat.matcher(s)
        m.region(a, b)
        while (m.find()) {
          val pieces = segmentCached(toByteWord(m.group()))
          var j = 0
          while (j < pieces.length) { out += UTF8String.fromString(pieces(j)); j += 1 }
        }
      }
      var from = 0
      if (specialPat != null) {
        val m = specialPat.matcher(s)
        while (m.find()) {
          span(from, m.start)
          out += UTF8String.fromString(s.substring(m.start, m.end))
          from = m.end
        }
      }
      span(from, s.length)
      new GenericArrayData(out.toArray)
    }
  }

  /** All pieces in document order (null elements skip). */
  def segmentsAll(tokens: ArrayData, t: Table): ArrayData = {
    val n = tokens.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val pieces = t.segmentCached(tokens.getUTF8String(i).toString)
        var j = 0
        while (j < pieces.length) { out += UTF8String.fromString(pieces(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
