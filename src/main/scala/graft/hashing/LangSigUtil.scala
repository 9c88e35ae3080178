package graft.hashing

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language-signal kernel behind
  * [[org.apache.spark.sql.graftexpr.LangHitsExpr]]: per stop-word
  * list, the number of DISTINCT list words present among the text's
  * SPACE-delimited segments (exactly `array_contains(split(lower(text),
  * " "), w)` summed per list — boundaries are single spaces only, the
  * L8 langid contract), plus the CJK codepoint count. The Column
  * formulation ran one `array_contains` scan per (list, word) — 32
  * scans of the token array per document; here it is one char scan
  * with a per-segment probe.
  *
  * Case folding is ASCII (the probe words are ASCII lowercase): a
  * segment containing a non-ASCII char never matches — the Column twin
  * Unicode-lowers first, which can only differ for segments whose
  * Unicode lowercase lands EXACTLY on a probe word via a non-ASCII
  * uppercase (no such character exists for these alphabets' probe
  * words; the text_langid oracle gates it). */
object LangSigUtil {

  /** Frozen probe table: `lists` flattened with list boundaries. */
  final class Table(lists: Array[Array[String]]) extends Serializable {
    require(lists.forall(_.length <= 64), "probe lists must be <= 64 words")
    val nLists: Int = lists.length
    // word -> (listIdx << 6 | wordIdx) entries; a word may appear in
    // several lists, so the map holds packed ints per word
    private val probes = new java.util.HashMap[String, Array[Int]]()
    locally {
      var l = 0
      while (l < lists.length) {
        var w = 0
        while (w < lists(l).length) {
          val key = lists(l)(w)
          val prev = probes.get(key)
          val next = if (prev == null) Array(l << 6 | w) else prev :+ (l << 6 | w)
          probes.put(key, next)
          w += 1
        }
        l += 1
      }
    }
    /** Longest probe word (segments longer than this never match). */
    val maxLen: Int = if (lists.forall(_.isEmpty)) 0 else lists.flatten.map(_.length).max

    def lookup(s: String): Array[Int] = probes.get(s)
  }

  /** Script-range slots of the `scripts` array, in kernel index order
    * (all BMP ranges, so the char count IS the codepoint count; each
    * has an exact RE2/Java `[^\x{lo}-\x{hi}]` strip mirror):
    * 0 Cyrillic 0400–04FF, 1 Arabic 0600–06FF, 2 Devanagari 0900–097F,
    * 3 Hangul AC00–D7A3, 4 Kana 3040–30FF, 5 Thai 0E00–0E7F,
    * 6 Greek 0370–03FF, 7 Hebrew 0590–05FF. (CJK 4E00–9FFF keeps its
    * own field for compatibility.) */
  val ScriptRanges: Array[(String, Int, Int)] = Array(
    ("cyrillic", 0x0400, 0x04FF),
    ("arabic", 0x0600, 0x06FF),
    ("devanagari", 0x0900, 0x097F),
    ("hangul", 0xAC00, 0xD7A3),
    ("kana", 0x3040, 0x30FF),
    ("thai", 0x0E00, 0x0E7F),
    ("greek", 0x0370, 0x03FF),
    ("hebrew", 0x0590, 0x05FF))

  /** (hits per list as array<int>, cjk count, per-script char counts)
    * for one text — one char scan. */
  def sig(u: UTF8String, t: Table): InternalRow = {
    val s = u.toString
    val n = s.length
    val masks = new Array[Long](t.nLists)
    var cjk = 0
    val scripts = new Array[Int](ScriptRanges.length)
    var segStart = 0
    val buf = new java.lang.StringBuilder(t.maxLen)
    def endSeg(endEx: Int): Unit = {
      val len = endEx - segStart
      if (len > 0 && len <= t.maxLen) {
        buf.setLength(0)
        var ok = true
        var j = segStart
        while (ok && j < endEx) {
          val c = s.charAt(j)
          if (c >= 0x80) ok = false // non-ASCII segments never match (doc'd)
          else buf.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
          j += 1
        }
        if (ok) {
          val hits = t.lookup(buf.toString)
          if (hits != null) {
            var k = 0
            while (k < hits.length) {
              masks(hits(k) >> 6) |= 1L << (hits(k) & 63)
              k += 1
            }
          }
        }
      }
    }
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch >= '\u4e00' && ch <= '\u9fff') cjk += 1
      else if (ch >= 0x0370 && ch <= 0xD7A3) { // cheap pre-gate: all ranges live here
        var r = 0
        var hit = false
        while (!hit && r < ScriptRanges.length) {
          if (ch >= ScriptRanges(r)._2 && ch <= ScriptRanges(r)._3) {
            scripts(r) += 1; hit = true
          }
          r += 1
        }
      }
      if (ch == ' ') { endSeg(i); segStart = i + 1 }
      i += 1
    }
    endSeg(n)
    val counts = new Array[Any](t.nLists)
    var l = 0
    while (l < t.nLists) { counts(l) = java.lang.Long.bitCount(masks(l)); l += 1 }
    val scriptCounts = new Array[Any](scripts.length)
    var r = 0
    while (r < scripts.length) { scriptCounts(r) = scripts(r); r += 1 }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(counts), cjk, new GenericArrayData(scriptCounts)))
  }
}
