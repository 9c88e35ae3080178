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

  /** (hits per list as array<int>, cjk count) for one text. */
  def sig(u: UTF8String, t: Table): InternalRow = {
    val s = u.toString
    val n = s.length
    val masks = new Array[Long](t.nLists)
    var cjk = 0
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
      if (ch == ' ') { endSeg(i); segStart = i + 1 }
      i += 1
    }
    endSeg(n)
    val counts = new Array[Any](t.nLists)
    var l = 0
    while (l < t.nLists) { counts(l) = java.lang.Long.bitCount(masks(l)); l += 1 }
    new GenericInternalRow(Array[Any](new GenericArrayData(counts), cjk))
  }
}
