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
