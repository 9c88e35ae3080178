package graft.hashing

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** One-pass document-statistics kernel behind
  * [[org.apache.spark.sql.graftexpr.TextStatsExpr]] — the integer
  * counts the Gopher rule gate ([[graft.functions.TextFns.gopherFlags]])
  * and the LR feature contract ([[graft.operators.LogReg.featureExprs]])
  * both ratio against. The Column formulation evaluated interpreted
  * HOF lambdas per LINE and per TOKEN plus five regex passes per
  * document (measured: quality_lr 114.8 s at the 100× stress scale —
  * feature extraction, not learning); here the whole set is two tight
  * char scans.
  *
  * Bit-compatibility contract (each count must equal its Column twin
  * EXACTLY — the text_gopher/quality_lr oracles gate it):
  *  - words are maximal runs of non-`\s` (Java `\s` = the six ASCII
  *    whitespace chars — exactly `regexp_replace(c, "\\s+", " ")` +
  *    single-space split + empty filter);
  *  - `char_sum` counts CODE POINTS of the LOWERCASED tokens
  *    (`length` on normText's tokens — lowercase can change length
  *    for rare expansion cases, so non-ASCII tokens take the
  *    UTF8String.toLowerCase slow path);
  *  - `n_alpha` = tokens containing an ASCII a–z AFTER lowercasing
  *    (`rlike("[a-z]")` on the normalized token);
  *  - `n_stop` = DISTINCT hits among the published Gopher list;
  *  - `n_sym` = count of `#` and `…` chars plus the number of MAXIMAL
  *    runs of ≥3 dots (greedy `\.{3,}` matches);
  *  - lines split on `\n` (trailing empties kept: n_lines =
  *    #newlines + 1), each trimmed of SPACES only (Spark `trim`),
  *    bullets = first char `•`/`-`/`*`, ellipsis = ends `...` or `…`.
  */
object TextStatsUtil {

  /** The published Gopher rule-7 stop words (Rae 2021 A1.1) — frozen
    * here as in [[graft.functions.TextFns.gopherStopwords]]. */
  private val Stops = Array("the", "be", "to", "of", "and", "that", "have", "with")

  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r'

  /** (n_tokens, n_words, char_sum, n_sym, n_lines, n_bullet,
    * n_ellipsis, n_alpha, n_stop) as an InternalRow of 9 ints.
    *
    * `n_tokens` is the FILTERED count ([[graft.operators.NgramLM.tokens]]
    * — empty strings out); `n_words` preserves the legacy
    * `TextFns.wordCount` quirk: a whitespace-only text that is not
    * all-SPACES (e.g. a lone tab) normalizes to "" whose single-space
    * split is [""] — ONE empty word (`trim` removes spaces only, so
    * the blank-text special case does not fire). The empty word has
    * no length/alpha/stopword effect, so only the two counts differ. */
  def stats(u: UTF8String): InternalRow = {
    val t = u.toString
    val n = t.length
    var nonSpace = false
    var nWords = 0
    var charSum = 0
    var nSym = 0
    var nAlpha = 0
    var stopMask = 0
    var dotRun = 0

    // scan 1: tokens + symbol counts
    var i = 0
    var tokStart = -1
    def endToken(endEx: Int): Unit = {
      nWords += 1
      var ascii = true
      var j = tokStart
      while (ascii && j < endEx) { if (t.charAt(j) >= 0x80) ascii = false; j += 1 }
      if (ascii) {
        charSum += endEx - tokStart
        var alpha = false
        j = tokStart
        while (!alpha && j < endEx) {
          val c = t.charAt(j)
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha = true
          j += 1
        }
        if (alpha) nAlpha += 1
        val len = endEx - tokStart
        if (len >= 2 && len <= 4) {
          var s = 0
          while (s < Stops.length) {
            val w = Stops(s)
            if (w.length == len) {
              var k = 0
              var eq = true
              while (eq && k < len) {
                val c = t.charAt(tokStart + k)
                val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
                if (lc != w.charAt(k)) eq = false
                k += 1
              }
              if (eq) stopMask |= 1 << s
            }
            s += 1
          }
        }
      } else {
        // rare path: full UTF8String lowercase (can change length)
        val low = UTF8String.fromString(t.substring(tokStart, endEx)).toLowerCase.toString
        charSum += low.codePointCount(0, low.length)
        var alpha = false
        var k = 0
        while (!alpha && k < low.length) {
          val c = low.charAt(k)
          if (c >= 'a' && c <= 'z') alpha = true
          k += 1
        }
        if (alpha) nAlpha += 1
        var s = 0
        while (s < Stops.length) { if (low == Stops(s)) stopMask |= 1 << s; s += 1 }
      }
    }
    while (i < n) {
      val ch = t.charAt(i)
      if (ch != ' ') nonSpace = true
      if (ch == '.') dotRun += 1
      else {
        if (dotRun >= 3) nSym += 1
        dotRun = 0
        if (ch == '#' || ch == '…') nSym += 1
      }
      if (isWs(ch)) {
        if (tokStart >= 0) { endToken(i); tokStart = -1 }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (dotRun >= 3) nSym += 1
    if (tokStart >= 0) endToken(n)
    val nTokens = nWords
    if (nWords == 0 && nonSpace) nWords = 1 // the legacy empty-word quirk

    // scan 2: lines (split on '\n', trailing empties kept; trim = spaces only)
    var nLines = 0
    var nBullet = 0
    var nEllipsis = 0
    var ls = 0
    var pos = 0
    while (pos <= n) {
      if (pos == n || t.charAt(pos) == '\n') {
        nLines += 1
        var a = ls
        var b = pos
        while (a < b && t.charAt(a) == ' ') a += 1
        while (b > a && t.charAt(b - 1) == ' ') b -= 1
        if (a < b) {
          val first = t.charAt(a)
          if (first == '•' || first == '-' || first == '*') nBullet += 1
          val last = t.charAt(b - 1)
          if (last == '…' ||
              (b - a >= 3 && t.charAt(b - 1) == '.' && t.charAt(b - 2) == '.' &&
                t.charAt(b - 3) == '.')) nEllipsis += 1
        }
        ls = pos + 1
      }
      pos += 1
    }

    new GenericInternalRow(Array[Any](
      nTokens, nWords, charSum, nSym, nLines, nBullet, nEllipsis, nAlpha,
      Integer.bitCount(stopMask)))
  }
}
