package graft.hashing

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization runtime for the [[org.apache.spark.sql.graftexpr]]
  * kernels (SURVEY §2.5 L35). Static methods so whole-stage codegen
  * emits a single call.
  *
  * Normalization (NFC/NFD/NFKC/NFKD) is fully specified by the Unicode
  * standard — `java.text.Normalizer` and any conformant engine
  * (DuckDB's utf8proc `nfc_normalize`) agree byte-for-byte on the
  * result for every assigned codepoint, which is what makes the driver
  * gate possible. Accent stripping is the standard NFD → drop
  * combining marks (`\p{Mn}\p{Me}\p{Mc}`) → NFC pipeline: "café" →
  * "cafe", "münchen" → "munchen"; characters that do NOT decompose
  * (ø, ł) pass through unchanged in BOTH this and utf8proc's
  * stripmark — they are distinct letters, not accented forms. */
object UnicodeUtil {

  // Form resolved by ordinal: the codegen'd kernel receives an int
  // literal baked in at expression construction, so the hot path never
  // does the per-row string→enum lookup valueOf() would.
  private val FORMS: Array[Normalizer.Form] = Normalizer.Form.values()

  def normalize(s: UTF8String, formOrdinal: Int): UTF8String = {
    val f = FORMS(formOrdinal)
    val str = s.toString
    // fast path: already normalized (the common case for ASCII-heavy
    // corpora) — skip the rebuild
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def normalize(s: UTF8String, form: String): UTF8String =
    normalize(s, Normalizer.Form.valueOf(form).ordinal)

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    var hasNonAscii = false
    var i = 0
    while (i < str.length && !hasNonAscii) {
      if (str.charAt(i) >= 0x80) hasNonAscii = true
      i += 1
    }
    if (!hasNonAscii) return s   // pure ASCII carries no marks
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.ENCLOSING_MARK &&
          t != Character.COMBINING_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
