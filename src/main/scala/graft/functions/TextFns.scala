package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftexpr.{MinHashSigExpr, SimHash64Expr}

/** Text-analysis column functions for LLM-data pipelines (SURVEY §2.5
  * L8–L11): language ID, quality metrics, token counting, document
  * fingerprinting, plus the tokenize/shingle/minhash/simhash kernels the
  * dedup operators build on.
  *
  * Everything here is a pure Catalyst expression (no UDFs): language
  * scores are codegen'd boolean sums, minhash/simhash are native
  * expressions (graft.plans), so a 100 TB scan keeps whole-stage
  * codegen and full parquet pushdown/pruning.
  *
  * Every function has an exact ANSI-SQL mirror (used by the DuckDB
  * oracles in SparkEntry), so engine results are cross-checkable
  * bit-for-bit: splits are single-space (not \s+) and ratios are
  * int/int double divisions, which IEEE-match across engines.
  */
object TextFns {

  /** Whitespace-collapsed, trimmed, lowercased canonical text.
    * SQL mirror: lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Single-space tokenization (exact SQL mirror: string_split(c, ' ')). */
  def wsTokens(c: Column): Column = split(c, " ")

  /** Word k-shingles: ["a b c", "b c d", ...]; texts shorter than k
    * collapse to one whole-text shingle. */
  def shingles(c: Column, k: Int): Column = {
    val toks = wsTokens(normText(c))
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** k-permutation minhash signature — ONE pass over the array via a
    * native codegen'd expression (graft.plans.MinHashSigExpr). */
  def minhashSig(tokens: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expr(tokens), numHashes))

  /** 64-bit simhash — native codegen'd expression. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expr(tokens)))

  /** Hamming distance between two 64-bit fingerprints (pure SQL ops —
    * also available in DuckDB as bit_count(xor)). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---------------------------------------------------------------- L8
  /** Per-language stopword probes. Scores count DISTINCT stopwords
    * present (array_contains per word — set-membership, not frequency),
    * which keeps the SQL mirror trivial and the scoring robust to
    * document length. */
  val stopwordsEn = Seq("the", "a", "of", "to", "and", "in", "is", "it")
  val stopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
  val stopwordsFr = Seq("le", "les", "et", "est", "des", "une", "dans", "que")
  val stopwordsEs = Seq("el", "los", "las", "es", "una", "por", "con", "para")

  def langHits(tokens: Column, words: Seq[String]): Column =
    words.map(w => array_contains(tokens, w).cast("int")).reduce(_ + _)

  /** CJK codepoint count — the zh signal (stopword probes don't apply).
    * Strips everything that is NOT CJK and measures what remains.
    * Pattern works verbatim in Java regex and RE2. */
  def cjkChars(c: Column): Column =
    length(regexp_replace(c, "[^\\x{4e00}-\\x{9fff}]", ""))

  /** Language prediction: zh if any CJK chars, else argmax of stopword
    * hits with fixed priority en > de > fr > es, 'und' when all zero. */
  def langId(textCol: Column): Column = {
    val toks = wsTokens(lower(textCol))
    val en = langHits(toks, stopwordsEn)
    val de = langHits(toks, stopwordsDe)
    val fr = langHits(toks, stopwordsFr)
    val es = langHits(toks, stopwordsEs)
    when(cjkChars(textCol) > 0, "zh")
      .when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  // ---------------------------------------------------------------- L9
  /** Word count on normalized text; blank input counts 0 (split of ""
    * on " " yields [""], which would otherwise count as 1 word).
    * SQL mirror: CASE WHEN trim(c)='' THEN 0 ELSE len(string_split(norm, ' ')) END */
  def wordCount(c: Column): Column =
    when(trim(c) === "", 0).otherwise(size(wsTokens(normText(c))))

  def stopwordHits(c: Column): Column = {
    val stops = stopwordsEn
    size(filter(wsTokens(lower(c)), t => t.isin(stops: _*)))
  }

  /** ASCII-punct count (Java \p{Punct} ≡ POSIX [[:punct:]] in RE2). */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))

  def upperCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[A-Z]", ""))

  // --------------------------------------------------------------- L10
  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(split(c, " "))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, single
    * non-alnum marks (the classic GPT-2-style pre-split shape). */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenCountBpeish(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(BpeishPattern), lit(0)))

  // --------------------------------------------------------------- L11
  /** Content fingerprint over normalized text (md5 — oracle-able in any
    * engine; for pure-Spark pipelines prefer xxhash64: 8 bytes, ~10×
    * faster, same dedup semantics). */
  def fingerprintMd5(c: Column): Column = md5(normText(c).cast("binary"))
  def fingerprint64(c: Column): Column = xxhash64(normText(c))
}
