package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.graftexpr.{MinHashBandsExpr, MinHashSigExpr, ShinglesExpr, SimHash64Expr, TextStatsExpr}

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

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) — codegen'd kernel
    * ([[org.apache.spark.sql.graftexpr.UnicodeNormExpr]]). Pre-dedup
    * hygiene: composed and decomposed "café" are different bytes —
    * different fingerprints/shingles — until NFC folds them. The
    * algorithm is fully Unicode-specified, so any conformant engine
    * (DuckDB's nfc_normalize) produces identical bytes — oracle-gated.
    * SQL mirror (NFC): nfc_normalize(c). */
  def unicodeNorm(c: Column, form: String = "NFC"): Column =
    Bridge.column(org.apache.spark.sql.graftexpr.UnicodeNormExpr(Bridge.expr(c), form))

  /** Accent/diacritic stripping: NFD → drop combining marks → NFC
    * ("café"→"cafe"); non-decomposable letters (ø, ł) pass through.
    * SQL mirror: strip_accents(c). */
  def stripAccents(c: Column): Column =
    Bridge.column(org.apache.spark.sql.graftexpr.StripAccentsExpr(Bridge.expr(c)))

  /** Word k-shingles: ["a b c", "b c d", ...]; texts shorter than k
    * collapse to one whole-text shingle. Native one-pass expression —
    * the `transform(sequence(...), i => slice(toks,...))` form
    * re-evaluates the tokenization once per shingle (quadratic). */
  def shingles(c: Column, k: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expr(wsTokens(normText(c))), k))

  /** k-permutation minhash signature — ONE pass over the array via a
    * native codegen'd expression (graft.plans.MinHashSigExpr). */
  def minhashSig(tokens: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expr(tokens), numHashes))

  /** Fused minhash + LSH band-bucket keys (array of `bands` longs) —
    * one pass; see MinHashBandsExpr for why banding is fused. */
  def minhashBands(tokens: Column, numHashes: Int, bands: Int): Column =
    Bridge.column(MinHashBandsExpr(Bridge.expr(tokens), numHashes, bands))

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

  /** The FULL Latin-script stopword-family table (r19 — published
    * pipelines bucket 100+ languages before per-language mixture cuts;
    * CCNet/fastText lid): ordered by decision priority, 8 ASCII
    * probe words each. ASCII-only is the kernel contract
    * ([[graft.hashing.LangSigUtil]] — non-ASCII segments never match),
    * so each family uses its diacritic-free function words; languages
    * whose text the probe misses fall to 'und' rather than mislabel.
    * Non-Latin scripts are decided by SCRIPT-RANGE counts instead (the
    * kernel's `scripts` array — ja/ko/zh/th/ar/hi/he/el/ru), where
    * stopword probes don't apply. */
  val stopwordFamilies: Seq[(String, Seq[String])] = Seq(
    "en" -> stopwordsEn,
    "de" -> stopwordsDe,
    "fr" -> stopwordsFr,
    "es" -> stopwordsEs,
    "it" -> Seq("il", "la", "che", "di", "non", "per", "con", "sono"),
    "pt" -> Seq("de", "que", "em", "um", "uma", "para", "com", "os"),
    "nl" -> Seq("het", "een", "van", "ik", "niet", "aan", "met", "zijn"),
    "sv" -> Seq("och", "att", "det", "som", "av", "till", "med", "har"),
    "da" -> Seq("og", "til", "er", "som", "af", "ikke", "den", "han"),
    "no" -> Seq("og", "det", "til", "er", "som", "av", "ikke", "jeg"),
    "fi" -> Seq("ja", "on", "ei", "oli", "joka", "niin", "kun", "mutta"),
    "pl" -> Seq("nie", "jest", "to", "na", "do", "jak", "ale", "czy"),
    "cs" -> Seq("je", "se", "na", "to", "jako", "ale", "pro", "tak"),
    "ro" -> Seq("este", "nu", "cu", "pentru", "din", "care", "mai", "dar"),
    "hu" -> Seq("az", "nem", "hogy", "egy", "van", "meg", "el", "ha"),
    "tr" -> Seq("ve", "bir", "bu", "da", "ne", "gibi", "daha", "ama"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini"),
    "sw" -> Seq("na", "ya", "wa", "kwa", "ni", "za", "katika", "hii"),
    "tl" -> Seq("ang", "ng", "sa", "mga", "ay", "ito", "hindi", "ako"))

  /** Script-decided labels, in decision priority order, paired with
    * their [[graft.hashing.LangSigUtil.ScriptRanges]] slot (kana
    * before hangul/CJK: Japanese text carries kanji, so any kana at
    * all decides ja; -1 = the CJK field). */
  val scriptLabels: Seq[(String, Int)] = Seq(
    "ja" -> 4, "ko" -> 3, "zh" -> -1, "th" -> 5,
    "ar" -> 1, "hi" -> 2, "he" -> 7, "el" -> 6, "ru" -> 0)

  def langHits(tokens: Column, words: Seq[String]): Column =
    words.map(w => array_contains(tokens, w).cast("int")).reduce(_ + _)

  /** CJK codepoint count — the zh signal (stopword probes don't apply).
    * Strips everything that is NOT CJK and measures what remains.
    * Pattern works verbatim in Java regex and RE2. */
  def cjkChars(c: Column): Column =
    length(regexp_replace(c, "[^\\x{4e00}-\\x{9fff}]", ""))

  /** Language prediction from pre-materialized parts: zh if any CJK
    * chars, else argmax of stopword hits with fixed priority
    * en > de > fr > es, 'und' when all zero.
    *
    * Callers on large data should materialize `toks` in its own
    * projection (see [[withLangId]]): CASE branch values are excluded
    * from common-subexpression elimination, so the inline form re-splits
    * the text up to 32× per row — measured 8× slower at sf0.1. */
  def langIdFromParts(toks: Column, cjk: Column): Column = {
    val en = langHits(toks, stopwordsEn)
    val de = langHits(toks, stopwordsDe)
    val fr = langHits(toks, stopwordsFr)
    val es = langHits(toks, stopwordsEs)
    when(cjk > 0, "zh")
      .when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Inline single-Column form (convenient for small data). */
  def langId(textCol: Column): Column =
    langIdFromParts(wsTokens(lower(textCol)), cjkChars(textCol))

  /** Staged language-ID: tokenization AND the per-language scores each
    * run once per row in their own projections (CollapseProject keeps
    * multi-referenced non-cheap expressions materialized; CASE branch
    * values are excluded from subexpression elimination, so the inline
    * form re-evaluates each score up to 4× and the split up to 32×). */
  /** ALL per-family distinct-hit counts + the CJK count + the
    * per-script char counts in ONE kernel pass
    * ([[org.apache.spark.sql.graftexpr.LangHitsExpr]]):
    * `struct(hits array<int> ([[stopwordFamilies]] order), cjk int,
    * scripts array<int> ([[graft.hashing.LangSigUtil.ScriptRanges]]
    * order))`. The Column formulation would run one `array_contains`
    * scan per (family, word) — 152 scans of the token array per
    * document; the kernel is one char scan regardless of family
    * count, which is what lets the table grow from 4 to 19 families
    * + 9 scripts for free. */
  def langSig(c: Column): Column =
    Bridge.column(org.apache.spark.sql.graftexpr.LangHitsExpr(
      Bridge.expr(c), stopwordFamilies.map(_._2)))

  /** Staged wide language-ID (~28 labels): script-range counts decide
    * the non-Latin labels first ([[scriptLabels]] priority — any
    * script char decides, the synthetic-fixture convention documented
    * since r16's cjk>0→zh), then the stopword-family argmax in
    * [[stopwordFamilies]] order (earlier family wins ties), else
    * 'und'. One kernel pass per row; the text_langid gate's oracle is
    * GENERATED from these same tables so the two can never drift. */
  def withLangId(df: org.apache.spark.sql.DataFrame, text: Column, out: String): org.apache.spark.sql.DataFrame = {
    val sig = col("_lid_sig")
    val hits = sig.getField("hits")
    val cjk = sig.getField("cjk")
    val scripts = sig.getField("scripts")
    val scriptChain = scriptLabels.foldLeft(None: Option[Column]) {
      case (acc, (label, slot)) =>
        val cnt = if (slot < 0) cjk else scripts.getItem(slot)
        Some(acc match {
          case None => when(cnt > 0, label)
          case Some(c) => c.when(cnt > 0, label)
        })
    }.get
    // family argmax via array_max + array_position (FIRST index on
    // ties = the earlier-family priority) — the n² pairwise CASE form
    // at 19 families blew past codegen limits and ran interpreted
    // (measured 5× on text_langid); these are two single passes over
    // the 19-element array, mirrored by list_max/list_position in the
    // generated oracle
    val famCodes = array(stopwordFamilies.map(f => lit(f._1)): _*)
    val best = array_max(hits)
    val full = scriptChain.when(best > 0,
      element_at(famCodes, array_position(hits, best).cast("int")))
    df.withColumn("_lid_sig", langSig(text))
      .withColumn(out, full.otherwise("und"))
      .drop("_lid_sig")
  }

  // ---------------------------------------------------------------- L9
  /** Word count on normalized text; blank input counts 0 (split of ""
    * on " " yields [""], which would otherwise count as 1 word).
    * SQL mirror: CASE WHEN trim(c)='' THEN 0 ELSE len(string_split(norm, ' ')) END */
  def wordCount(c: Column): Column =
    when(trim(c) === "", 0).otherwise(size(wsTokens(normText(c))))

  /** One-pass document statistics (the r17 kernel,
    * [[org.apache.spark.sql.graftexpr.TextStatsExpr]]): struct
    * `(n_tokens, n_words, char_sum, n_sym, n_lines, n_bullet,
    * n_ellipsis, n_alpha, n_stop)` — the integer counts
    * [[gopherFlags]] and [[graft.operators.LogReg.featureExprs]]
    * ratio against, each bit-compatible with its Column twin. */
  def textStats(c: Column): Column =
    Bridge.column(TextStatsExpr(Bridge.expr(c)))

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

  // --------------------------------------------------------------- L20
  /** Gopher-style repetition signals (Rae et al. 2021, appendix A —
    * public): the fraction of duplicate lines / words / 3-grams in a
    * document, the standard filter for boilerplate and generation
    * loops. Each is a pure narrow array expression over the row — a
    * quality FILTER must not cost an explode+groupBy at 100 TB. The
    * fraction is 1 - distinct/total; empty inputs score 0 (nothing
    * repeats), NULL propagates. */
  def dupLineFrac(c: Column): Column = {
    val lines = split(c, "\n")
    lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines)
  }

  /** Duplicate-word fraction over normalized whitespace tokens. */
  def dupWordFrac(c: Column): Column = {
    val ws = wsTokens(normText(c))
    lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws)
  }

  /** Duplicate word-3-gram fraction — catches short-cycle repetition
    * ("for the for the …") that word-level stats miss. Same 3-gram
    * windows as the dedup shingles, via the same one-pass native
    * [[ShinglesExpr]]: the lambda form
    * (`transform(sequence(...), i => concat_ws(..., element_at(ws, i+k)...))`)
    * re-evaluates the regex tokenization per gram element — O(len²)
    * per document, measured 946 s vs 5 s for its tier at the 10×
    * stress scale. Docs under 3 words score 0 (ShinglesExpr collapses
    * them to ONE whole-text shingle, so 1 − 1/1); NULL propagates. */
  def dupTrigramFrac(c: Column): Column = {
    val grams = shingles(c, 3)
    lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams)
  }

  // --------------------------------------------------------------- L39
  /** Gopher's published stop-word list for rule 7 (Rae et al. 2021,
    * A1.1: "contains at least two of the following English words"). */
  val gopherStopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher rule-based quality filter (Rae et al. 2021, appendix
    * A1.1 — the published pre-classifier document gate, reused by
    * MassiveText descendants): seven per-document rules, each a pure
    * narrow expression so the whole gate stays inside the scan's
    * codegen span at 100 TB. Returns a struct
    * `(n_words, ok_word_count, ok_mean_word_len, ok_symbol_ratio,
    * ok_bullet_lines, ok_ellipsis_lines, ok_alpha_words, ok_stopwords,
    * keep)` with `keep` = all seven.
    *
    * Conventions (exact SQL mirrors per function scaladocs): words are
    * the normText single-space tokens; word-less docs fail every
    * per-word rule (and the word-count floor) by definition; line
    * rules trim each line first; "symbols" are `#`, `…`, and each
    * maximal run of ≥3 dots; the stop-word rule counts DISTINCT hits
    * from [[gopherStopwords]]. NULL text yields all-false flags and
    * keep = false. Ratios are int/int double divisions against literal
    * thresholds — both engines compare the identical IEEE double, and
    * only the boolean crosses the oracle gate. */
  def gopherFlags(
      c: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): Column = {
    // ONE kernel pass (TextStatsExpr — r17) replaces what was five
    // regex passes + interpreted per-line/per-token HOF lambdas; every
    // count is bit-compatible with the Column formulation (the
    // text_gopher oracle gates it), and the ratio/threshold arithmetic
    // below is unchanged. The kernel freezes [[gopherStopwords]].
    val st = textStats(c)
    val nWords = st.getField("n_words")
    val hasWords = nWords > 0
    val nw = nWords.cast("double")
    val meanLen = st.getField("char_sum").cast("double") / nw
    val nSymbols = st.getField("n_sym")
    val nLines = st.getField("n_lines").cast("double")
    val bulletFrac = st.getField("n_bullet").cast("double") / nLines
    val ellipsisFrac = st.getField("n_ellipsis").cast("double") / nLines
    val alphaFrac = st.getField("n_alpha").cast("double") / nw
    val nStops = st.getField("n_stop")
    def f(b: Column): Column = coalesce(b, lit(false))
    val okWordCount = f(nWords >= minWords && nWords <= maxWords)
    val okMeanLen = f(hasWords && meanLen >= minMeanLen && meanLen <= maxMeanLen)
    val okSymbols = f(hasWords && nSymbols.cast("double") / nw <= maxSymbolRatio)
    val okBullets = f(bulletFrac <= maxBulletFrac)
    val okEllipsis = f(ellipsisFrac <= maxEllipsisFrac)
    val okAlpha = f(hasWords && alphaFrac >= minAlphaFrac)
    val okStops = f(nStops >= minStopwords)
    struct(
      coalesce(nWords, lit(0)).cast("long").as("n_words"),
      okWordCount.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"),
      okSymbols.as("ok_symbol_ratio"),
      okBullets.as("ok_bullet_lines"),
      okEllipsis.as("ok_ellipsis_lines"),
      okAlpha.as("ok_alpha_words"),
      okStops.as("ok_stopwords"),
      (okWordCount && okMeanLen && okSymbols && okBullets &&
        okEllipsis && okAlpha && okStops).as("keep"))
  }

  // --------------------------------------------------------------- L41
  /** C4's heuristic cleaning (Raffel et al. 2020, arXiv:1910.10683
    * §2.2 — the published line/document rules behind the C4 corpus,
    * inherited by most web-scale recipes since): keep only lines that
    * end in a terminal punctuation mark, carry at least `minLineWords`
    * words, and do not mention "javascript"; drop DOCUMENTS that
    * contain "lorem ipsum", a curly brace `{`, any caller-supplied
    * blocked phrase (the paper's word-list rule, list not embedded
    * here), or fewer than `minSentences` sentences after line
    * cleaning. Returns one struct
    * `(text_clean, n_lines_kept, n_lines, ok_no_lorem, ok_no_brace,
    * ok_no_blocked, ok_min_sentences, keep)` — the cleaned text is
    * always produced; `keep` gates the page.
    *
    * Conventions (exact SQL mirrors in the text_c4 oracle): lines are
    * `\n`-split and TRIMMED (output keeps the trimmed form); terminal
    * punctuation is one of `. ! ? " ”` (the paper's "terminal
    * punctuation mark incl. end quotation"; straight apostrophe is
    * excluded — documented subset); the line word count is the
    * whitespace-collapsed single-space split, so blank lines fail any
    * floor ≥ 1; the sentence count is the number of `. ! ?` characters
    * in the CLEANED text — a deterministic proxy for the paper's
    * sentence splitter, which has no cross-engine mirror; phrase
    * checks are case-insensitive `contains`. NULL text → NULL
    * text_clean, zero counts, all-false flags. Pure narrow array
    * expressions — the 100 TB gate never leaves the scan's codegen
    * span, and only line counts + booleans (plus the rewritten text)
    * cross the gate. */
  // --------------------------------------------------------------- L54
  /** Dependency-free HTML→text extraction — the step every web corpus
    * pays BEFORE any text gate runs (the published pipelines start
    * from WARC/WET HTML: C4 arXiv:1910.10683 §2.2 "extracted text";
    * RefinedWeb arXiv:2306.01116 §3.2 runs trafilatura). This is the
    * deterministic rule-based core of that step, with an exact SQL
    * mirror (a full content-extraction heuristic like trafilatura has
    * no cross-engine oracle and carries a dependency):
    *
    *  1. `<script…>…</script>` / `<style…>…</style>` blocks drop
    *     whole (case-insensitive, non-greedy, dot-matches-newline) —
    *     their CONTENT is code, never text;
    *  2. `<!-- … -->` comments drop;
    *  3. every remaining `<…>` tag → one space (block structure
    *     survives as whitespace, inline tags don't glue words);
    *  4. the common entities decode literally — `&nbsp;`→space,
    *     `&lt; &gt; &quot; &#39; &apos;` → `< > " ' '` — and `&amp;`
    *     → `&` LAST, so double-escaped text single-unescapes
    *     (`&amp;lt;` → `&lt;`, the correct one-level decode);
    *     entity names are case-sensitive (documented subset);
    *  5. whitespace collapses to single spaces, trimmed.
    *
    * NULL → NULL. One narrow regexp/replace chain — the 100 TB
    * extraction pass never leaves the scan's codegen span. Patterns
    * are Java∩RE2 (no backrefs, no \\b), so DuckDB mirrors them
    * verbatim with `'gis'/'gs'/'g'` options. */
  def htmlToText(c: Column): Column = {
    val noScript = regexp_replace(c,
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    // entity strings are regex-metachar-free, so regexp_replace is an
    // exact literal replace in BOTH engines; &amp; must decode last
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Outbound links of an HTML page: every double-quoted `href`
    * attribute value, in document order (`href = "…"`,
    * case-insensitive, whitespace around `=` tolerated; unquoted and
    * single-quoted hrefs are out of the documented subset). The
    * companion of [[htmlToText]] for the link-graph/URL-hygiene side
    * of web-corpus prep — feed [[graft.functions.UrlFns]]. NULL →
    * NULL, no links → empty array. One narrow `regexp_extract_all`
    * (Java∩RE2), SQL mirror `regexp_extract_all(c, pat, 1)`. */
  def htmlLinks(c: Column): Column =
    regexp_extract_all(c, lit("(?i)href\\s*=\\s*\"([^\"]*)\""), lit(1))

  def c4Clean(
      c: Column, minLineWords: Int = 3, minSentences: Int = 5,
      blockedPhrases: Seq[String] = Nil): Column = {
    val lines = transform(split(c, "\n"), l => trim(l))
    val kept = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"") || l.endsWith("”")) &&
        size(split(regexp_replace(l, "\\s+", " "), " ")) >= minLineWords &&
        !lower(l).contains("javascript"))
    val cleaned = array_join(kept, "\n")
    val nSent = length(cleaned) - length(regexp_replace(cleaned, "[.!?]", ""))
    val lowered = lower(c)
    def f(b: Column): Column = coalesce(b, lit(false))
    val okLorem = f(!lowered.contains("lorem ipsum"))
    val okBrace = f(!c.contains("{"))
    val okBlocked = f(blockedPhrases
      .map(p => !lowered.contains(p.toLowerCase))
      .foldLeft(lit(true))(_ && _))
    val okSent = f(nSent >= minSentences)
    struct(
      cleaned.as("text_clean"),
      coalesce(size(kept), lit(0)).cast("long").as("n_lines_kept"),
      coalesce(size(lines), lit(0)).cast("long").as("n_lines"),
      okLorem.as("ok_no_lorem"),
      okBrace.as("ok_no_brace"),
      okBlocked.as("ok_no_blocked"),
      okSent.as("ok_min_sentences"),
      (okLorem && okBrace && okBlocked && okSent).as("keep"))
  }

  // --------------------------------------------------------------- L21
  /** Heuristic PII scrubbing — the redaction pass a training corpus
    * runs before anything else sees the text. Patterns stay in the
    * Java-regex ∩ RE2 common subset (no backrefs/lookaround) so the
    * exact expressions run under any engine's matcher. Application
    * order matters and is fixed: emails first (their local parts can
    * contain digit runs), then IPv4 (dotted quads are not phone-like
    * once gone), then phone-ish digit runs. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Phone-ish digit runs: >= 8 digits with AT MOST ONE space/hyphen
    * between consecutive digits (so "2010  2011" and "2010 - 2011" no
    * longer bridge), unbounded length (a leak-safe over-redaction:
    * capping at E.164's 15 digits would leave the tail of a longer
    * identifier exposed). KNOWN false-positive class, pinned in
    * TextPrepSpec: consecutive SINGLE-space-separated digit groups
    * totaling >= 8 digits — a year list like "2010 2011 2012" — still
    * collapse to one <PHONE>; structurally indistinguishable from a
    * grouped international number without NLP-level context. */
  val PhoneRe = "\\+?\\d(?:[ -]?\\d){7,}"

  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Match counts per category, staged exactly like [[redactPii]]
    * (each pattern counts on the text with the EARLIER categories
    * already redacted, so a digit never double-counts). */
  def piiCounts(c: Column): (Column, Column, Column) = {
    val afterEmail = regexp_replace(c, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    (size(regexp_extract_all(c, lit(EmailRe), lit(0))),
     size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))),
     size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))))
  }
}
