package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.functions.TextFns
import graft.operators.Chunk

/** Repetition signals (L20), PII scrubbing (L21) and context-window
  * chunking (L22) — planted ground truth, hand-computed fractions. */
class TextPrepSpec extends SparkSpec {

  private def docs(rows: Doc*) = {
    import spark.implicits._
    rows.toDS.toDF
  }

  // ------------------------------------------------------- repetition

  test("wide langid: one fixture per script label, per stopword family, and the priorities") {
    import spark.implicits._
    val fixtures: Seq[(String, String)] = Seq(
      // script-decided labels (one fixture per range)
      "ja" -> "東京の天気は ひらがな カタカナ です",   // kana present with kanji -> ja, not zh
      "ko" -> "서울의 날씨가 좋다",
      "zh" -> "今天天气很好 没有假名",                 // kanji only -> zh
      "th" -> "อากาศดีมากวันนี้",
      "ar" -> "الطقس جميل اليوم",
      "hi" -> "आज मौसम अच्छा है",
      "he" -> "מזג האוויר יפה היום",
      "el" -> "ο καιρός είναι καλός σήμερα",
      "ru" -> "погода сегодня хорошая",
      // Latin stopword families
      "en" -> "the weather is nice and it is warm",
      "de" -> "der himmel ist blau und die sonne scheint nicht",
      "fr" -> "le temps est beau dans les montagnes",
      "es" -> "el clima es bueno por las montañas para todos",
      "it" -> "il tempo che fa non è per niente brutto sono felice",
      "pt" -> "de manhã que bom um dia para quem gosta com os amigos",
      "nl" -> "ik ga met een fiets van het huis niet ver",
      "sv" -> "det är fint väder och jag vill att gå ut som har tid till det med",
      "da" -> "og vejret er godt til den tur som han ikke tager af",
      "no" -> "og det er fint vær til jeg som av og til går ikke ut",
      "fi" -> "ja sää on hyvä kun aurinko paistaa mutta ei sada niin oli kiva joka päivä",
      "pl" -> "nie wiem jak to jest ale do zobaczenia czy na pewno",
      "cs" -> "je to na tak dobré jako pro nás ale se uvidí",
      "ro" -> "este o zi buna cu soare din care mai rasare dar nu ploua pentru noi",
      "hu" -> "az idő nem rossz hogy egy kicsit van meg el lehet menni ha akarunk",
      "tr" -> "ve hava bir güzel bu gün ne iyi gibi daha ama olmaz",
      "id" -> "yang penting dan cuaca di sini itu bagus dengan matahari untuk kita tidak hujan ini",
      "sw" -> "na hali ya hewa ni nzuri wa leo kwa sababu za jua katika mji hii",
      "tl" -> "ang panahon ay maganda sa araw na ito ng mga tao ito ang gusto hindi umuulan ako")
    val df = fixtures.zipWithIndex.map { case ((want, text), i) => (i.toLong, want, text) }
      .toDF("id", "want", "text")
    val got = TextFns.withLangId(df, col("text"), "lang_pred")
      .select("want", "lang_pred").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)}, got ${r.getString(1)}"))
    // priority laws + fallback
    val edge = Seq(
      (1L, "ja", "漢字 と ひらがな"),          // kana beats cjk
      (2L, "und", "zzz qqq xxx www"),          // no signal at all
      (3L, "und", ""),                          // empty
      (4L, "und", null.asInstanceOf[String]),   // NULL text
      (5L, "en", "the der le el"))              // 1-hit tie -> earliest family
      .toDF("id", "want", "text")
    val egot = TextFns.withLangId(edge, col("text"), "lang_pred")
      .select("want", "lang_pred").collect()
    egot.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)}, got ${r.getString(1)}"))
  }

  test("repetition fractions are 0 for an all-unique document") {
    import spark.implicits._
    val out = docs(Doc(1L, "one two three four five\nsix seven eight"))
      .select(
        TextFns.dupLineFrac(col("text")).as("l"),
        TextFns.dupWordFrac(col("text")).as("w"),
        TextFns.dupTrigramFrac(col("text")).as("g"))
      .as[(Double, Double, Double)].head()
    assert(out == ((0.0, 0.0, 0.0)))
  }

  test("duplicate words and short-cycle trigrams are counted exactly") {
    import spark.implicits._
    // 6 tokens, 2 distinct -> 1 - 2/6; 4 trigrams ("a b a","b a b")x2 -> 1 - 2/4
    val (w, g) = docs(Doc(1L, "a b a b a b"))
      .select(TextFns.dupWordFrac(col("text")).as("w"),
        TextFns.dupTrigramFrac(col("text")).as("g"))
      .as[(Double, Double)].head()
    assert(math.abs(w - (1.0 - 2.0 / 6)) < 1e-12)
    assert(g == 0.5)
  }

  test("duplicate lines: 3 lines 2 distinct -> 1/3") {
    import spark.implicits._
    val l = docs(Doc(1L, "x y\nz w\nx y"))
      .select(TextFns.dupLineFrac(col("text")).as("l")).as[Double].head()
    assert(math.abs(l - 1.0 / 3) < 1e-12)
  }

  test("under-3-word docs score trigram 0; empty text scores all 0; NULL propagates") {
    val rows = docs(Doc(1L, "just two"), Doc(2L, ""), Doc(3L, null))
      .select(col("doc_id"),
        TextFns.dupLineFrac(col("text")).as("l"),
        TextFns.dupWordFrac(col("text")).as("w"),
        TextFns.dupTrigramFrac(col("text")).as("g"))
      .orderBy("doc_id").collect()
    assert(rows(0) == Row(1L, 0.0, 0.0, 0.0))
    assert(rows(1) == Row(2L, 0.0, 0.0, 0.0))
    assert(rows(2) == Row(3L, null, null, null))
  }

  // -------------------------------------------------------------- PII

  test("pii: each category counted and redacted; order prevents double-counts") {
    import spark.implicits._
    val text = "mail u9@ex.com or 10.0.0.1 or +1 555 1234567 end"
    val df = docs(Doc(1L, text))
    val (ne, ni, np) = TextFns.piiCounts(col("text"))
    val (e, i, p, clean) = df
      .select(ne.as("e"), ni.as("i"), np.as("p"),
        TextFns.redactPii(col("text")).as("c"))
      .as[(Int, Int, Int, String)].head()
    assert((e, i, p) == ((1, 1, 1)))
    assert(clean == "mail <EMAIL> or <IP> or <PHONE> end")
  }

  test("pii: digit-run inside an email never counts as a phone (staging)") {
    import spark.implicits._
    val df = docs(Doc(1L, "write to u1234567890@example.com today"))
    val (ne, ni, np) = TextFns.piiCounts(col("text"))
    val (e, i, p) = df.select(ne.as("e"), ni.as("i"), np.as("p"))
      .as[(Int, Int, Int)].head()
    assert((e, i, p) == ((1, 0, 0)))
  }

  test("pii: separator runs >1 char break a phone match; single-space year lists still collapse") {
    import spark.implicits._
    // Tightened in r12 (VERDICT r11 advisory): at most ONE space/hyphen
    // between consecutive digits. Double spaces and spaced hyphens no
    // longer bridge unrelated digit groups…
    val (ne, ni, np) = TextFns.piiCounts(col("text"))
    def redact(text: String): (Int, String) =
      docs(Doc(1L, text)).select(np.as("p"), TextFns.redactPii(col("text")).as("c"))
        .as[(Int, String)].head()
    assert(redact("totals 2010  2011  2012 end") == ((0, "totals 2010  2011  2012 end")))
    assert(redact("range 2010 - 2011 - 2012 end") == ((0, "range 2010 - 2011 - 2012 end")))
    // …but the documented residual false-positive class is PINNED: a
    // SINGLE-space year list is structurally a grouped international
    // number (>=8 digits, one separator per gap) and still collapses.
    assert(redact("years 2010 2011 2012 end") == ((1, "years <PHONE> end")))
    // 7 digits is below the 8-digit floor; 8 is on it
    assert(redact("id 1234567 end")._1 == 0)
    assert(redact("id 12345678 end") == ((1, "id <PHONE> end")))
  }

  test("pii: clean text is untouched") {
    import spark.implicits._
    val text = "no addresses here at all"
    val df = docs(Doc(1L, text))
    val (ne, ni, np) = TextFns.piiCounts(col("text"))
    val (e, i, p, clean) = df
      .select(ne.as("e"), ni.as("i"), np.as("p"),
        TextFns.redactPii(col("text")).as("c"))
      .as[(Int, Int, Int, String)].head()
    assert((e, i, p) == ((0, 0, 0)) && clean == text)
  }

  // ---------------------------------------------------------- chunking

  test("chunking: 130 tokens at size 64 -> 64/64/2, lossless round-trip") {
    import spark.implicits._
    val toks = (1 to 130).map(i => s"t$i")
    val out = Chunk.byTokens(docs(Doc(7L, toks.mkString(" "))),
        col("doc_id"), col("text"), size = 64)
      .orderBy("chunk_id")
      .as[(Long, Int, Int, String)].collect()
    assert(out.map(_._2).toSeq == Seq(0, 1, 2))
    assert(out.map(_._3).toSeq == Seq(64, 64, 2))
    assert(out.map(_._4).mkString(" ") == toks.mkString(" "))
    assert(out.forall(_._1 == 7L))
  }

  test("chunking: NULL text yields no rows; empty text yields one empty chunk") {
    val out = Chunk.byTokens(docs(Doc(1L, null), Doc(2L, "")),
        col("doc_id"), col("text"), size = 8)
      .orderBy("doc_id").collect()
    assert(out.toSeq == Seq(Row(2L, 0, 1, "")))
  }

  test("chunking: non-positive size is rejected") {
    intercept[IllegalArgumentException] {
      Chunk.byTokens(docs(Doc(1L, "a")), col("doc_id"), col("text"), size = 0)
    }
  }

  test("chunking: stride < size emits overlapping windows at every start") {
    import spark.implicits._
    // 10 tokens, size 4, stride 2 -> starts 0,2,4,6,8; last two ragged
    val toks = (1 to 10).map(i => s"t$i")
    val out = Chunk.byTokens(docs(Doc(3L, toks.mkString(" "))),
        col("doc_id"), col("text"), size = 4, stride = 2)
      .orderBy("chunk_id")
      .as[(Long, Int, Int, String)].collect()
    assert(out.map(_._3).toSeq == Seq(4, 4, 4, 4, 2))
    assert(out.map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10", "t9 t10"))
  }

  test("chunking: stride == size reproduces the non-overlapping split; bad strides rejected") {
    import spark.implicits._
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val a = Chunk.byTokens(docs(Doc(1L, text)), col("doc_id"), col("text"), size = 4)
      .orderBy("chunk_id").as[(Long, Int, Int, String)].collect().toSeq
    val b = Chunk.byTokens(docs(Doc(1L, text)), col("doc_id"), col("text"), size = 4, stride = 4)
      .orderBy("chunk_id").as[(Long, Int, Int, String)].collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Chunk.byTokens(docs(Doc(1L, "a")), col("doc_id"), col("text"), size = 4, stride = 0)
    }
    intercept[IllegalArgumentException] {
      Chunk.byTokens(docs(Doc(1L, "a")), col("doc_id"), col("text"), size = 4, stride = 5)
    }
  }

  // ------------------------------------------- chunk→pack composition

  test("packChunks: chunks pack greedily in (doc_id, chunk_id) order; pair decodes back") {
    import spark.implicits._
    // three docs with ragged chunk counts: 10/1/3 tokens at size 4 →
    // chunks of 4,4,2 / 1 / 3 tokens
    val corpus = docs(
      Doc(5L, (1 to 10).map(i => s"a$i").mkString(" ")),
      Doc(2L, "solo"),
      Doc(9L, "x y z"))
    val chunks = Chunk.byTokens(corpus, col("doc_id"), col("text"), size = 4)
    val out = Chunk.packChunks(chunks, budget = 6)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Int, Long)].collect().toSeq
    // sequential greedy over (doc,chunk) order: (2,0,1) pre=0 → shard 0;
    // (5,0,4) pre=1 → 0; (5,1,4) pre=5 → 0; (5,2,2) pre=9 → 1;
    // (9,0,3) pre=11 → 1
    assert(out == Seq(
      (2L, 0, 1, 0L), (5L, 0, 4, 0L), (5L, 1, 4, 0L), (5L, 2, 2, 1L),
      (9L, 0, 3, 1L)))
  }

  test("gopherFlags: each rule trips on its designed fixture") {
    import spark.implicits._
    val goodBody = ("the quick brown words flow nicely and that prose " +
      "has normal shape with enough variety to be kept around here " +
      "plus some more filler tokens of usual length") // 31 words, all rules pass
    val docs = Seq(
      (1L, goodBody),
      (2L, "too short to pass the word count floor"),           // rule 1
      (3L, (1 to 30).map(_ => "a").mkString(" ")),              // rule 2: mean len 1
      (4L, goodBody + " ### ## # # #"),                         // rule 3: symbols
      (5L, (1 to 10).map(i => s"- bullet $i line").mkString("\n")), // rule 4: all bullets
      (6L, (1 to 10).map(i => s"trailing line $i ...").mkString("\n")), // rule 5
      (7L, (1 to 30).map(i => s"$i").mkString(" ")),            // rule 6: numeric words
      (8L, (1 to 30).map(i => s"word$i flows").mkString(" ")),  // rule 7: no stopwords
      (9L, ""), (10L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = docs
      .select(col("id"), TextFns.gopherFlags(col("t"), minWords = 25).as("g"))
      .select(col("id"), col("g.*"))
      .collect().map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean =
      out(id).getBoolean(out(id).fieldIndex(name))
    assert(flag(1L, "keep"), s"good doc must pass all rules: ${out(1L)}")
    assert(!flag(2L, "ok_word_count") && !flag(2L, "keep"))
    assert(!flag(3L, "ok_mean_word_len") && flag(3L, "ok_word_count"))
    assert(!flag(4L, "ok_symbol_ratio") && flag(4L, "ok_word_count"))
    assert(!flag(5L, "ok_bullet_lines"))
    assert(!flag(6L, "ok_ellipsis_lines"))
    assert(!flag(7L, "ok_alpha_words") && !flag(7L, "ok_stopwords"))
    assert(!flag(8L, "ok_stopwords") && flag(8L, "ok_alpha_words"))
    // empty + NULL: word-less docs fail every per-word rule and keep
    for (id <- Seq(9L, 10L)) {
      assert(out(id).getLong(out(id).fieldIndex("n_words")) == 0L)
      assert(!flag(id, "ok_word_count") && !flag(id, "ok_mean_word_len") &&
        !flag(id, "ok_alpha_words") && !flag(id, "keep"))
    }
  }

  test("gopherFlags: ellipsis char and 3-dot runs both count as symbols") {
    import spark.implicits._
    // 26 words + 3 symbol hits (…, …, one 4-dot run) -> ratio > 0.1
    val t = (1 to 26).map(_ => "and").mkString(" ") + " wait… hmm… well...."
    val out = Seq((1L, t)).toDF("id", "t")
      .select(TextFns.gopherFlags(col("t"), minWords = 25).as("g"))
      .select(col("g.ok_symbol_ratio")).head().getBoolean(0)
    assert(!out, "3 symbols / 29 words = 0.103 > 0.1 must trip rule 3")
  }

  test("c4Clean: line rules keep/drop by terminal punct, word floor, javascript") {
    import spark.implicits._
    val t = Seq(
      "A proper sentence with enough words.",  // kept
      "Ends with a question mark maybe?",      // kept
      "no terminal punctuation on this line",  // dropped: no ender
      "Too short.",                            // dropped: 2 words < 3
      "Please enable JavaScript to continue.", // dropped: javascript
      "  Trimmed line keeps its content.  ",   // kept (trimmed form)
      "Quoted line ends in a quote.\"",        // kept (end quotation)
      "").mkString("\n")
    val out = Seq((1L, t)).toDF("id", "t")
      .select(TextFns.c4Clean(col("t")).as("c")).select(col("c.*")).head()
    assert(out.getAs[String]("text_clean") == Seq(
      "A proper sentence with enough words.",
      "Ends with a question mark maybe?",
      "Trimmed line keeps its content.",
      "Quoted line ends in a quote.\"").mkString("\n"))
    assert(out.getAs[Long]("n_lines_kept") == 4L)
    assert(out.getAs[Long]("n_lines") == 8L)
  }

  test("c4Clean: document rules — lorem ipsum, curly brace, blocked phrases, sentence floor") {
    import spark.implicits._
    val good = (1 to 6).map(i => s"Sentence number $i is here.").mkString("\n")
    val rows = Seq(
      (1L, good),                                       // keep
      (2L, good + "\nAs Lorem Ipsum says."),            // lorem (case-insensitive)
      (3L, good + "\nvar config = { broken"),           // brace (line also dropped)
      (4L, good + "\nThe Forbidden Phrase appears."),   // blockedPhrases
      (5L, "Only two sentences here. That is all."),    // 2 < minSentences=5
      (6L, null.asInstanceOf[String]))                  // NULL text
      .toDF("id", "t")
    val out = rows
      .select(col("id"),
        TextFns.c4Clean(col("t"), blockedPhrases = Seq("forbidden phrase")).as("c"))
      .select(col("id"), col("c.*"))
      .collect().map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean =
      out(id).getBoolean(out(id).fieldIndex(name))
    assert(flag(1L, "keep"))
    assert(!flag(2L, "ok_no_lorem") && !flag(2L, "keep"))
    assert(!flag(3L, "ok_no_brace") && !flag(3L, "keep"))
    assert(!flag(4L, "ok_no_blocked") && !flag(4L, "keep") && flag(4L, "ok_no_lorem"))
    // the one-line sentence count: "Only two sentences here. That is all."
    // stays one LINE (no \n) with two '.' chars -> 2 sentences < 5
    assert(!flag(5L, "ok_min_sentences") && !flag(5L, "keep"))
    assert(out(6L).isNullAt(out(6L).fieldIndex("text_clean")))
    assert(out(6L).getLong(out(6L).fieldIndex("n_lines")) == 0L)
    assert(!flag(6L, "ok_no_lorem") && !flag(6L, "keep"))
  }

  test("c4Clean: sentence proxy counts [.!?] in the CLEANED text only") {
    import spark.implicits._
    // five dropped lines full of periods must not rescue the floor:
    // only the retained lines' enders count
    val t = (Seq.fill(5)("a.b. c.d. mid dots but no ender") :+
      "One real kept sentence lives here.").mkString("\n")
    val out = Seq((1L, t)).toDF("id", "t")
      .select(TextFns.c4Clean(col("t"), minSentences = 2).as("c"))
      .select(col("c.*")).head()
    assert(out.getAs[Long]("n_lines_kept") == 1L)
    assert(!out.getAs[Boolean]("ok_min_sentences"))
  }

  test("packChunks: the id synthesis holds at the documented doc_id bound (2^31 - 1)") {
    import spark.implicits._
    // doc_id = Int.MaxValue is the largest the doc_id·2³² + chunk_id
    // synthesis supports without Long overflow; multi-chunk docs there
    // must still decode and order correctly against a small-id doc
    val big = Int.MaxValue.toLong
    val corpus = docs(
      Doc(big, (1 to 5).map(i => s"b$i").mkString(" ")),
      Doc(1L, "one two"))
    val out = Chunk.packChunks(
        Chunk.byTokens(corpus, col("doc_id"), col("text"), size = 2), budget = 4)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Int, Long)].collect().toSeq
    // order: (1,0,2) pre=0 → 0; (big,0,2) pre=2 → 0; (big,1,2) pre=4 → 1;
    // (big,2,1) pre=6 → 1
    assert(out == Seq(
      (1L, 0, 2, 0L), (big, 0, 2, 0L), (big, 1, 2, 1L), (big, 2, 1, 1L)))
  }

  test("htmlToText: script/style/comment stripping, tags to spaces, one-level entities") {
    import spark.implicits._
    val cases = Seq(
      // script content with a raw '<' inside; case-insensitive close tag
      (1L, "<p>keep</p><script>var x = 1 < 2;</SCRIPT><p>too</p>", "keep too"),
      // style + multi-line comment spanning newlines
      (2L, "<style>p{color:red}</style>a<!-- drop\nme -->b", "a b"),
      // attribute-bearing and inline tags become single spaces
      (3L, "<div class=\"x\">one<b>two</b> three</div>", "one two three"),
      // entities: one-level decode, &amp; last; unknown entities survive
      (4L, "a&nbsp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt; &bogus;",
        "a b <tag> \"q\" 's' &lt; &bogus;"),
      // whitespace collapse + trim
      (5L, "  <br>  spaced \n out  <hr/>  ", "spaced out"),
      (6L, null.asInstanceOf[String], null),
      (7L, "", ""))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "html")
      .select(col("id"), graft.functions.TextFns.htmlToText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, _, want) <- cases) assert(got(id) == want, s"case $id: ${got(id)}")
  }

  test("htmlLinks: double-quoted hrefs in order; case/space tolerant; NULL and no-link edges") {
    import spark.implicits._
    val cases = Seq(
      (1L, "<a href=\"http://example.com/x\">a</a> <link HREF = \"https://sub.example.com/y\">",
        Seq("http://example.com/x", "https://sub.example.com/y")),
      (2L, "<a href='single-quoted'>out of subset</a><p>none</p>", Seq()),
      (3L, null.asInstanceOf[String], null),
      (4L, "", Seq()))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "html")
      .select(col("id"), graft.functions.TextFns.htmlLinks(col("html")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("http://example.com/x", "https://sub.example.com/y"))
    assert(got(2L) == Seq() && got(4L) == Seq())
    assert(got(3L) == null)
    // composition: extracted links feed the URL hygiene ops
    val canon = Seq((1L, "<a href=\"HTTP://EXAMPLE.com:80/p?utm_source=x\">z</a>"))
      .toDF("id", "html")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFns.htmlLinks(col("html"))).as("url"))
      .select(graft.functions.UrlFns.canonicalizeUrl(col("url")).as("c"))
      .as[String].head()
    assert(canon == "http://example.com/p")
  }

  test("htmlToText composes with the text gates: extract, then word count / c4") {
    import spark.implicits._
    val df = Seq((1L, "<html><body><p>The quick brown fox jumps here.</p>" +
      "<script>skip()</script></body></html>")).toDF("doc_id", "html")
    val out = df.select(
        graft.functions.TextFns.wordCount(
          graft.functions.TextFns.htmlToText(col("html"))).as("n"))
      .as[Int].head()
    assert(out == 6)
  }
}
