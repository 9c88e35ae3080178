package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Pack}

/** L56 BPE token counting: hand-checked exhaustive-merge apply
  * (lowest rank first, leftmost on ties), training on a tiny corpus
  * (most-frequent pair, lexicographic ties, early exhaustion),
  * determinism, NULL/empty text, save/load round trip, the narrow
  * codegen plan, and the Pack budget composition the counts exist
  * for. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // merges: t+h -> th (0), th+e -> the (1), a+n -> an (2)
  private val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"))

  test("apply: exhaustive lowest-rank-leftmost merge, hand-checked") {
    val df = Seq(
      (1L, "the"),        // t h e -> th e -> the            = 1 piece
      (2L, "than"),       // t h a n -> th a n -> th an      = 2
      (3L, "theather"),   // -> the a the r                  = 4
      (4L, "x y"),        // no merges                       = 2
      (5L, "the than x")  // 1 + 2 + 1                       = 4
    ).toDF("id", "text")
    val got = df.select(col("id"), Bpe.count(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 4L, 4L -> 2L, 5L -> 4L))
    val segs = df.where(col("id") === 3)
      .select(Bpe.segments(col("text"), merges)).as[Seq[String]].head()
    assert(segs == Seq("the", "a", "the", "r"))
  }

  test("apply: rank order beats text order — the earlier merge wins first") {
    // with b+c ranked BEFORE a+b, "abc" must become a bc, not ab c
    val m = Seq(("b", "c"), ("a", "b"))
    val got = Seq((1L, "abc")).toDF("id", "text")
      .select(Bpe.segments(col("text"), m)).as[Seq[String]].head()
    assert(got == Seq("a", "bc"))
  }

  test("NULL text counts NULL; empty/blank counts 0; case normalizes") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "  "), (4L, "THE"))
      .toDF("id", "text")
    val got = df.select(col("id"), Bpe.count(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains(0L) && got(3L).contains(0L))
    assert(got(4L).contains(1L)) // tokens lowercase first: "the" -> 1 piece
  }

  test("fitMerges: most-frequent pair first, lexicographic ties, exhaustion stops early") {
    // corpus: "aa" x3, "ab" x1 -> pair (a,a) count 3 beats (a,b) count 1
    val df = Seq.fill(3)("aa").map(t => (1L, t)).++(Seq((2L, "ab"))).toDF("id", "text")
    val m = Bpe.fitMerges(df, col("text"), numMerges = 10)
    assert(m.head == (("a", "a")))
    // exhaustion: every word fully merged before 10 merges
    assert(m.length < 10)
    val counts = df.select(Bpe.count(col("text"), m).as("n")).as[Long].collect()
    assert(counts.forall(_ == 1L)) // each doc = one fully-merged word
    // determinism
    assert(Bpe.fitMerges(df, col("text"), numMerges = 10) == m)
  }

  test("fitMerges: bounded-sample contract fails fast on unbounded vocab") {
    val big = (1L to 50L).map(i => (i, s"w$i unique$i")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Bpe.fitMerges(big, col("text"), numMerges = 4, maxDistinctWords = 10)
    }
  }

  test("save/load round trip preserves rank order") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val m = Bpe.fitMerges(df, col("text"), numMerges = 6)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.toFrame(m, spark).repartition(1).write.mode("overwrite").parquet(dir)
    assert(Bpe.load(spark, dir) == m)
  }

  test("plan: the count is a pure narrow projection — no exchange, no join, no UDF") {
    // a parquet-backed scan (a local Seq relation would be folded away
    // by ConvertToLocalRelation and show no plan at all)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = df.select(col("doc_id"), Bpe.count(col("text"), merges).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("bpe_count"), plan)
  }

  // ------------------------------------------------------------------
  // L56b byte-level (GPT-2 shape)
  // ------------------------------------------------------------------

  test("byte map matches the published GPT-2 bytes_to_unicode values") {
    val m = graft.hashing.BpeUtil.ByteToChar
    assert(m(' '.toInt) == 'Ġ')  // Ġ — the famous leading-space marker
    assert(m('\n'.toInt) == 'Ċ') // Ċ
    assert(m('\t'.toInt) == 'ĉ') // ĉ
    assert(m('A'.toInt) == 'A' && m('~'.toInt) == '~') // printables identity
    assert(m(0) == 'Ā')          // first excluded byte -> 256
    assert(m(127) == 'ġ')        // DEL -> 256+33
    assert(m(160) == 'ł')        // NBSP byte -> 256+66
    assert(m(173) == 'Ń')        // SHY -> 256+67
    assert(m(0xFF) == 'ÿ' && m(0xA1) == '¡')
    assert(m.distinct.length == 256)  // bijective
  }

  test("pretokenizer: GPT-2 semantics hand-checked (contractions, lookahead splits)") {
    def p(s: String) = graft.hashing.BpeUtil.pretokenize(s).toSeq
    assert(p("Hello world") == Seq("Hello", " world"))
    assert(p("it's fine") == Seq("it", "'s", " fine"))
    assert(p("we'll go") == Seq("we", "'ll", " go"))
    // multi-space: \s+(?!\S) keeps the last space for the word
    assert(p("a  b") == Seq("a", " ", " b"))
    assert(p("No  42!!") == Seq("No", " ", " 42", "!!"))
    // apostrophe after spaces: punct takes " '", letters take the rest
    assert(p("a  'since") == Seq("a", " ", " '", "since"))
    assert(p("a 'since") == Seq("a", " '", "since"))
    // non-space whitespace binds alone
    assert(p("x\n\ny") == Seq("x", "\n", "\n", "y"))
    assert(p("tab\tz") == Seq("tab", "\t", "z"))
    // trailing whitespace stays one run
    assert(p("x  ") == Seq("x", "  "))
    assert(p("") == Seq())
  }

  test("pretokenizer is a lossless partition: tokens concatenate back to the text") {
    // the GPT-2 alternation covers every char class (letters, digits,
    // punct, whitespace, contractions), so any input splits with no
    // gaps or overlaps — the law every segmentation count relies on
    val rng = new scala.util.Random(31)
    val alphabet = "ab E9 .'!\t\n§日𝄞é  's'll"
    for (_ <- 1 to 200) {
      val s = Seq.fill(rng.nextInt(40))(alphabet(rng.nextInt(alphabet.length))).mkString
      val toks = graft.hashing.BpeUtil.pretokenize(s)
      assert(toks.mkString == s, s"lossy partition of ${s.map(_.toInt)}")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("byte-level apply: a GPT-2-format merges.txt fixture loads and counts hand-derived") {
    val lines = Seq("#version: 0.2", "t h", "th e", "Ġ t", "Ġt he")
    val m = Bpe.loadMergesLines(lines)
    assert(m == Seq(("t", "h"), ("th", "e"), ("Ġ", "t"), ("Ġt", "he")))
    // "the the": word "the" -> [the]; word " the" = Ġthe ->
    // (t,h)@0 -> [Ġ,th,e] -> (th,e)@1 -> [Ġ,the] = 2 pieces
    val df = Seq((1L, "the the")).toDF("id", "text")
    val segs = df.select(Bpe.segmentsBytes(col("text"), m)).as[Seq[String]].head()
    assert(segs == Seq("the", "Ġ", "the"), segs)
    val n = df.select(Bpe.countBytes(col("text"), m).as("n")).as[Long].head()
    assert(n == 3L)
    // malformed lines reject
    intercept[IllegalArgumentException] { Bpe.loadMergesLines(Seq("a b c")) }
  }

  test("byte-level: multi-byte UTF-8 seeds one symbol per BYTE") {
    val none = Seq.empty[(String, String)]
    val df = Seq((1L, "é"), (2L, "日"), (3L, "𝄞"), (4L, "aé"))
      .toDF("id", "text")
    val got = df.select(col("id"), Bpe.countBytes(col("text"), none).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 3L), got.toString)
  }

  test("fitMergesBytes: trains in the mapped space; NULL/empty semantics; determinism") {
    val df = Seq((1L, "aa aa"), (2L, "aa")).toDF("id", "text")
    val m = Bpe.fitMergesBytes(df, col("text"), numMerges = 2)
    // words: "aa" x2, " aa"=Ġaa x1 -> (a,a) count 3 first, then (Ġ,aa)
    assert(m == Seq(("a", "a"), ("Ġ", "aa")), m.toString)
    assert(Bpe.fitMergesBytes(df, col("text"), numMerges = 2) == m)
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "aa aa aa"))
      .toDF("id", "text")
    val got = edge.select(col("id"), Bpe.countBytes(col("text"), m).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains(0L))
    assert(got(3L).contains(3L)) // "aa" + Ġaa + Ġaa, each fully merged
    // save/load round trip survives the mapped-space chars
    val dir = java.nio.file.Files.createTempDirectory("bpeb").toString
    Bpe.toFrame(m, spark).repartition(1).write.mode("overwrite").parquet(dir)
    assert(Bpe.load(spark, dir) == m)
  }

  test("plan: byte-level count is a pure narrow projection too") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = df.select(col("doc_id"),
        Bpe.countBytes(col("text"), Seq(("a", "b"))).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("bpe_count_bytes"), plan)
  }

  // ------------------------------------------------------------------
  // tiktoken-format vocabularies (cl100k/o200k shape)
  // ------------------------------------------------------------------

  private def b64(s: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(s)
  private def b64s(s: String): String = b64(s.getBytes("UTF-8"))

  test("tiktoken: frozen fixture loads (base64+rank) and counts a hand-derived segmentation") {
    // the cl100k file format verbatim: `base64(token_bytes) rank` lines,
    // sparse out-of-order ranks (only rank ORDER drives the merge),
    // a multi-byte token ("é" = C3 A9), and the default special
    val lines = Seq(
      b64s("it") + " 40",
      b64s("i") + " 0",
      b64s("t") + " 1",
      b64s("'") + " 2",
      b64s("s") + " 3",
      b64s("'s") + " 57",
      b64s("1") + " 4", b64s("2") + " 5", b64s("3") + " 6",
      b64s("123") + " 90",
      b64s(" ") + " 7",
      b64(Array(0xC3.toByte)) + " 8", b64(Array(0xA9.toByte)) + " 9",
      b64s("é") + " 33",
      "", // blank lines skip
      b64s("abc") + " 100") // whole-word hit with NO reachable merge path
    val vocab = Bpe.loadTiktoken(lines)
    assert(vocab.pattern == Bpe.Cl100kPattern)
    // "it's 123<|endoftext|> éé" hand-derivation (cl100k pattern):
    //   span 1 "it's 123": [it]['s][ ][123]          = 4 pieces
    //     (" 123" splits " " + "123": \p{N}{1,3} never attaches a space)
    //   special                                       = 1
    //   span 2 " éé": " éé" -> bytes Ġ Ã© Ã© -> (Ã,©)=é rank 33 twice,
    //     ĠÃ/Ġé/éé not in vocab -> [Ġ][é][é]          = 3
    val df = Seq((1L, "it's 123<|endoftext|> éé")).toDF("id", "text")
    assert(df.select(Bpe.countTiktoken(col("text"), vocab)).as[Long].head() == 8L)
    val segs = df.select(Bpe.segmentsTiktoken(col("text"), vocab)).as[Seq[String]].head()
    assert(segs == Seq("it", "'s", "Ġ", "123", "<|endoftext|>", "Ġ", "Ã©", "Ã©"), segs)
    // whole-pretoken vocab hit short-circuits (tiktoken's encode does):
    // "abc" is rank 100 but neither "ab" nor "bc" exists, so only the
    // fast path can produce the single piece
    assert(Seq((1L, "abc")).toDF("id", "text")
      .select(Bpe.countTiktoken(col("text"), vocab)).as[Long].head() == 1L)
    // malformed lines reject
    intercept[IllegalArgumentException] { Bpe.loadTiktoken(Seq("notbase64rank")) }
    intercept[IllegalArgumentException] { Bpe.loadTiktoken(Seq(b64s("x") + " notanint")) }
  }

  test("tiktoken: merged-string ranks, not pair ranks — the lower-ranked CONCAT merges first") {
    // vocab has "bc" below "ab"; pair-rank merges.txt semantics would
    // need the (left,right) pair — here the merge walk keys the merged
    // byte string, so "abc" -> a + bc (and stops: "abc" not in vocab)
    val lines = Seq(b64s("a") + " 0", b64s("b") + " 1", b64s("c") + " 2",
      b64s("bc") + " 3", b64s("ab") + " 4")
    val vocab = Bpe.loadTiktoken(lines, specials = Nil)
    val segs = Seq((1L, "abc")).toDF("id", "text")
      .select(Bpe.segmentsTiktoken(col("text"), vocab)).as[Seq[String]].head()
    assert(segs == Seq("a", "bc"), segs)
  }

  test("tiktoken: cl100k pattern semantics — digit triples, case-insensitive contractions") {
    val vocab = Bpe.loadTiktoken((0 until 256).map(b => b64(Array(b.toByte)) + s" $b"))
    def segs(t: String): Seq[String] = Seq((1L, t)).toDF("id", "text")
      .select(Bpe.segmentsTiktoken(col("text"), vocab)).as[Seq[String]].head()
    // digits group in runs of ≤3 with no leading space attached
    assert(segs("12345") == Seq("1", "2", "3", "4", "5"))
    assert(Seq((1L, "12345")).toDF("id", "text")
      .select(Bpe.countTiktoken(col("text"), vocab)).as[Long].head() == 5L)
    // contraction branch is case-insensitive in cl100k (not in gpt2)
    assert(segs("IT'S").take(3) == Seq("I", "T", "'"), segs("IT'S"))
    assert(segs("IT'S").length == 4) // IT + 'S -> I,T + ',S as single bytes
    // specials count one piece each, adjacent specials included
    val v2 = Bpe.loadTiktoken((0 until 256).map(b => b64(Array(b.toByte)) + s" $b"),
      specials = Seq("<|endoftext|>", "<|fim_prefix|>"))
    assert(Seq((1L, "<|endoftext|><|fim_prefix|>x")).toDF("id", "text")
      .select(Bpe.countTiktoken(col("text"), v2)).as[Long].head() == 3L)
  }

  test("tiktoken: lines round trip and NULL/empty semantics") {
    val m = Seq(("t", "h"), ("th", "e"))
    val vocab = Bpe.tiktokenFromMerges(m, specials = Seq("<|endoftext|>"))
    val back = Bpe.loadTiktoken(Bpe.tiktokenLines(vocab),
      specials = vocab.specials, pattern = vocab.pattern)
    assert(back == vocab) // base64 survives all 256 single bytes + merges
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "the"))
      .toDF("id", "text")
    val got = edge.select(col("id"), Bpe.countTiktoken(col("text"), vocab).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains(0L))
    assert(got(3L).contains(1L)) // t h e -> th e -> the
  }

  test("plan: tiktoken count is a pure narrow projection too") {
    val vocab = Bpe.tiktokenFromMerges(Seq(("a", "b")))
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = df.select(col("doc_id"),
        Bpe.countTiktoken(col("text"), vocab).as("n"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("bpe_count_tiktoken"), plan)
  }

  test("composition: Pack.selectByBudget cuts by BPE tokens, not whitespace words") {
    // two docs with the SAME word count but different BPE counts: the
    // budget admits the cheap one and rejects the expensive one
    val df = Seq(
      (1L, "the the the", 1.0),   // 3 words -> 3 pieces under `merges`
      (2L, "xq zj vw", 0.9)       // 3 words -> 6 pieces (no merges apply)
    ).toDF("doc_id", "text", "score")
    val withW = df.withColumn("w", Bpe.count(col("text"), merges))
    val kept = Pack.selectByBudget(withW, col("doc_id"), col("w"), col("score"), budget = 4L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L)) // 3 fits in 4; adding 6 more would not
  }
}
