package graft

import org.apache.spark.sql.functions._
import graft.operators.{LogReg, LrModel}
import graft.functions.TextFns

/** L53 logistic-regression quality classifier: the feature contract
  * hand-checked, learning separates a separable fixture, scoring a
  * fixed model is exact and narrow, NULL propagation, keep derives
  * from the quantized score, save/load, fixed-layout determinism. */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  test("feature contract: exact integer ratios, hand-checked") {
    val df = Seq(
      (1L, "The  CAT sat"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "• the list...\n- of #things…\nplain end"))
      .toDF("id", "text")
    val got = df.select(col("id"),
        array(LogReg.featureExprs(col("text")): _*).as("x"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    // "The  CAT sat" -> norm "the cat sat" (11 chars), 3 tokens, raw len 12;
    // no symbols/bullets/ellipses, all 3 tokens alpha, 1 stopword (the)
    assert(got(1L) == Seq(3 / 100.0, 12 / 1000.0, (11 - 2) / 3.0,
      0.0, 0.0, 0.0, 1.0, 1 / 8.0))
    // empty text: 0 tokens, len 0, everything 0 by contract
    assert(got(2L) == Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    // NULL text: token/char features NULL (they gate the score to NULL)
    assert(got(3L)(0) == null && got(3L)(1) == null)
    // the Gopher-aligned ratios: 8 tokens (•, the, list..., -, of,
    // #things…, plain, end), raw len 37 = norm len (each \n -> one
    // space); symbols = '#' + '…' + one '...' run = 3; bullet lines
    // 2/3 ('•', '-'); ellipsis lines 2/3 (ends '...', ends '…');
    // alpha tokens 6/8 ('•' and '-' have no [a-z]); stopwords
    // {the, of} = 2 distinct
    assert(got(4L) == Seq(8 / 100.0, 37 / 1000.0, (37 - 7) / 8.0,
      3 / 8.0, 2 / 3.0, 2 / 3.0, 6 / 8.0, 2 / 8.0))
  }

  // separable corpus: "good" docs are long with word-like tokens,
  // "bad" docs are short; label = the Gopher-style length cue
  private val corpus = {
    val good = (1L to 40L).map(i =>
      (i, Array.fill(60)("alpha beta gamma delta").mkString(" "), true))
    val bad = (101L to 140L).map(i => (i, "tiny doc " + i, false))
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("train separates a separable fixture; score thresholds it correctly") {
    val m = LogReg.train(corpus, col("text"), col("label"))
    val got = LogReg.score(corpus, col("doc_id"), col("text"), m)
      .join(corpus.select(col("doc_id").as("id"), col("label")), "id")
      .select("keep", "label").as[(Boolean, Boolean)].collect()
    val acc = got.count(r => r._1 == r._2).toDouble / got.length
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("distilling the Gopher gate: scores correlate with the rule keep") {
    val mixed = (1L to 30L).map { i =>
      // alternate clearly-keep (60 natural words, stopwords present, mean
      // word length ~4.3) and clearly-drop (3 words, under the floor)
      if (i % 2 == 0)
        (i, ("the quick brown fox jumps over that lazy dog " +
          "with plenty of energy and resolve ") * 4)
      else (i, "short spam doc")
    }.toDF("doc_id", "text")
    val labeled = mixed.withColumn("label",
      TextFns.gopherFlags(col("text")).getField("keep"))
    val m = LogReg.train(labeled, col("text"), col("label"))
    val got = LogReg.score(mixed, col("doc_id"), col("text"), m)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert((1L to 30L).forall(i => got(i) == (i % 2 == 0)), got.toString)
  }

  test("score with a FIXED model is exact: hand-computed sigmoid, keep from the quantum") {
    val w = Array(-1.0, 2.0, 0.5, 0.25, 1.0, -0.5, 0.5, -0.25, 2.0)
    val m = LrModel(w)
    val df = Seq((1L, "aa bb cc"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = LogReg.score(df, col("doc_id"), col("text"), m)
      .as[(Long, Option[Long], Boolean)].collect().map(r => (r._1, (r._2, r._3))).toMap
    // "aa bb cc": 3 tokens, len 8, mean len 2.0; no symbols/bullets/
    // ellipses; alpha 3/3; no stopwords — the same left-associative fold
    val x = Seq(3 / 100.0, 8 / 1000.0, (8 - 2) / 3.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    val z = x.zipWithIndex.foldLeft(w(0) * 1.0) { case (acc, (v, i)) => acc + w(i + 1) * v }
    val exp = math.round(1e6 * (1.0 / (1.0 + math.exp(-z))))
    assert(got(1L) == ((Some(exp), exp >= 500000L)))
    assert(got(2L) == ((None, false)))   // NULL text -> NULL score, keep false
  }

  test("keep boundary: score_micro exactly 500000 keeps, 499999 drops") {
    // bias-only models pin the sigmoid: all-zero w -> sigma = 0.5 exactly
    val half = LogReg.score(Seq((1L, "x")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), LrModel(Array.fill(9)(0.0)))
      .as[(Long, Long, Boolean)].head()
    assert(half._2 == 500000L && half._3)
  }

  test("Gopher-aligned features separate classes the size cues cannot") {
    // Clean vs bulleted docs with IDENTICAL x1/x2/x3 (same token count,
    // same char length, same token lengths): only the bullet-line
    // fraction x5 differs, so a model that separates this fixture is
    // demonstrably using the widened contract — the r16 3-feature
    // contract was linearly blind to it.
    val line = (b: String) => s"$b fox of den"
    val clean = (1L to 40L).map(i => (i, Array.fill(12)(line("xx")).mkString("\n"), true))
    val bully = (101L to 140L).map(i => (i, Array.fill(12)(line("•x")).mkString("\n"), false))
    val df = (clean ++ bully).toDF("doc_id", "text", "label")
    // sanity: the size features really are identical across classes
    val xs = df.select(col("label"),
        array(LogReg.featureExprs(col("text")): _*).as("x"))
      .collect().map(r => (r.getBoolean(0), r.getSeq[Double](1)))
    val cleanX = xs.filter(_._1).map(_._2.take(3)).distinct.toSeq
    val bullyX = xs.filterNot(_._1).map(_._2.take(3)).distinct.toSeq
    assert(cleanX == bullyX, s"fixture broken: $cleanX vs $bullyX")
    val m = LogReg.train(df, col("text"), col("label"))
    val got = LogReg.score(df, col("doc_id"), col("text"), m)
      .join(df.select(col("doc_id").as("id"), col("label")), "id")
      .select("keep", "label").as[(Boolean, Boolean)].collect()
    val acc = got.count(r => r._1 == r._2).toDouble / got.length
    assert(acc == 1.0, s"accuracy $acc")
  }

  test("train skips NULL-text rows; an empty training set throws") {
    val withNulls = corpus.union(
      Seq((900L, null.asInstanceOf[String], true)).toDF("doc_id", "text", "label"))
    val m = LogReg.train(withNulls, col("text"), col("label"))
    // the NULL-text row is skipped, not learned from: the model still separates
    val got = LogReg.score(corpus, col("doc_id"), col("text"), m)
      .join(corpus.select(col("doc_id").as("id"), col("label")), "id")
      .select("keep", "label").as[(Boolean, Boolean)].collect()
    assert(got.forall(r => r._1 == r._2))
    intercept[IllegalArgumentException] {
      LogReg.train(corpus.where(col("doc_id") < 0), col("text"), col("label"))
    }
  }

  test("fixed-layout determinism: two trains over the same frame agree bit-for-bit") {
    val m1 = LogReg.train(corpus, col("text"), col("label"))
    val m2 = LogReg.train(corpus, col("text"), col("label"))
    assert(m1.weights.toSeq == m2.weights.toSeq)
  }

  test("save/load round trip; scoring plan is narrow (no exchange, no join)") {
    val m = LogReg.train(corpus, col("text"), col("label"))
    val dir = java.nio.file.Files.createTempDirectory("lrm").toString
    LogReg.save(m, dir, spark)
    assert(LogReg.load(spark, dir).weights.toSeq == m.weights.toSeq)
    val plan = LogReg.score(corpus, col("doc_id"), col("text"), m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
