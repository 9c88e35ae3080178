package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{LangLR, LangLrModel}

/** L8b trained multiclass language ID: the fastText-lid-shape softmax
  * model must match the L8 heuristic on held-out fixtures PER LABEL
  * (the capability bar — the heuristic is exact on fixtures by
  * construction), train deterministically, score as a pure narrow
  * plan with exact integer argmax, and keep the module's NULL
  * conventions. */
class LangLRSpec extends SparkSpec {
  import spark.implicits._

  // one train shared by the agreement + re-derivation tests (the
  // model is deterministic, so sharing loses nothing)
  private lazy val model: LangLrModel = LangLR.train(
    LangLR.fixtures(spark, perClass = 30, seed = 20260816L),
    col("text"), col("label"), md5Hash = true)

  test("held-out fixture agreement >= heuristic agreement, per label") {
    val hold = LangLR.fixtures(spark, perClass = 12, seed = 424242L).persist()
    try {
      val truth = hold.select(col("id"), col("label"))
      def perLabel(pred: org.apache.spark.sql.DataFrame): Map[String, Double] =
        truth.join(pred, "id")
          .groupBy("label")
          .agg(avg((col("lang") === col("label")).cast("double")).as("acc"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val heur = perLabel(
        TextFns.withLangId(hold, col("text"), "lang").select("id", "lang"))
      val trained = perLabel(
        LangLR.score(hold, col("id"), col("text"), model, md5Hash = true)
          .select(col("id"), col("lang")))
      // fixture validity: the heuristic labels every fixture exactly
      assert(heur.values.forall(_ == 1.0),
        s"fixture generator must be heuristic-exact: $heur")
      LangLR.Classes.foreach { l =>
        assert(trained(l) >= heur(l),
          f"label $l: trained ${trained(l)}%.3f < heuristic ${heur(l)}%.3f")
      }
    } finally { hold.unpersist(); () }
  }

  test("training is deterministic (bit-identical micro tables)") {
    val fx = LangLR.fixtures(spark, perClass = 6, seed = 7L).persist()
    try {
      val m1 = LangLR.train(fx, col("text"), col("label"), buckets = 256, iters = 8)
      val m2 = LangLR.train(fx, col("text"), col("label"), buckets = 256, iters = 8)
      assert(m1.bias.sameElements(m2.bias))
      assert(m1.classes == LangLR.Classes)
      (m1.bagW, m2.bagW).zipped.foreach((a, b) => assert(a.sameElements(b)))
      (m1.cntW, m2.cntW).zipped.foreach((a, b) => assert(a.sameElements(b)))
    } finally { fx.unpersist(); () }
  }

  test("NULL text scores ('und', null); ties take the earliest class index") {
    val k = LangLR.Classes.length
    // hand-built model: all-zero weights -> every class ties at z=0 ->
    // the FIRST class in Classes order must win
    val zero = LangLrModel(LangLR.Classes, 4,
      new Array[Double](k),
      Array.fill(k)(new Array[Double](LangLR.NumCounts)),
      Array.fill(k)(new Array[Double](4)))
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "plain words"))
      .toDF("id", "text")
    val got = LangLR.score(df, col("id"), col("text"), zero)
      .collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)))).toMap
    assert(got(1L) == (("und", None)))
    assert(got(2L) == ((LangLR.Classes.head, Some(0L))), got(2L).toString)
    assert(got(3L) == ((LangLR.Classes.head, Some(0L))))
    // a bias nudge on a later class moves the argmax; earlier classes
    // still win exact ties with it
    val biased = zero.copy(bias = Array.tabulate(k)(c => if (c >= 2) 1.0 else 0.0))
    val got2 = LangLR.score(df, col("id"), col("text"), biased)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2(3L) == LangLR.Classes(2)) // first of the tied z=1e6 block
  }

  test("scoring equals an independent local re-derivation (exact K-class integer dot)") {
    val fx = LangLR.fixtures(spark, perClass = 4, seed = 99L)
      .unionAll(Seq((100000L, "", "x"), (100001L, "  mixed каша text  ", "x"))
        .toDF("id", "text", "label"))
    val got = LangLR.score(fx, col("id"), col("text"), model, md5Hash = true)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val local = fx.select(col("id"), col("text")).collect().map { r =>
      val id = r.getLong(0)
      val text = r.getString(1)
      val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val grams = toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      val bs = grams.map { g =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
        (java.lang.Long.parseLong(hex, 16) % model.buckets).toInt
      }.distinct
      // local langSig twin: per-script + cjk char counts
      val ranges = graft.hashing.LangSigUtil.ScriptRanges
      val cnts = new Array[Long](LangLR.NumCounts)
      text.foreach { ch =>
        if (ch >= 0x4E00 && ch <= 0x9FFF) cnts(ranges.length) += 1
        else ranges.indices.foreach { j =>
          if (ch >= ranges(j)._2 && ch <= ranges(j)._3) cnts(j) += 1
        }
      }
      val z = model.classes.indices.map { c =>
        model.biasMicro(c) +
          bs.map(b => model.bagMicro(c)(b)).sum +
          cnts.indices.map(j => cnts(j) * model.cntMicro(c)(j)).sum
      }
      val zMax = z.max
      id -> ((model.classes(z.indexOf(zMax)), zMax))
    }.toMap
    assert(got == local)
  }

  test("plan: scoring is a pure narrow projection — no exchange, no join, one multi_dot") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = LangLR.Classes.length
    val zero = LangLrModel(LangLR.Classes, 8,
      new Array[Double](k),
      Array.fill(k)(new Array[Double](LangLR.NumCounts)),
      Array.fill(k)(new Array[Double](8)))
    val plan = LangLR.score(docs, col("doc_id"), col("text"), zero)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("multi_dot"), plan)
  }

  test("toFrame carries the full scoring contract in the documented layout") {
    val k = LangLR.Classes.length
    val b = 16
    val rnd = new scala.util.Random(5)
    val m = LangLrModel(LangLR.Classes, b,
      Array.fill(k)(rnd.nextDouble()),
      Array.fill(k)(Array.fill(LangLR.NumCounts)(rnd.nextDouble() - 0.5)),
      Array.fill(k)(Array.fill(b)(rnd.nextDouble() - 0.5)))
    val f = LangLR.toFrame(m, spark).collect()
      .map(r => (r.getInt(0), r.getLong(2)) -> (r.getString(1), r.getLong(3))).toMap
    assert(f.size == k * (b + 1 + LangLR.NumCounts))
    LangLR.Classes.zipWithIndex.foreach { case (label, c) =>
      (0 until b).foreach(i =>
        assert(f((c, i.toLong)) == ((label, m.bagMicro(c)(i)))))
      assert(f((c, b.toLong)) == ((label, m.biasMicro(c))))
      (0 until LangLR.NumCounts).foreach(j =>
        assert(f((c, b.toLong + 1 + j)) == ((label, m.cntMicro(c)(j)))))
    }
  }
}
