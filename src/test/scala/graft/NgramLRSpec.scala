package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{LogReg, NgramLR, NgramLrModel}

/** L53b hashed-n-gram quality classifier: the DCLM/fastText-shape
  * linear bag model must beat the 8-feature [[LogReg]] contract on a
  * held-out Gopher-labeled split (the capability it exists for),
  * train deterministically, score as a pure narrow plan, and keep the
  * module's NULL/quantization conventions. */
class NgramLRSpec extends SparkSpec {
  import spark.implicits._

  private def docsAt(sf: String) =
    spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      .select(col("doc_id"), col("text"))

  private def labeledAt(sf: String) = docsAt(sf).withColumn("_label",
    TextFns.gopherFlags(col("text"), minWords = 25, minStopwords = 1)
      .getField("keep"))

  test("beats the 8-feature model's gate agreement on a held-out Gopher split") {
    val all = labeledAt("sf0.1")
    // pin the training layout: the train is deterministic PER LAYOUT
    // (the LogReg caveat) and per within-partition ROW ORDER, both of
    // which follow the session's scan splits — a fixed hash layout +
    // in-partition sort pins the margin across environments
    val train = all.where(col("doc_id") % 4 =!= 3)
      .repartition(8, col("doc_id")).sortWithinPartitions("doc_id")
    val hold = all.where(col("doc_id") % 4 === 3)
      .select(col("doc_id"), col("text"), col("_label")).persist()
    try {
      val nHold = hold.count().toDouble
      assert(nHold > 500, s"held-out split too small: $nHold")
      def agreement(scored: org.apache.spark.sql.DataFrame): Double =
        hold.join(scored, hold("doc_id") === scored("id"))
          .where(col("keep") === col("_label")).count() / nHold
      val a8 = agreement(LogReg.score(hold, col("doc_id"), col("text"),
        LogReg.train(train, col("text"), col("_label"))))
      val ng = NgramLR.train(train, col("text"), col("_label"))
      val aN = agreement(NgramLR.score(hold, col("doc_id"), col("text"), ng))
      // STRICTLY better here (1.0000 vs 0.9968 at this split — both
      // trains are deterministic, so the margin is pinned, not flaky)
      assert(aN > a8, f"n-gram model $aN%.4f must beat 8-feature $a8%.4f on held-out")
      assert(aN >= 0.999, f"n-gram held-out agreement too low: $aN%.4f")
      // the L1 prior did its job: only cue buckets stay live
      assert(ng.w.count(_ != 0.0) < 256, s"bag should be sparse, ${ng.w.count(_ != 0.0)} live")
    } finally { hold.unpersist(); () }
  }

  test("training is deterministic for a fixed layout") {
    val df = labeledAt("sf0.01").where(col("doc_id") < 200)
      .repartition(4, col("doc_id")).persist()
    try {
      val m1 = NgramLR.train(df, col("text"), col("_label"), buckets = 512, iters = 10)
      val m2 = NgramLR.train(df, col("text"), col("_label"), buckets = 512, iters = 10)
      assert(m1.bias == m2.bias && m1.wLen == m2.wLen)
      assert(m1.lenW.sameElements(m2.lenW))
      assert(m1.w.sameElements(m2.w)) // bit-identical, == not tolerance
      val md5m = NgramLR.train(df, col("text"), col("_label"),
        buckets = 512, iters = 10, md5Hash = true)
      assert(md5m.w.length == 512)
    } finally { df.unpersist(); () }
  }

  test("NULL text scores NULL + keep=false; empty text scores bias + bin0; z chain hand-checked") {
    val model = NgramLrModel(
      buckets = 8, bias = 0.25, wLen = 0.5,
      lenW = Array.tabulate(NgramLR.LenBins)(k => if (k == 0) 0.125 else 0.0),
      w = Array(1.0, -1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0))
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "))
      .toDF("id", "text")
    val got = NgramLR.score(df, col("id"), col("text"), model)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))).toMap
    assert(got(1L) == ((None, None, false)))
    // empty/blank text: zero grams -> bin 0 -> z = 0.25 + 0.125 = 0.375
    val expect = math.round(1e6 * (1.0 / (1.0 + math.exp(-0.375))))
    assert(got(2L) == ((Some(0L), Some(expect), true)), got(2L).toString)
    assert(got(3L) == ((Some(0L), Some(expect), true)))
  }

  test("scoring equals an independent local re-derivation (exact micro dot + fixed z chain)") {
    val df = labeledAt("sf0.01").where(col("doc_id") < 100)
    val model = NgramLR.train(df, col("text"), col("_label"),
      buckets = 256, iters = 15, md5Hash = true)
    val got = NgramLR.score(df, col("doc_id"), col("text"), model, md5Hash = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // local twin: md5-bucket the same grams, presence-sum micro
    // weights over DISTINCT buckets + the length-bin lookup, the same
    // fixed z chain
    val local = df.select(col("doc_id"), col("text")).collect().map { r =>
      val id = r.getLong(0)
      val text = Option(r.getString(1))
      val toks = text.map(_.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      val grams = toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      val bs = grams.map { g =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex, 16) % 256
      }
      val n = bs.length
      val smic = bs.distinct.map(b => model.wMicro(b.toInt)).sum
      val binmic = model.lenWMicro(NgramLR.lenBin(n))
      val z = (model.biasMicro.toDouble
        + model.wLenMicro.toDouble * (n.toDouble / 100.0)
        + (binmic + smic).toDouble) / 1000000.0
      id -> (n.toLong, math.round(1e6 * (1.0 / (1.0 + math.exp(-z)))))
    }.toMap
    assert(got == local)
  }

  test("plan: scoring is a pure narrow projection — no exchange, no join, no UDF") {
    val model = NgramLrModel(4, 0.0, 0.0,
      new Array[Double](NgramLR.LenBins), Array(0.0, 0.0, 0.0, 0.0))
    val plan = NgramLR.score(docsAt("sf0.001"), col("doc_id"), col("text"), model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("bucket_dot"), plan)
  }

  test("save/load round trip scores identically; toFrame carries the scoring contract") {
    val df = labeledAt("sf0.01").where(col("doc_id") < 150)
    val model = NgramLR.train(df, col("text"), col("_label"), buckets = 128, iters = 10)
    val dir = java.nio.file.Files.createTempDirectory("nglr").toString
    NgramLR.save(model, dir, spark)
    val back = NgramLR.load(spark, dir)
    assert(back.buckets == model.buckets && back.bias == model.bias &&
      back.wLen == model.wLen && back.w.sameElements(model.w) &&
      back.lenW.sameElements(model.lenW))
    val f = NgramLR.toFrame(model, spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f.size == 128 + 2 + NgramLR.LenBins)
    assert(f(128L) == model.biasMicro && f(129L) == model.wLenMicro)
    assert((0 until NgramLR.LenBins).forall(k => f(130L + k) == model.lenWMicro(k)))
    assert((0 until 128).forall(i => f(i.toLong) == model.wMicro(i)))
  }
}
