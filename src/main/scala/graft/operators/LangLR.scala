package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions.TextFns

/** Fitted multinomial (softmax) linear language classifier. Per class
  * c: `bias(c)` the intercept, `cntW(c)(j)` the weight of integer
  * count feature j ([[LangLR.NumCounts]] script-char counts,
  * [[graft.hashing.LangSigUtil.ScriptRanges]] order then CJK), and
  * `bagW(c)(b)` the weight of presence bucket b (the
  * [[Dsir.bucketsOfTokens]] kernel). Training has the [[LogReg]]
  * determinism contract: partials combine in partition INDEX order,
  * fixed-order update chain — two trains over the same layout agree
  * bit-for-bit (the langlr_model aux export relies on it). */
final case class LangLrModel(
    classes: Seq[String], buckets: Int,
    bias: Array[Double], cntW: Array[Array[Double]], bagW: Array[Array[Double]]) {
  require(bias.length == classes.length, "bias table size != classes")
  require(cntW.length == classes.length && bagW.length == classes.length,
    "per-class tables size != classes")
  require(bagW.forall(_.length == buckets), "bag table width != buckets")
  require(cntW.forall(_.length == LangLR.NumCounts), "count table width != NumCounts")

  /** Micro-quantized scoring tables (round(1e6·w), the module-wide
    * cross-engine convention): the per-class score is then an exact
    * order-free BIGINT — presence sum + integer-count dot + bias —
    * and the ARGMAX needs no floating point at all, so a SQL oracle
    * re-derives the entire apply. */
  lazy val biasMicro: Seq[Long] = bias.toSeq.map(v => math.round(v * 1e6))
  lazy val cntMicro: Seq[Seq[Long]] = cntW.toSeq.map(_.toSeq.map(v => math.round(v * 1e6)))
  lazy val bagMicro: Seq[Seq[Long]] = bagW.toSeq.map(_.toSeq.map(v => math.round(v * 1e6)))
}

/** Trained multiclass language ID (SURVEY §2.5 L8b) — the published
  * method behind every per-language mixture cut: CCNet (Wenzek et al.
  * 2020 §3.1) gates on fastText lid.176 (Joulin et al. 2017), a
  * multinomial LINEAR model over hashed n-gram bags — not a stopword
  * heuristic. This is that shape on the repo's own kernels: the
  * [[Dsir.bucketsOfTokens]] hashed unigram+bigram presence bag (the
  * L42/L53b feature space) plus the [[TextFns.langSig]] script-char
  * counts (the L8 kernel's `scripts`+`cjk` fields) as dense integer
  * features, with a softmax head trained by the [[NgramLR]]
  * full-batch diagonal-Newton + L1-proximal recipe. [[TextFns
  * .withLangId]] stays the CHEAP pre-gate (one char scan, no
  * hashing); this model is the trained refinement over the same
  * signal families.
  *
  * Training data is synthetic per-language [[fixtures]] generated
  * from the exact L8 tables ([[TextFns.stopwordFamilies]] /
  * [[TextFns.scriptLabels]]), so the label space and the heuristic's
  * are identical by construction and the LangLRSpec law — trained
  * held-out agreement ≥ heuristic agreement per label — is
  * apples-to-apples.
  *
  * Cross-engine exactness: scoring quantizes every weight to integer
  * micro units, the per-class score is a BIGINT presence-sum +
  * integer count dot ([[org.apache.spark.sql.graftexpr.MultiDotExpr]]
  * — ONE row pass for all K classes), and the label is the FIRST
  * argmax in [[Classes]] order (ties break toward the lower class
  * index, mirrored by `ORDER BY z DESC, c ASC` in the oracle). No
  * sigmoid, no float: the entire apply is exact integer arithmetic.
  *
  * Scale shape (100 TB): TRAIN is bounded by construction (the
  * fixture set is K·perClass driver-built rows — a model artifact,
  * not corpus data; iters scans of a ≤8-partition persisted RDD).
  * SCORE is the corpus-scale member: tokenize → hash → one codegen'd
  * K-class BIGINT dot per row — a pure narrow projection, nothing
  * shuffles, nothing collects (the quality_lr_ngram shape with a
  * K-vector head). */
object LangLR {

  /** Integer count features: the 8 [[graft.hashing.LangSigUtil
    * .ScriptRanges]] char counts in slot order, then the CJK count —
    * exactly the `concat(sig.scripts, array(sig.cjk))` projection of
    * the L8 kernel, each with an exact RE2 strip mirror in SQL. */
  val NumCounts: Int = graft.hashing.LangSigUtil.ScriptRanges.length + 1

  /** The class table, in DOCUMENTED TIE ORDER (argmax ties take the
    * earliest index): script-decided labels first ([[TextFns
    * .scriptLabels]] order), then the stopword families ([[TextFns
    * .stopwordFamilies]] order) — the same label universe as the L8
    * heuristic, minus 'und' (a linear softmax always answers; callers
    * wanting an und-gate threshold on `z_micro` margin or pre-gate
    * with [[TextFns.withLangId]]). */
  val Classes: Seq[String] =
    TextFns.scriptLabels.map(_._1) ++ TextFns.stopwordFamilies.map(_._1)

  /** Row cap for the driver-local iteration path ([[TrainLoop]]):
    * 200k sparse rows ≈ tens of MB — bounded driver work; larger
    * inputs run the distributed per-iteration loop unchanged. */
  private[operators] val LocalTrainMaxRows = 200000L

  /** Filler tokens shared across every class (noise the L1 prox must
    * zero): ASCII, colliding with no stopword family probe. */
  private val Fillers = Vector(
    "zorp", "quux", "blarg", "fizzle", "wubble", "glork", "snarf", "plonk",
    "vrax", "kelp9", "drang", "mib")

  /** Deterministic synthetic per-language fixtures `(text, label)` —
    * `perClass` docs per [[Classes]] entry, seeded. Family classes
    * carry ALL 8 probe words (own distinct-hit count strictly beats
    * any other family's shared subset — da/no share 5 probes, the
    * worst case — so the L8 heuristic labels every fixture exactly)
    * shuffled among fillers; script classes carry 4–8 random words
    * from the deciding BMP range (ja adds a CJK word beside the kana:
    * real Japanese carries kanji, and the kana-first priority must
    * still decide ja). Driver-built bounded artifact: K·perClass tiny
    * rows — model-training input, never corpus data. */
  def fixtures(spark: SparkSession, perClass: Int = 30,
      seed: Long = 20260816L): DataFrame = {
    require(perClass > 0 && perClass <= 10000, s"perClass out of range: $perClass")
    val rnd = new scala.util.Random(seed)
    val texts = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def filler(): String = Fillers(rnd.nextInt(Fillers.size))
    for ((label, slot) <- TextFns.scriptLabels; _ <- 0 until perClass) {
      val (lo, hi) =
        if (slot < 0) (0x4E00, 0x9FFF)
        else {
          val r = graft.hashing.LangSigUtil.ScriptRanges(slot)
          (r._2, r._3)
        }
      def word(l: Int, h: Int): String =
        (0 until 2 + rnd.nextInt(5)).map(_ => (l + rnd.nextInt(h - l + 1)).toChar).mkString
      val ws = (0 until 4 + rnd.nextInt(5)).map(_ => word(lo, hi)) ++
        (if (label == "ja") Seq(word(0x4E00, 0x9FFF)) else Nil) ++
        Seq.fill(1 + rnd.nextInt(3))(filler())
      texts += ((rnd.shuffle(ws).mkString(" "), label))
    }
    for ((label, words) <- TextFns.stopwordFamilies; _ <- 0 until perClass) {
      val body = rnd.shuffle(words ++ Seq.fill(3 + rnd.nextInt(5))(filler()))
      texts += ((body.mkString(" "), label))
    }
    val rows = texts.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
    // explicit 8 parallelize slices: a FIXED partition layout + row
    // order, so training over fixtures is bit-deterministic (the
    // LogReg per-layout contract) — a LocalRelation would split by
    // defaultParallelism and an RDD coalesce groups by cache
    // locality, both run-dependent
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 8))
      .toDF("id", "text", "label")
  }

  /** The staged `(distinct buckets, counts, …)` feature projection
    * both train and score read: tokenization and the one-pass lang
    * signal each materialize once per row (the L8 staging contract —
    * CASE/transform branch values escape subexpression elimination). */
  private def featProjection(
      df: DataFrame, keep: Seq[(String, Column)], text: Column,
      buckets: Int, md5Hash: Boolean): DataFrame =
    df.select(keep.map { case (n, c) => c.as(n) } ++ Seq(
        NgramLM.tokens(text).as("_graft_toks"),
        TextFns.langSig(text).as("_graft_sig")): _*)
      .select(keep.map { case (n, _) => col(n) } ++ Seq(
        array_distinct(Dsir.bucketsOfTokens(col("_graft_toks"), buckets, md5Hash)).as("_graft_bs"),
        concat(col("_graft_sig").getField("scripts"),
          array(col("_graft_sig").getField("cjk"))).as("_graft_cs")): _*)

  /** Train the softmax head by full-batch DIAGONAL-Newton descent
    * (the [[NgramLR.train]] recipe lifted to K classes): each pass ONE
    * scan of the persisted sparse rows; per partition a dense
    * gradient + diagonal-Hessian pair accumulates over every class's
    * (bias, counts, buckets) block, partials combine in partition
    * INDEX order, and the per-coordinate damped Newton step applies
    * with an L1 proximal threshold on the bag block (word-identity
    * weights must earn their magnitude; fillers and random bigrams
    * zero out). The full softmax Hessian is (K·d)² — impossible; the
    * diagonal is the standard affordable surrogate. Rows whose label
    * is not in [[Classes]] (or with NULL text/label) skip. `md5Hash`
    * must match scoring (bucket placement differs between kernels). */
  def train(
      df: DataFrame, text: Column, label: Column,
      buckets: Int = 2048, iters: Int = 60, lr: Double = 0.7,
      l2: Double = 1e-6, l2Bag: Double = 1e-4, l1Bag: Double = 1e-4,
      damp: Double = 1e-2, md5Hash: Boolean = false): LangLrModel = {
    require(buckets > 0 && buckets <= 100000,
      s"buckets must be in (0, 1e5] (driver holds K gradients per bucket), got $buckets")
    require(iters > 0, s"iters must be positive, got $iters")
    val k = Classes.length
    val classIx: Map[String, Int] = Classes.zipWithIndex.toMap
    val feats = featProjection(df, Seq("_y" -> label.cast("string")), text, buckets, md5Hash)
      .where(col("_graft_bs").isNotNull && col("_y").isNotNull)
    // persist PRIMITIVE sparse rows in the INPUT's partition layout
    // (the per-layout determinism contract — [[fixtures]] pins 8
    // slices, keeping each iter's partial collect at 8 × 2·K·d
    // doubles ≈ a few MB)
    val rows = feats.rdd.flatMap { r =>
      classIx.get(r.getString(0)).map { y =>
        val bs = r.getSeq[Long](1)
        val set = new java.util.TreeSet[Integer]()
        bs.foreach(b => set.add(Integer.valueOf(b.toInt)))
        val ids = new Array[Int](set.size)
        var i = 0
        val it = set.iterator()
        while (it.hasNext) { ids(i) = it.next().intValue; i += 1 }
        val csSeq = r.getSeq[Int](2)
        (ids, csSeq.toArray, y)
      }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-class layout: [0] bias, [1, 1+NumCounts) counts, [1+NumCounts..) buckets
    val off = 1 + NumCounts
    val d = off + buckets
    val w = new Array[Double](k * d)
    // ONE per-partition fold shared by the driver-local and distributed
    // paths (the LogReg pattern) — defined once so they cannot drift.
    val fold = (wb: Array[Double], rs: Iterator[(Array[Int], Array[Int], Int)]) => {
      val g = new Array[Double](k * d)
      val h = new Array[Double](k * d)
      val z = new Array[Double](k)
      var c = 0L
      rs.foreach { case (ids, cs, y) =>
        // z_c = w_c·x, max-shifted softmax (fixed-order chain)
        var cc = 0
        var zMax = Double.NegativeInfinity
        while (cc < k) {
          val base = cc * d
          var zc = wb(base)
          var j = 0
          while (j < NumCounts) { zc += wb(base + 1 + j) * cs(j); j += 1 }
          var i = 0
          while (i < ids.length) { zc += wb(base + off + ids(i)); i += 1 }
          z(cc) = zc
          if (zc > zMax) zMax = zc
          cc += 1
        }
        var sum = 0.0
        cc = 0
        while (cc < k) { z(cc) = math.exp(z(cc) - zMax); sum += z(cc); cc += 1 }
        cc = 0
        while (cc < k) {
          val base = cc * d
          val p = z(cc) / sum
          val r0 = p - (if (cc == y) 1.0 else 0.0)
          val wgt = p * (1.0 - p)
          g(base) += r0; h(base) += wgt
          var j = 0
          while (j < NumCounts) {
            val x = cs(j).toDouble
            if (x != 0.0) { g(base + 1 + j) += r0 * x; h(base + 1 + j) += wgt * x * x }
            j += 1
          }
          var i = 0
          while (i < ids.length) {
            g(base + off + ids(i)) += r0
            h(base + off + ids(i)) += wgt
            i += 1
          }
          cc += 1
        }
        c += 1L
      }
      (g, h, c)
    }
    try {
      // Fixture-bounded training sets iterate DRIVER-LOCALLY
      // ([[TrainLoop]]): one collect instead of `iters` jobs,
      // bit-identical weights (same partition boundaries, row order,
      // and combine order); over-cap inputs fall back to the
      // distributed loop unchanged.
      val localParts = TrainLoop.localPartitions(rows, LocalTrainMaxRows)
      var it = 0
      while (it < iters) {
        val wb = w.clone()
        val partials = localParts match {
          case Some(ps) => ps.map(p => fold(wb, p.iterator))
          case None => rows.mapPartitions(rs => Iterator.single(fold(wb, rs))).collect()
        }
        val grad = new Array[Double](k * d)
        val hess = new Array[Double](k * d)
        var cnt = 0L
        partials.foreach { case (g2, h2, c2) =>
          var i = 0
          while (i < k * d) { grad(i) += g2(i); hess(i) += h2(i); i += 1 }
          cnt += c2
        }
        require(cnt > 0, "LangLR training needs at least one usable (text, label) row")
        val inv = 1.0 / cnt
        var i = 0
        while (i < k * d) {
          val isBag = (i % d) >= off
          val ridge = if (isBag) l2Bag else l2
          val denom = hess(i) * inv + ridge + damp
          var v = w(i) - lr * (grad(i) * inv + ridge * wb(i)) / denom
          if (isBag && l1Bag > 0) {
            val t = lr * l1Bag / denom
            v = if (v > t) v - t else if (v < -t) v + t else 0.0
          }
          w(i) = v
          i += 1
        }
        it += 1
      }
    } finally rows.unpersist(blocking = false)
    val off0 = 1 + NumCounts
    LangLrModel(Classes, buckets,
      Array.tabulate(k)(c => w(c * d)),
      Array.tabulate(k)(c => java.util.Arrays.copyOfRange(w, c * d + 1, c * d + off0)),
      Array.tabulate(k)(c => java.util.Arrays.copyOfRange(w, c * d + off0, (c + 1) * d)))
  }

  /** Score every doc: `(id, lang, z_micro)` — tokenize, hash, ONE
    * K-class exact BIGINT dot per row ([[org.apache.spark.sql
    * .graftexpr.MultiDotExpr]]), argmax with first-index tie priority
    * (`array_position` finds the FIRST max). NULL text → lang 'und'
    * (the heuristic's convention), NULL z_micro. Pure narrow
    * projection (plan-gated in LangLRSpec). */
  def score(df: DataFrame, id: Column, text: Column, model: LangLrModel,
      md5Hash: Boolean = false): DataFrame = {
    val staged = featProjection(df, Seq("id" -> id), text, model.buckets, md5Hash)
      .select(col("id"),
        Bridge.column(org.apache.spark.sql.graftexpr.MultiDotExpr(
          Bridge.expr(col("_graft_bs")), Bridge.expr(col("_graft_cs")),
          model.bagMicro, model.cntMicro, model.biasMicro)).as("_z"))
    val codes = array(model.classes.map(lit): _*)
    staged.select(col("id"),
      coalesce(
        element_at(codes, array_position(col("_z"), array_max(col("_z"))).cast("int")),
        lit("und")).as("lang"),
      array_max(col("_z")).as("z_micro"))
  }

  /** The model as a frame `(c, label, i, w_micro)`: per class c,
    * i ∈ [0, B) the bucket weights, i = B the bias, i = B+1+j the
    * count-feature weights ([[NumCounts]] of them) — all in the micro
    * units scoring actually uses (the exported table IS the scoring
    * contract the langlr_model oracle re-derives from). */
  def toFrame(model: LangLrModel, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val b = model.buckets.toLong
    val rows = model.classes.zipWithIndex.flatMap { case (label, c) =>
      model.bagMicro(c).zipWithIndex.map { case (v, i) => (c, label, i.toLong, v) } ++
        Seq((c, label, b, model.biasMicro(c))) ++
        model.cntMicro(c).zipWithIndex.map { case (v, j) => (c, label, b + 1 + j, v) }
    }
    rows.toDF("c", "label", "i", "w_micro")
  }
}
