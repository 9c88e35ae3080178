package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Fitted quality classifier: `weights(0)` is the bias, then one
  * weight per [[LogReg.featureExprs]] feature, in order. Training is
  * deterministic FOR A FIXED INPUT LAYOUT: per-partition partial
  * gradients combine on the driver in partition INDEX order (pinned —
  * unlike a `treeAggregate`, whose final reduce merges in task-arrival
  * order), so two trains over the same layout agree bit-for-bit (what
  * the lr_model aux export relies on); a differently-PARTITIONED input
  * changes the double-sum association and agrees only to float
  * tolerance. */
final case class LrModel(weights: Array[Double]) {
  def dim: Int = weights.length
}

/** Logistic-regression document-quality classifier (SURVEY §2.5 L53) —
  * the published corpus-filter shape: GPT-3 trained a classifier over
  * document features to score CommonCrawl against a trusted corpus
  * (Brown et al. 2020, arXiv:2005.14165 Appendix A), and the recipe
  * persists (CCNet's linear model, Wenzek 2020; DCLM's fastText
  * filter, Li et al. 2024). Labels come from any boolean column — the
  * intended use here is DISTILLING a rule gate ([[TextFns.gopherFlags]]
  * `.keep`, [[TextFns.c4Clean]] `.keep`) into a smooth, thresholdable
  * score, so the corpus can be CUT AT ANY QUALITY QUANTILE instead of
  * the rules' hard keep/drop (the select-by-budget composition:
  * score → [[Pack.selectByBudget]]).
  *
  * Features are a FIXED, engine-mirrorable contract (exact integer
  * ratios of token/char counts — no `ln`, no libm in the features, so
  * both engines build bit-identical inputs); the only transcendental
  * is the final sigmoid, whose ≤1-ulp cross-libm wobble is absorbed by
  * micro quantization (`score_micro = round(1e6·σ(w·x))` BIGINT, the
  * module convention). `keep` derives from the QUANTIZED score
  * (`score_micro ≥ 500000`), so the boolean can never disagree with
  * the score across engines.
  *
  * Scale shape (100 TB): TRAIN is full-batch gradient descent —
  * `iters` passes over a persisted (features, label) projection, each
  * ONE treeAggregate (d+1 doubles of state, log-depth combine, no
  * shuffle). Published practice fits quality classifiers on a BOUNDED
  * labeled sample (10⁵–10⁷ docs), so the training input is sample-
  * sized by contract — pass [[graft.operators.Sampling]] output.
  * SCORE is the corpus-scale member: a pure narrow projection (a
  * fixed-arity arithmetic chain + one sigmoid per row — whole-stage
  * codegen, nothing shuffles, nothing collects). */
object LogReg {

  /** Number of non-bias features in the contract. */
  val NumFeatures = 3

  /** The fixed feature contract over a text column (token counts per
    * [[NgramLM.tokens]]):
    *   x1 = n_tokens / 100.0
    *   x2 = char_length(text) / 1000.0
    *   x3 = mean token length = (len(normText) − (n_tokens−1)) / n_tokens
    *        (total token chars = normalized length minus the n−1
    *        single spaces; 0.0 for token-less docs)
    * Exact integer ratios — identical doubles in any engine. SQL
    * mirror (toks = the tokenization contract, nt = len(toks)):
    *   x1 = nt / 100.0
    *   x2 = length(text) / 1000.0
    *   x3 = CASE WHEN nt > 0 THEN (length(norm) - (nt - 1)) / CAST(nt AS DOUBLE) ELSE 0.0 END
    * NULL text → NULL features (score propagates NULL, keep false). */
  def featureExprs(text: Column): Seq[Column] = {
    val norm = TextFns.normText(text)
    val nt = size(NgramLM.tokens(text)).cast("long")
    Seq(
      nt.cast("double") / lit(100.0),
      length(text).cast("double") / lit(1000.0),
      when(nt > 0,
        (length(norm) - (nt - lit(1L))).cast("double") / nt.cast("double"))
        .otherwise(lit(0.0)))
  }

  /** Train by full-batch GD on log-loss: `iters` passes over a
    * persisted PRIMITIVE (x, y) RDD (unpersisted when training
    * returns), update `w ← w − lr/n · Σ(σ(w·x) − y)·x` with the bias
    * folded in as x0 = 1. Rows with NULL text or NULL label are
    * skipped.
    * Feature scaling is built into the contract (all three land ~O(1)
    * on natural documents), so plain GD converges without
    * standardization state.
    *
    * Each pass computes per-PARTITION partial gradients and combines
    * them on the driver IN PARTITION INDEX ORDER (a `treeAggregate`
    * would merge in task-ARRIVAL order — its final reduce is why
    * [[Pca]]'s determinism carries the fixed-layout caveat; here the
    * combine order is pinned, so two trains over the same layout are
    * bit-identical). The per-pass driver traffic is P·(d+1) doubles —
    * bounded: the training input is sample-sized by contract. */
  def train(
      df: DataFrame, text: Column, label: Column,
      iters: Int = 60, learnRate: Double = 1.0): LrModel = {
    require(iters > 0, s"iters must be positive, got $iters")
    require(learnRate > 0, s"learnRate must be positive, got $learnRate")
    val d = NumFeatures + 1
    val feats = df
      .select(array(featureExprs(text): _*).as("x"), label.cast("boolean").as("y"))
      .where(col("x").isNotNull && !exists(col("x"), v => v.isNull) &&
        col("y").isNotNull)
    // Persist the PRIMITIVE rows, not the frame: every GD pass reads
    // this `iters` times, and caching the DataFrame would still pay
    // Row→array deserialization per pass (measured 3.2 s/pass on the
    // 100× table; as primitives the pass is the arithmetic alone).
    val rows = feats.rdd.map(r =>
      (r.getSeq[Double](0).toArray, if (r.getBoolean(1)) 1.0 else 0.0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = new Array[Double](d)
    val nf = NumFeatures
    var it = 0
    while (it < iters) {
      val wb = w.clone()
      // collect() returns partials in partition INDEX order — the
      // pinned combine order that makes the pass deterministic.
      val partials = rows.mapPartitions { rs =>
        val g = new Array[Double](d)
        var c = 0L
        rs.foreach { case (x, y) =>
          var z = wb(0)
          var i = 0
          while (i < nf) { z += wb(i + 1) * x(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          g(0) += p - y
          i = 0
          while (i < nf) { g(i + 1) += (p - y) * x(i); i += 1 }
          c += 1L
        }
        Iterator.single((g, c))
      }.collect()
      val grad = new Array[Double](d)
      var cnt = 0L
      partials.foreach { case (g2, c2) =>
        var i = 0
        while (i < d) { grad(i) += g2(i); i += 1 }
        cnt += c2
      }
      require(cnt > 0, "LogReg training needs at least one usable (text, label) row")
      var i = 0
      while (i < d) { w(i) -= learnRate / cnt * grad(i); i += 1 }
      it += 1
    }
    rows.unpersist(blocking = false)
    LrModel(w)
  }

  /** Score every doc: `(id, score_micro, keep)` with `score_micro =
    * round(1e6·σ(w·x))` (BIGINT; NULL for NULL text) and `keep =
    * score_micro ≥ 500000` (false for NULL). The w·x chain is the
    * fixed left-associative fold `((w0·1 + w1·x1) + w2·x2) + w3·x3`,
    * mirrored verbatim by the SQL oracle. Pure narrow projection. */
  def score(df: DataFrame, id: Column, text: Column, model: LrModel): DataFrame = {
    require(model.dim == NumFeatures + 1,
      s"model has ${model.dim} weights, contract needs ${NumFeatures + 1}")
    val xs = featureExprs(text)
    val z = xs.zipWithIndex.foldLeft(lit(model.weights(0)) * lit(1.0): Column) {
      case (acc, (x, i)) => acc + lit(model.weights(i + 1)) * x
    }
    val scoreMicro =
      round(lit(1000000.0) * (lit(1.0) / (lit(1.0) + exp(-z))), 0).cast("long")
    df.select(id.as("id"), scoreMicro.as("score_micro"))
      .withColumn("keep", coalesce(col("score_micro") >= 500000L, lit(false)))
  }

  /** The weights as a frame: rows `(i, w)` with i = 0 the bias — the
    * persisted/exported shape (the [[Pca.toFrame]] pattern). */
  def toFrame(model: LrModel, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    model.weights.zipWithIndex.map { case (w, i) => (i, w) }.toSeq.toDF("i", "w")
  }

  /** Persist a fitted model. */
  def save(model: LrModel, path: String, spark: org.apache.spark.sql.SparkSession): Unit =
    toFrame(model, spark).repartition(1).write.mode("overwrite").parquet(path)

  /** Load a model saved by [[save]] (columns read by name). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): LrModel = {
    val m = spark.read.parquet(path).select("i", "w")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    LrModel(Array.tabulate(m.size)(m(_)))
  }
}
