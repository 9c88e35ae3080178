package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the text-dedup kernels (SURVEY §2.5
  * L2/L3). Native `Expression`s with `doGenCode`, NOT UDFs: they stay
  * inside whole-stage codegen (the generated code is a single static
  * call into [[graft.hashing]]), so the surrounding project/filter
  * pipeline keeps one codegen span and no serialization boundary.
  *
  * Lives under org.apache.spark.sql because `AbstractDataType` is
  * `private[sql]` in Spark 4 — same extension pattern as
  * [[org.apache.spark.sql.graftbridge.Bridge]].
  *
  * This is preference path (b) from the build brief: a scalar op Spark
  * lacks, expressed as a first-class Catalyst expression.
  */
final case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0 && numHashes <= 512, s"numHashes out of range: $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.MinHashUtil.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.MinHashUtil.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Word k-shingles over a token array — one pass (see
  * [[graft.hashing.ShingleUtil]] for why the HOF form is quadratic). */
final case class ShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k > 0 && k <= 64, s"shingle k out of range: $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.ShingleUtil.shingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.ShingleUtil.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** Fused minhash-signature + LSH band-bucket keys — one pass over the
  * token array (see [[graft.hashing.MinHashUtil.bandBuckets]] for why
  * fusing matters: lambda-based banding re-evaluates the signature per
  * band after projection collapse). */
final case class MinHashBandsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0 && numHashes <= 512, s"numHashes out of range: $numHashes")
  require(bands > 0 && numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.MinHashUtil.bandBuckets(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.MinHashUtil.bandBuckets($c, $numHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

/** Cosine similarity over two float/double array columns — native
  * codegen'd kernel (the `zip_with`+`aggregate` higher-order-function
  * form is interpreted per element with boxing). Result is bit-identical
  * to the sequential-double-fold formula the oracles mirror. Undefined
  * results (zero-norm vector, NaN elements) surface as NULL, not NaN —
  * `Double.compare` ranks NaN above every real number, so a propagated
  * NaN would poison any downstream top-k. */
final case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = graft.hashing.VecUtil.cosine(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.hashing.VecUtil.cosine($a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; ${ev.value} = 0.0; }
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

/** All sign-LSH hyperplane tables in one pass over the vector; `planes`
  * is the flattened [table][bit][dim] tensor shipped as a literal
  * reference object. Held as an immutable Seq (not Array) so two
  * structurally identical expressions compare equal — case-class
  * equality over an Array is reference-based, which defeats Catalyst
  * canonicalization and common-subexpression elimination. */
final case class HyperplaneBucketsExpr(
    child: Expression, planes: Seq[Double], tables: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.VecUtil.hyperplaneBuckets(
      input.asInstanceOf[ArrayData], planesArr, tables, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.hashing.VecUtil.hyperplaneBuckets($c, $planesRef, $tables, $bits, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}

/** Top-`top` IVF centroid ids by cosine for a vector column. The
  * UNIT-normalized centroid matrix ships ONCE per task as a codegen
  * reference object (`ctx.addReferenceObj`) — the literal-array
  * formulation (`array(struct(cosine(v, array(lit…))))` per centroid)
  * embeds nClusters×dim literals in the plan twice and is a plan-size
  * and codegen bomb past ~64 clusters. One k·dim pass per row
  * ([[graft.hashing.VecUtil.topCentroids]]). Centroids are an immutable
  * Seq (not Array) so structurally equal instances compare equal —
  * Array equality is reference-based and would defeat canonicalization
  * / common-subexpression elimination. */
final case class CentroidIdsExpr(child: Expression, centroids: Seq[Double], dim: Int, top: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(dim > 0 && centroids.nonEmpty && centroids.length % dim == 0,
    s"centroids length ${centroids.length} must be a positive multiple of dim=$dim")
  require(top > 0, s"top out of range: $top")

  @transient private lazy val centroidsArr: Array[Double] = centroids.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_ids"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.VecUtil.topCentroids(
      input.asInstanceOf[ArrayData], centroidsArr, dim, top, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroidsArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.hashing.VecUtil.topCentroids($c, $cRef, $dim, $top, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidIdsExpr =
    copy(child = newChild)
}

/** Product-quantization code assignment (array<int>, length m) — the
  * codebook tensor ships once per task as a codegen reference object,
  * same rationale as [[CentroidIdsExpr]]. Codebooks are an immutable
  * Seq so structurally equal instances canonicalize. */
final case class PqEncodeExpr(
    child: Expression, codebooks: Seq[Double], m: Int, subDim: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(m > 0 && subDim > 0 && k > 0 && codebooks.length == m * k * subDim,
    s"codebooks length ${codebooks.length} != m*k*subDim = ${m * k * subDim}")

  @transient private lazy val cbArr: Array[Double] = codebooks.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.VecUtil.pqEncode(input.asInstanceOf[ArrayData], cbArr, m, subDim, k, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCodebooks", cbArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.hashing.VecUtil.pqEncode($c, $cRef, $m, $subDim, $k, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Per-probe ADC lookup table (array<double>, length m·k). */
final case class PqLutExpr(
    child: Expression, codebooks: Seq[Double], m: Int, subDim: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(m > 0 && subDim > 0 && k > 0 && codebooks.length == m * k * subDim,
    s"codebooks length ${codebooks.length} != m*k*subDim = ${m * k * subDim}")

  @transient private lazy val cbArr: Array[Double] = codebooks.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.VecUtil.pqLut(input.asInstanceOf[ArrayData], cbArr, m, subDim, k, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCodebooks", cbArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.hashing.VecUtil.pqLut($c, $cRef, $m, $subDim, $k, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** ADC score of one (codes, lut) pair — O(m), the whole point of PQ:
  * scoring reads m table entries, never the dim floats. NaN (empty
  * codes / shape mismatch) surfaces as NULL so it cannot outrank real
  * scores, same contract as [[CosineSimExpr]]. */
final case class PqAdcExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(k > 0, s"k out of range: $k")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = graft.hashing.VecUtil.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.hashing.VecUtil.pqAdc($a, $b, $k);
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; ${ev.value} = 0.0; }
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcExpr =
    copy(left = l, right = r)
}

/** PCA projection (center + k ascending-index dot folds) as ONE
  * codegen'd kernel — the `zip_with`+`aggregate` HOF chain this
  * replaces is interpreted per element with boxing AND embeds a k·d
  * literal array in the plan (SURVEY §4's measured 64–80× tax; the
  * design rule the r15 verdict flagged). `meanComps` packs
  * `[mean :: comp_0 :: … :: comp_{k-1}]` flat and ships ONCE per task
  * via `addReferenceObj` (the [[CentroidIdsExpr]]/[[PqLutExpr]]
  * pattern); held as an immutable Seq so structurally equal instances
  * canonicalize. Arithmetic is bit-identical to the HOF chain (see
  * [[graft.hashing.VecUtil.pcaProject]]). */
final case class PcaProjectExpr(child: Expression, meanComps: Seq[Double], dim: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(dim > 0 && k > 0 && meanComps.length == (k + 1) * dim,
    s"meanComps length ${meanComps.length} != (k+1)*dim = ${(k + 1) * dim}")

  @transient private lazy val mcArr: Array[Double] = meanComps.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "pca_project"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.VecUtil.pcaProject(input.asInstanceOf[ArrayData], mcArr, dim, k, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mcRef = ctx.addReferenceObj("pcaMeanComps", mcArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.hashing.VecUtil.pcaProject($c, $mcRef, $dim, $k, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PcaProjectExpr =
    copy(child = newChild)
}

final case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.SimHashUtil.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.SimHashUtil.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Keep-set token filter — [[graft.hashing.TokenSetUtil.keep]] as a
  * codegen'd expression: filters a string array to the members of a
  * fixed set (duplicates and order preserved — term frequencies
  * survive, unlike `array_intersect`). The set ships ONCE per task as
  * a codegen reference object (the [[PcaProjectExpr]]/[[PqLutExpr]]
  * pattern); each element costs one hash-set probe, vs the interpreted
  * O(|keep|) per-token lambda of `filter(arr, t => t.isin(...))`. Used
  * by [[graft.operators.Bm25.score]]'s hot corpus scan. */
final case class KeepTokensExpr(child: Expression, keep: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(keep.nonEmpty, "keep set must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "keep_tokens"

  @transient private lazy val keepSet: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](keep.size * 2)
    keep.foreach(t => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.TokenSetUtil.keep(input.asInstanceOf[ArrayData], keepSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("keepSet", keepSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.hashing.TokenSetUtil.keep($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): KeepTokensExpr =
    copy(child = newChild)
}

/** BPE piece count over a token array — [[graft.hashing.BpeUtil]]'s
  * Sennrich-2016 exhaustive-merge segmentation as a codegen'd
  * expression: the frozen merge-rank table ships ONCE per task as a
  * codegen reference object; per word one memoized segmentation
  * (per-THREAD memo — the reference object is shared across task
  * threads). `mergesFlat` is the (left, right) pair list flattened —
  * see [[graft.operators.Bpe]] for the operator surface. */
final case class BpeCountExpr(child: Expression, mergesFlat: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(mergesFlat.length % 2 == 0, "merges must be (left, right) pairs")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  @transient private lazy val table = new graft.hashing.BpeUtil.Table(mergesFlat.toArray)

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.BpeUtil.countTokens(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table, "graft.hashing.BpeUtil.Table")
    defineCodeGen(ctx, ev, c => s"graft.hashing.BpeUtil.countTokens($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** The BPE pieces themselves in document order (see [[BpeCountExpr]];
  * prefer the count on hot paths — this materializes the array). */
final case class BpeSegmentsExpr(child: Expression, mergesFlat: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(mergesFlat.length % 2 == 0, "merges must be (left, right) pairs")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segments"

  @transient private lazy val table = new graft.hashing.BpeUtil.Table(mergesFlat.toArray)

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.BpeUtil.segmentsAll(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table, "graft.hashing.BpeUtil.Table")
    defineCodeGen(ctx, ev, c => s"graft.hashing.BpeUtil.segmentsAll($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentsExpr =
    copy(child = newChild)
}

/** Byte-level BPE piece count over RAW text (GPT-2 shape: regex
  * pretokenization + UTF-8 bytes lifted to the printable unicode
  * space, then the same exhaustive lowest-rank-leftmost merges) — see
  * [[BpeCountExpr]] for the codegen/memo discipline; `mergesFlat` is
  * in the MAPPED space (published merges.txt loads verbatim). */
final case class BpeCountBytesExpr(child: Expression, mergesFlat: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(mergesFlat.length % 2 == 0, "merges must be (left, right) pairs")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count_bytes"

  @transient private lazy val table = new graft.hashing.BpeUtil.Table(mergesFlat.toArray)

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.BpeUtil.countBytes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table, "graft.hashing.BpeUtil.Table")
    defineCodeGen(ctx, ev, c => s"graft.hashing.BpeUtil.countBytes($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountBytesExpr =
    copy(child = newChild)
}

/** The byte-level BPE pieces in document order, in the mapped space
  * (see [[BpeCountBytesExpr]]; prefer the count on hot paths). */
final case class BpeSegmentsBytesExpr(child: Expression, mergesFlat: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(mergesFlat.length % 2 == 0, "merges must be (left, right) pairs")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segments_bytes"

  @transient private lazy val table = new graft.hashing.BpeUtil.Table(mergesFlat.toArray)

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.BpeUtil.segmentsBytes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table, "graft.hashing.BpeUtil.Table")
    defineCodeGen(ctx, ev, c => s"graft.hashing.BpeUtil.segmentsBytes($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentsBytesExpr =
    copy(child = newChild)
}

/** tiktoken-vocabulary BPE piece count over RAW text (cl100k/o200k
  * shape: special tokens matched whole before pretokenization, then
  * per-pretoken merged-rank byte_pair_merge —
  * [[graft.hashing.BpeUtil.TiktokenTable]]). Same codegen/memo
  * discipline as [[BpeCountBytesExpr]]: frozen table as a reference
  * object, pure narrow projection. `tokensByRank` is in the MAPPED
  * byte space in ascending rank order. */
final case class BpeCountTiktokenExpr(child: Expression, tokensByRank: Seq[String],
    specials: Seq[String], pattern: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count_tiktoken"

  @transient private lazy val table = new graft.hashing.BpeUtil.TiktokenTable(
    tokensByRank.toArray, specials.toArray, pattern)

  override protected def nullSafeEval(input: Any): Any =
    table.countText(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("tiktokenTable", table,
      "graft.hashing.BpeUtil.TiktokenTable")
    defineCodeGen(ctx, ev, c => s"$tRef.countText($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountTiktokenExpr =
    copy(child = newChild)
}

/** The tiktoken pieces in document order (mapped space; specials as
  * their raw text — see [[BpeCountTiktokenExpr]]; prefer the count on
  * hot paths). */
final case class BpeSegmentsTiktokenExpr(child: Expression, tokensByRank: Seq[String],
    specials: Seq[String], pattern: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segments_tiktoken"

  @transient private lazy val table = new graft.hashing.BpeUtil.TiktokenTable(
    tokensByRank.toArray, specials.toArray, pattern)

  override protected def nullSafeEval(input: Any): Any =
    table.segmentsText(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("tiktokenTable", table,
      "graft.hashing.BpeUtil.TiktokenTable")
    defineCodeGen(ctx, ev, c => s"$tRef.segmentsText($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentsTiktokenExpr =
    copy(child = newChild)
}

/** Σ `table(b)` over a bucket-id array — the hashed-bag dot product of
  * [[graft.operators.NgramLR]] scoring, with the micro-quantized
  * weight table shipped ONCE per task as a codegen reference object
  * (the BpeCountExpr discipline). The sum is BIGINT over integer
  * micro-weights, so it is EXACT and order-free — the cross-engine
  * contract the micro quantization exists for. Out-of-range ids
  * contribute 0 (cannot occur for `pmod`/`%`-bucketed input; kept so a
  * crafted array can't throw). Pure narrow projection. */
final case class BucketDotExpr(child: Expression, wMicro: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "bucket_dot"

  @transient private lazy val table: Array[Long] = wMicro.toArray

  override protected def nullSafeEval(input: Any): Any =
    BucketDotExpr.dot(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bucketWeights", table, "long[]")
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftexpr.BucketDotExpr.dot($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketDotExpr =
    copy(child = newChild)
}

object BucketDotExpr {
  def dot(buckets: ArrayData, table: Array[Long]): Long = {
    val n = buckets.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (!buckets.isNullAt(i)) {
        val b = buckets.getLong(i)
        if (b >= 0 && b < table.length) s += table(b.toInt)
      }
      i += 1
    }
    s
  }
}

/** One-pass document statistics — [[graft.hashing.TextStatsUtil.stats]]
  * as a codegen'd expression: the integer counts behind the Gopher
  * rule gate and the LR quality features (token/word counts, lowered
  * token char sum, symbol count, line/bullet/ellipsis counts, alpha
  * tokens, distinct stopword hits) in two tight char scans, replacing
  * five regex passes plus interpreted per-line/per-token HOF lambdas
  * per document. Each count is bit-compatible with its Column twin —
  * the text_gopher/quality_lr oracles gate it. */
final case class TextStatsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("char_sum", IntegerType, nullable = false),
    StructField("n_sym", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_bullet", IntegerType, nullable = false),
    StructField("n_ellipsis", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.TextStatsUtil.stats(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hashing.TextStatsUtil.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

/** Per-list distinct stop-word hits + CJK count in one pass —
  * [[graft.hashing.LangSigUtil]] as a codegen'd expression over the
  * RAW text (the L8 language-ID signals). The Column twin ran one
  * `array_contains` scan per (list, word) — 32 token-array scans per
  * document for the four 8-word lists. Output:
  * `struct(hits array<int>, cjk int)` with hits(i) = distinct words of
  * `lists(i)` present among the text's space-delimited segments. */
final case class LangHitsExpr(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  require(lists.nonEmpty && lists.forall(_.nonEmpty), "probe lists must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("hits", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("cjk", IntegerType, nullable = false),
    // per-script char counts in LangSigUtil.ScriptRanges order
    StructField("scripts", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "lang_hits"

  @transient private lazy val table =
    new graft.hashing.LangSigUtil.Table(lists.map(_.toArray).toArray)

  override protected def nullSafeEval(input: Any): Any =
    graft.hashing.LangSigUtil.sig(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("langTable", table, "graft.hashing.LangSigUtil.Table")
    defineCodeGen(ctx, ev, c => s"graft.hashing.LangSigUtil.sig($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangHitsExpr =
    copy(child = newChild)
}

/** Per-class exact micro scores for a multinomial linear classifier
  * over (presence buckets + integer count features) — the L8b trained
  * language-ID apply ([[graft.operators.LangLR]]): for each class c,
  * `z_c = bias_c + Σ_{b ∈ buckets} bag_c[b] + Σ_j counts[j]·cw_c[j]`,
  * every term an integer micro unit, so the whole score vector is
  * BIGINT-exact and order-free — the argmax needs NO floating point,
  * which is what lets a SQL oracle re-derive the entire apply.
  * `buckets` should be DISTINCT ids (presence semantics — the caller
  * wraps `array_distinct`); out-of-range ids are ignored like
  * [[BucketDotExpr]]. Returns `array<long>` of K class scores; null if
  * either input is null. One row pass regardless of K (the K separate
  * BucketDotExpr formulation would re-scan the bucket array per
  * class AND overflow the codegen splitter at K ≈ 28). */
final case class MultiDotExpr(left: Expression, right: Expression,
    bagMicro: Seq[Seq[Long]], cntMicro: Seq[Seq[Long]], biasMicro: Seq[Long])
    extends BinaryExpression with ExpectsInputTypes {

  require(bagMicro.length == biasMicro.length && cntMicro.length == biasMicro.length,
    s"per-class tables disagree: bag ${bagMicro.length}, cnt ${cntMicro.length}, bias ${biasMicro.length}")
  require(biasMicro.nonEmpty, "need at least one class")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_dot"

  @transient private lazy val bag: Array[Array[Long]] = bagMicro.map(_.toArray).toArray
  @transient private lazy val cnt: Array[Array[Long]] = cntMicro.map(_.toArray).toArray
  @transient private lazy val bias: Array[Long] = biasMicro.toArray

  override protected def nullSafeEval(b: Any, c: Any): Any =
    MultiDotExpr.dot(b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], bag, cnt, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bagRef = ctx.addReferenceObj("mdBag", bag, "long[][]")
    val cntRef = ctx.addReferenceObj("mdCnt", cnt, "long[][]")
    val biasRef = ctx.addReferenceObj("mdBias", bias, "long[]")
    defineCodeGen(ctx, ev, (b, c) =>
      s"org.apache.spark.sql.graftexpr.MultiDotExpr.dot($b, $c, $bagRef, $cntRef, $biasRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiDotExpr =
    copy(left = newLeft, right = newRight)
}

object MultiDotExpr {
  def dot(buckets: ArrayData, counts: ArrayData,
      bag: Array[Array[Long]], cnt: Array[Array[Long]], bias: Array[Long]): ArrayData = {
    val k = bias.length
    val z = new Array[Long](k)
    System.arraycopy(bias, 0, z, 0, k)
    val nb = buckets.numElements()
    var i = 0
    while (i < nb) {
      if (!buckets.isNullAt(i)) {
        val b = buckets.getLong(i)
        if (b >= 0) {
          var c = 0
          while (c < k) {
            val t = bag(c)
            if (b < t.length) z(c) += t(b.toInt)
            c += 1
          }
        }
      }
      i += 1
    }
    val nc = counts.numElements()
    i = 0
    while (i < nc) {
      if (!counts.isNullAt(i)) {
        val v = counts.getInt(i)
        if (v != 0) {
          var c = 0
          while (c < k) {
            val t = cnt(c)
            if (i < t.length) z(c) += t(i) * v
            c += 1
          }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(z)
  }
}

/** Fused hashed-n-gram bucket ids — unigrams + consecutive bigrams of a
  * token array, each hashed into `buckets` buckets in ONE pass (see
  * [[graft.hashing.GramBucketUtil]] for why the HOF `transform(concat(
  * toks, bigrams(toks)), ...)` chain is slower: per-gram string
  * materialization, plus hex-render/substring/conv on the md5 branch).
  * `md5` picks the cross-engine kernel (first 8 hex chars of md5 as an
  * unsigned 32-bit int); default is XXH64 seed 42 + pmod — both
  * bit-identical to the HOF chain (GramBucketsSpec). */
final case class GramBucketsExpr(child: Expression, buckets: Int, md5: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  require(buckets > 0, s"buckets must be positive, got $buckets")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  // containsNull mirrors the HOF chain's transform output (its lambda
  // could yield NULL for a NULL gram on the md5 branch)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "gram_buckets"

  override protected def nullSafeEval(input: Any): Any =
    if (md5) graft.hashing.GramBucketUtil.bucketsMd5(input.asInstanceOf[ArrayData], buckets)
    else graft.hashing.GramBucketUtil.bucketsXx(input.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.hashing.GramBucketUtil.buckets${if (md5) "Md5" else "Xx"}($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): GramBucketsExpr =
    copy(child = newChild)
}
