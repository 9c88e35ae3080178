package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Registers graft's native kernels as SQL functions through Spark's
  * standard extension point, so `spark.sql("SELECT simhash64(...)")`
  * works alongside the Scala API:
  *
  *   - `word_shingles(tokens, k)`
  *   - `minhash_sig(tokens, numHashes)`
  *   - `minhash_bands(tokens, numHashes, bands)`
  *   - `simhash64(tokens)`
  *   - `cosine_sim(vecA, vecB)`
  *
  * Activate with `.withExtensions(new GraftExtensions)` (done by
  * [[graft.GraftSession]]) or
  * `spark.sql.extensions=org.apache.spark.sql.graftexpr.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def register(
      ext: SparkSessionExtensions, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit = {
    val info = new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")
    val fb: FunctionRegistry.FunctionBuilder = children => builder(children)
    ext.injectFunction((FunctionIdentifier(name), info, fb))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "word_shingles", "word_shingles(tokens, k) - word k-shingles of a token array",
      args => ShinglesExpr(args(0), intArg(args(1), "word_shingles", 1)))
    register(ext, "minhash_sig", "minhash_sig(tokens, numHashes) - k-permutation minhash signature",
      args => MinHashSigExpr(args(0), intArg(args(1), "minhash_sig", 1)))
    register(ext, "minhash_bands", "minhash_bands(tokens, numHashes, bands) - LSH band bucket keys",
      args => MinHashBandsExpr(args(0),
        intArg(args(1), "minhash_bands", 1), intArg(args(2), "minhash_bands", 2)))
    register(ext, "simhash64", "simhash64(tokens) - 64-bit simhash of a token array",
      args => SimHash64Expr(args(0)))
    register(ext, "cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays",
      args => CosineSimExpr(args(0), args(1)))
    register(ext, "unicode_norm", "unicode_norm(s, 'NFC'|'NFD'|'NFKC'|'NFKD') - Unicode normalization",
      args => UnicodeNormExpr(args(0), args(1) match {
        case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) => v.toString
        case other => throw new IllegalArgumentException(
          s"unicode_norm: argument 2 must be a string literal form, got $other")
      }))
    register(ext, "strip_accents", "strip_accents(s) - drop combining marks (NFD -> strip -> NFC)",
      args => StripAccentsExpr(args(0)))
  }
}
