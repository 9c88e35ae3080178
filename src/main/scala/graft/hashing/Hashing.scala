package graft.hashing

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Row-level hashing kernels for the dedup operators (SURVEY §2.5
  * L2/L3). Called from codegen'd Catalyst expressions
  * ([[graft.plans.MinHashSigExpr]] / [[graft.plans.SimHash64Expr]]), so
  * each is a single static call per row with tight JVM loops inside —
  * one pass over the token array, no per-element boxing.
  *
  * Re-expresses the minhash/simhash text-dedup recipes from the
  * published near-dup literature (Broder '97 minhash; Charikar '02
  * simhash) on Spark's own XXH64 kernel.
  */
object MinHashUtil {

  private final val Seed1 = 0x9E3779B97F4A7C15L
  private final val Seed2 = 0xC2B2AE3D27D4EB4FL

  /** k-permutation minhash signature of a string array in ONE pass:
    * two base xxhash64 values per element, then h_j = h1 + j·h2
    * (Kirsch–Mitzenmacher double hashing — standard public technique,
    * avoids k independent hash passes over the array). */
  def signature(tokens: ArrayData, numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
        var j = 0
        var h = h1
        while (j < numHashes) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

object SimHashUtil {

  private final val Seed = 0x27D4EB2F165667C5L

  /** 64-bit simhash of a string array in one pass: per-element xxhash64,
    * each bit votes ±1, sign of the vote vector becomes the output bit. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
