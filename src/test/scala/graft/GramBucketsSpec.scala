package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dsir, NgramLM}

/** The r21 fused gram-bucket kernel (GramBucketsExpr): bit-identical to
  * the HOF chain it replaced — `transform(concat(toks, bigrams(toks)),
  * g => hash(g) % buckets)` with the md5-hex-conv kernel or the
  * xxhash64+pmod kernel — across plain ASCII, unicode, empty, single-
  * token and NULL inputs, for several bucket counts. The HOF chain is
  * re-stated verbatim here as the reference. */
class GramBucketsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r21 reference chain, verbatim. */
  private def legacyBuckets(toks: org.apache.spark.sql.Column, buckets: Int,
      md5Hash: Boolean): org.apache.spark.sql.Column =
    transform(concat(toks, NgramLM.bigrams(toks)), g =>
      if (md5Hash) conv(substring(md5(g.cast("binary")), 1, 8), 16, 10).cast("long") % buckets
      else pmod(xxhash64(g), lit(buckets.toLong)))

  private val texts = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "one"),
    (2L, ""),
    (3L, null.asInstanceOf[String]),
    (4L, "café straße 北京 東京 καλημέρα مرحبا"),
    (5L, "a b a b a b"),
    (6L, "    leading and   trailing   "),
    (7L, (0 until 200).map(i => s"tok$i").mkString(" ")),
    (8L, "ŒÆ ß ß ŒÆ"),
  ).toDF("id", "text")

  for (md5Hash <- Seq(true, false); buckets <- Seq(7, 2048, 10000)) {
    test(s"fused kernel == HOF chain (md5=$md5Hash, buckets=$buckets)") {
      val toks = NgramLM.tokens(col("text"))
      val rows = texts
        .select(col("id"), toks.as("_t"))
        .select(col("id"),
          Dsir.bucketsOfTokens(col("_t"), buckets, md5Hash).as("fused"),
          legacyBuckets(col("_t"), buckets, md5Hash).as("legacy"))
        .collect()
      rows.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch for id=${r.getLong(0)}")
        if (!r.isNullAt(1))
          assert(r.getSeq[Any](1) == r.getSeq[Any](2),
            s"bucket mismatch for id=${r.getLong(0)} md5=$md5Hash buckets=$buckets")
      }
    }
  }

  test("null token elements mirror the HOF chain (md5: NULL, xx: seed)") {
    val df = Seq(Tuple1(Seq("a", null, "b"))).toDF("toks")
    val got = df.select(
      Dsir.bucketsOfTokens(col("toks"), 100, md5Hash = true).as("m"),
      legacyBuckets(col("toks"), 100, md5Hash = true).as("ml"),
      Dsir.bucketsOfTokens(col("toks"), 100, md5Hash = false).as("x"),
      legacyBuckets(col("toks"), 100, md5Hash = false).as("xl")).head()
    assert(got.getSeq[Any](0) == got.getSeq[Any](1))
    assert(got.getSeq[Any](2) == got.getSeq[Any](3))
  }
}
