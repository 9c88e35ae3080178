package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** L35 Unicode canonicalization kernels: NFC folds composed ≡
  * decomposed, accent stripping, non-decomposable passthrough, NULL,
  * idempotence, SQL registration, narrow-plan shape. */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "café münchen São"
  private val decomposed = "cafe\u0301 mu\u0308nchen Sa\u0303o"

  test("NFC folds composed and decomposed to identical bytes") {
    val d = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
    val got = d.select(TextFns.unicodeNorm(col("t")).as("n"))
      .as[String].collect().toSet
    assert(got.size == 1)
    assert(got.head == composed)   // NFC prefers the composed form
    // and the fold matters: the raw strings are NOT equal
    assert(composed != decomposed)
  }

  test("stripAccents: marks drop, non-decomposable letters pass through") {
    val d = Seq(("café nño ø ł ÅÉÎ", 1)).toDF("t", "i")
    val got = d.select(TextFns.stripAccents(col("t"))).as[String].head()
    assert(got == "cafe nno ø ł AEI")
  }

  test("normalization is idempotent; NULL stays NULL; ASCII unchanged") {
    val d = Seq(Some(decomposed), Some("plain ascii"), None).toDF("t")
    val once = d.select(TextFns.unicodeNorm(col("t")).as("n"))
    val twice = once.select(TextFns.unicodeNorm(col("n")).as("n"))
    assert(once.collect().map(_.toSeq).toSeq == twice.collect().map(_.toSeq).toSeq)
    assert(once.where(col("n").isNull).count() == 1)
    assert(once.where(col("n") === "plain ascii").count() == 1)
  }

  test("NFKC additionally folds compatibility forms (ﬁ ligature, fullwidth)") {
    val d = Seq(("ﬁle Ｆull", 1)).toDF("t", "i")
    assert(d.select(TextFns.unicodeNorm(col("t"), "NFKC")).as[String].head() == "file Full")
    // NFC must NOT fold them — they are canonical-distinct
    assert(d.select(TextFns.unicodeNorm(col("t"), "NFC")).as[String].head() == "ﬁle Ｆull")
  }

  test("registered SQL functions work; the kernels stay in a narrow codegen plan") {
    val got = spark.sql(
      s"SELECT unicode_norm('$decomposed', 'NFC') AS n, strip_accents('$composed') AS s")
      .head()
    assert(got.getString(0) == composed && got.getString(1) == "cafe munchen Sao")
    val docs = tables.documents(spark, "/root/testdata/sf0.001").toNative
    val plan = docs.select(TextFns.stripAccents(TextFns.unicodeNorm(col("text"))))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string
    assert(!plan.contains("Exchange") && plan.contains("*(1)"),
      s"kernels must stay narrow and codegen'd:\n$plan")
  }
}
