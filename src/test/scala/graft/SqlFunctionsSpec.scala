package graft

/** The native kernels registered as SQL functions via
  * SparkSessionExtensions (GraftSession wires them in). */
class SqlFunctionsSpec extends SparkSpec {

  test("kernels are callable from spark.sql") {
    val r = spark.sql("""
      SELECT
        word_shingles(array('a','b','c','d'), 3) AS sh,
        size(minhash_sig(array('a','b','c'), 16)) AS sigLen,
        size(minhash_bands(array('a','b','c'), 16, 4)) AS nBands,
        simhash64(array('a','b','c')) AS sim,
        round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 1.0D)), 6) AS cs
    """).collect()(0)
    assert(r.getSeq[String](0).toList == List("a b c", "b c d"))
    assert(r.getAs[Int]("sigLen") == 16 && r.getAs[Int]("nBands") == 4)
    assert(r.getAs[Double]("cs") == BigDecimal(1.0 / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("SQL and Scala APIs produce identical kernel results") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val viaSql = spark.sql("SELECT simhash64(array('x','y','z')) AS s").head().getLong(0)
    val viaApi = spark.range(1)
      .select(TextFns.simhash64(array(lit("x"), lit("y"), lit("z"))).as("s"))
      .head().getLong(0)
    assert(viaSql == viaApi)
  }

  test("non-literal size arguments are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
