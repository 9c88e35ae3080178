package graft

/** E13 depth: ordered windows beyond q9's row_number — rank, lag/lead,
  * running sum over frames (Spark superset of reference over()). */
class WindowSpec extends SparkSpec {
  import fixtures._

  object Sales extends GSchema {
    val region = col[String]("region")
    val day    = col[Int]("day")
    val amount = col[Double]("amount")
  }
  private def sales = Tio.fromDict(spark, Sales, Map(
    "region" -> Seq("e", "e", "e", "w", "w"),
    "day" -> Seq(1, 2, 3, 1, 2),
    "amount" -> Seq(10.0, 20.0, 5.0, 7.0, 7.0)))

  test("unordered over() aggregates per partition") {
    val out = sales
      .withCols(Sales.amount.sum.over(Sales.region).asName("region_total"))
      .toNative.orderBy("region", "day").collect()
    assert(out.map(_.getAs[Double]("region_total")).toSeq == Seq(35.0, 35.0, 35.0, 14.0, 14.0))
  }

  test("lag/lead and running sum over an ordered window") {
    val w = GWindow.partitionBy(Sales.region).orderBy(Sales.day.asc)
    val out = sales.withCols(
      gfn.lag(Sales.amount.tc, 1, w).asName("prev"),
      gfn.lead(Sales.amount.tc, 1, w).asName("next"),
      gfn.runningSum(Sales.amount.tc, w).asName("cum"),
      gfn.rank(w).asName("rk"),
      gfn.denseRank(w).asName("drk"),
    ).toNative.orderBy("region", "day").collect()

    val east = out.filter(_.getAs[String]("region") == "e")
    assert(east.map(r => Option(r.getAs[java.lang.Double]("prev")).map(_.toDouble)).toSeq ==
      Seq(None, Some(10.0), Some(20.0)))
    assert(east.map(r => Option(r.getAs[java.lang.Double]("next")).map(_.toDouble)).toSeq ==
      Seq(Some(20.0), Some(5.0), None))
    assert(east.map(_.getAs[Double]("cum")).toSeq == Seq(10.0, 30.0, 35.0))
    assert(east.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2, 3))
  }

  test("explicit rowsBetween frame bounds") {
    val w = GWindow.partitionBy(Sales.region).orderBy(Sales.day.asc).rowsBetween(-1, 0)
    val out = sales
      .withCols(Sales.amount.sum.overW(w.ws).asName("pair_sum"))
      .toNative.orderBy("region", "day").collect()
    assert(out.filter(_.getAs[String]("region") == "e")
      .map(_.getAs[Double]("pair_sum")).toSeq == Seq(10.0, 30.0, 25.0))
  }

  test("percent_rank / cume_dist / ntile: hand-computed incl. ties and singletons") {
    val w = GWindow.partitionBy(Sales.region).orderBy(Sales.amount.asc)
    val out = sales.withCols(
        gfn.percentRank(w).asName("pr"),
        gfn.cumeDist(w).asName("cd"),
        gfn.ntile(2, w).asName("half"))
      .toNative.orderBy("region", "day").collect()
    val e = out.filter(_.getAs[String]("region") == "e")
    // e amounts by day: 10, 20, 5 -> ranks (asc): 2,3,1
    assert(e.map(_.getAs[Double]("pr")).toSeq == Seq(0.5, 1.0, 0.0))
    assert(e.map(_.getAs[Double]("cd")).toSeq == Seq(2.0 / 3, 1.0, 1.0 / 3))
    assert(e.map(_.getAs[Int]("half")).toSeq == Seq(1, 2, 1)) // first bucket gets the extra row
    val wTied = out.filter(_.getAs[String]("region") == "w")
    // w: two tied 7.0 rows -> same rank -> pr 0.0 both, cume_dist 1.0 both
    assert(wTied.map(_.getAs[Double]("pr")).toSeq == Seq(0.0, 0.0))
    assert(wTied.map(_.getAs[Double]("cd")).toSeq == Seq(1.0, 1.0))
    assertThrows[IllegalArgumentException](gfn.ntile(0, w))
  }
}
