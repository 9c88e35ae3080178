package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables._

/** Driver contract — see /root/repo/SURVEY.md §7 + §2 (gate column). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E2/E6/F7/F10: arithmetic exprs + grouped aggregation (TPC-H Q1 shape)
    "q1_agg" -> { (s, dir) =>
      lineitem(s, dir)
        .groupBy(Lineitem.l_returnflag, Lineitem.l_linestatus)
        .agg(
          Lineitem.l_quantity.sum.asName("sum_qty"),
          (Lineitem.l_extendedprice.tc * (glit(1.0) - Lineitem.l_discount.tc)).sum.asName("sum_revenue"),
          Lineitem.l_quantity.mean.asName("avg_qty"),
          Lineitem.l_extendedprice.max.asName("max_price"),
          Lineitem.l_extendedprice.min.asName("min_price"),
          Lineitem.l_orderkey.count.asName("n_rows"),
          Lineitem.l_orderkey.nUnique.asName("n_orders"),
        ).toNative.orderBy("l_returnflag", "l_linestatus")
    },
  )

  /** DuckDB-equivalent SQL per query (column names must match exactly). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_revenue,
        |  avg(l_quantity) AS avg_qty,
        |  max(l_extendedprice) AS max_price,
        |  min(l_extendedprice) AS min_price,
        |  count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
