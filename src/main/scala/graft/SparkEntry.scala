package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables._

/** Intermediate target schemas for multi-join pipelines — the colnade
  * idiom: join → cast_schema to a declared shape → join again
  * (reference examples/basic_usage.py, dataframe.py:626). */
object derived {
  object OrdersCust extends GSchema {
    val o_orderkey   = col[Long]("o_orderkey")
    val o_totalprice = col[Double]("o_totalprice")
    val c_nationkey  = col[Int]("c_nationkey")
  }
  object OrdersNation extends GSchema {
    val o_orderkey   = col[Long]("o_orderkey")
    val o_totalprice = col[Double]("o_totalprice")
    val n_regionkey  = col[Int]("n_regionkey")
  }
  /** castSchema demo target: renames via mappedFrom + a widening cast. */
  object PartSlim extends GSchema {
    val partkey = col[Long]("partkey").from(Part.p_partkey)
    val pname   = col[String]("pname").from(Part.p_name)
    val retail  = col[Double]("retail").from(Part.p_retailprice)
    val size_l  = col[Long]("size_l").from(Part.p_size)
  }
}

/** Driver contract — see /root/repo/SURVEY.md §7 + §2 (gate column). */
object SparkEntry {
  import derived._

  /** Order-independent money sum, bit-identical across engines: double
    * summation is order-dependent (Spark's distributed sum vs DuckDB's
    * serial sum drift ~1e-6 at 1e9 magnitude), and double→DECIMAL casts
    * disagree between engines (DuckDB multiplies by 10^scale in double;
    * the JVM expands exactly). Rounding each value to integer cents is
    * deterministic — both engines round the SAME IEEE double — and the
    * BIGINT sum is exact. SQL mirror:
    * CAST(sum(CAST(round(x * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 */
  private def centsSum(x: TypedCol[Double]): TypedCol[Double] =
    (x * glit(100.0)).round(0).cast[Long].sum.cast[Double] / 100.0

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
          centsSum(Lineitem.l_extendedprice.tc * (glit(1.0) - Lineitem.l_discount.tc))
            .asName("sum_revenue"),
          Lineitem.l_quantity.mean.asName("avg_qty"),
          Lineitem.l_extendedprice.max.asName("max_price"),
          Lineitem.l_extendedprice.min.asName("min_price"),
          Lineitem.l_orderkey.count.asName("n_rows"),
          Lineitem.l_orderkey.nUnique.asName("n_orders"),
        ).toNative.orderBy("l_returnflag", "l_linestatus")
    },

    // E1/E3/E16/F1-F3/F8: filter + multi-key sort + limit + select
    "q2_filter_sort" -> { (s, dir) =>
      lineitem(s, dir)
        .filter(Lineitem.l_quantity > 30.0 && Lineitem.l_discount <= 0.05)
        .sort(Lineitem.l_extendedprice.desc, Lineitem.l_orderkey.asc, Lineitem.l_linenumber.asc)
        .limit(100)
        .select(Lineitem.l_orderkey, Lineitem.l_linenumber,
          Lineitem.l_extendedprice, Lineitem.l_quantity)
        .toNative
    },

    // F11/F12: two-table equi-join + grouped agg on a joined frame
    "q3_join_agg" -> { (s, dir) =>
      orders(s, dir)
        .join(customer(s, dir), Orders.o_custkey === Customer.c_custkey)
        .groupBy(Customer.c_mktsegment)
        .agg(
          centsSum(Orders.o_totalprice).asName("total_price"),
          Orders.o_orderkey.count.asName("n_orders"),
        ).sort(Customer.c_mktsegment).toNative
    },

    // F11 (left join): null-producing side + count of matches
    "q4_left_join" -> { (s, dir) =>
      customer(s, dir)
        .join(orders(s, dir), Customer.c_custkey === Orders.o_custkey, how = "left")
        .groupBy(Customer.c_custkey)
        .agg(
          Orders.o_orderkey.count.asName("n_orders"),
          centsSum(Orders.o_totalprice.fillNull(0.0)).asName("total_spent"),
        ).sort(Customer.c_custkey).toNative
    },

    // F11/F12/S5: 4-table star join via castSchema hops, dims broadcast
    "q5_multi_join" -> { (s, dir) =>
      val oc = orders(s, dir)
        .join(customer(s, dir), Orders.o_custkey === Customer.c_custkey)
        .castSchema(OrdersCust)
      val on = oc
        .join(nation(s, dir), OrdersCust.c_nationkey === Nation.n_nationkey, broadcastRight = true)
        .castSchema(OrdersNation)
      on.join(region(s, dir), OrdersNation.n_regionkey === Region.r_regionkey, broadcastRight = true)
        .groupBy(Region.r_name)
        .agg(
          centsSum(OrdersNation.o_totalprice.tc).asName("revenue"),
          OrdersNation.o_orderkey.count.asName("n_orders"),
        ).sort(Region.r_name).toNative
    },

    // E5: when/then/otherwise buckets + groupBy on a computed expr
    "q6_conditional" -> { (s, dir) =>
      val bucket = gwhen(Orders.o_totalprice > 350000.0).gthen("high")
        .gwhen(Orders.o_totalprice > 150000.0).gthen("mid")
        .gotherwise("low")
      orders(s, dir)
        .groupBySel(bucket.asName("bucket"))
        .agg(
          Orders.o_orderkey.count.asName("n_orders"),
          centsSum(Orders.o_totalprice).asName("total_price"),
        ).sort(gref[String]("bucket").asc).toNative
    },

    // E7: string functions (contains/starts/ends/len/case/strip/replace)
    "q7_string_ops" -> { (s, dir) =>
      part(s, dir)
        .filter(Part.p_type.strContains("AN") && !Part.p_name.strStartsWith("z"))
        .select(
          Part.p_partkey,
          Part.p_name.strToUppercase.asName("name_upper"),
          Part.p_name.strLen.asName("name_len"),
          Part.p_brand.strReplace("#", "-").asName("brand_dash"),
          Part.p_type.strEndsWith("M").asName("ends_m"),
          Part.p_name.strStrip.strToLowercase.asName("name_norm"),
        ).sort(gref[Long]("p_partkey").asc).toNative
    },

    // E8: temporal extraction + grouped agg by (year, month)
    "q8_date_ops" -> { (s, dir) =>
      orders(s, dir)
        .groupBySel(
          Orders.o_orderdate.dtYear.asName("oyear"),
          Orders.o_orderdate.dtMonth.asName("omonth"))
        .agg(
          Orders.o_orderkey.count.asName("n_orders"),
          centsSum(Orders.o_totalprice).asName("total_price"),
        ).sort(gref[Int]("oyear").asc, gref[Int]("omonth").asc).toNative
    },

    // E13: ordered window — top-5 customers per segment by balance
    "q9_window" -> { (s, dir) =>
      val w = GWindow.partitionBy(Customer.c_mktsegment)
        .orderBy(Customer.c_acctbal.desc, Customer.c_custkey.asc)
      customer(s, dir)
        .withCols(gfn.rowNumber(w).asName("rn"))
        .filter(gref[Int]("rn") <= 5)
        .select(Customer.c_mktsegment, Customer.c_custkey, Customer.c_acctbal, gref[Int]("rn").asName("rn"))
        .sort(Customer.c_mktsegment.asc, gref[Int]("rn").asc)
        .toNative
    },

    // E9: null handling — is_null probe, fill_null, null-skipping agg
    "q10_null_handling" -> { (s, dir) =>
      events(s, dir)
        .groupBy(Events.event_type)
        .agg(
          gwhen(Events.value.isNull).gthen(1L).gotherwise(0L).sum.asName("n_null_value"),
          Events.value.fillNull(0.0).sum.asName("sum_value_filled"),
          Events.value.mean.asName("avg_value"),
          Events.event_id.count.asName("n_events"),
        ).sort(Events.event_type).toNative
    },

    // F5: distinct key combinations
    "q11_distinct" -> { (s, dir) =>
      customer(s, dir)
        .select(Customer.c_nationkey, Customer.c_mktsegment)
        .unique()
        .sort(Customer.c_nationkey, Customer.c_mktsegment)
        .toNative
    },

    // F13: vertical concat of two filtered frames, re-aggregated
    "q12_concat" -> { (s, dir) =>
      val li = lineitem(s, dir)
      val a = li.filter(Lineitem.l_returnflag.tc === "A")
      val r = li.filter(Lineitem.l_returnflag.tc === "R")
      Tio.concat(a, r)
        .groupBy(Lineitem.l_returnflag)
        .agg(
          Lineitem.l_orderkey.count.asName("n_rows"),
          Lineitem.l_quantity.sum.asName("sum_qty"),
        ).sort(Lineitem.l_returnflag).toNative
    },

    // S5/E11: castSchema rename via mappedFrom + widening cast
    "q13_cast_schema" -> { (s, dir) =>
      part(s, dir)
        .castSchema(PartSlim)
        .sort(PartSlim.partkey)
        .toNative
    },

    // F9: whole-frame aggregation to one row
    "q14_agg_global" -> { (s, dir) =>
      lineitem(s, dir).agg(
        Lineitem.l_quantity.sum.asName("sum_qty"),
        (centsSum(Lineitem.l_extendedprice.tc) / Lineitem.l_orderkey.count.cast[Double])
          .asName("avg_price"),
        Lineitem.l_orderkey.count.asName("n_rows"),
        Lineitem.l_suppkey.nUnique.asName("n_supps"),
        Lineitem.l_shipdate.min.dtFormat("yyyy-MM-dd HH:mm:ss").asName("min_ship"),
        Lineitem.l_shipdate.max.dtFormat("yyyy-MM-dd HH:mm:ss").asName("max_ship"),
      ).toNative
    },

    // F11 superset: semi join — customers that placed at least one order
    "q15_semi_join" -> { (s, dir) =>
      customer(s, dir)
        .semiJoin(orders(s, dir), Customer.c_custkey === Orders.o_custkey)
        .select(Customer.c_custkey, Customer.c_name)
        .sort(Customer.c_custkey)
        .toNative
    },

    // F11 superset: anti join — customers with no orders
    "q16_anti_join" -> { (s, dir) =>
      customer(s, dir)
        .antiJoin(orders(s, dir), Customer.c_custkey === Orders.o_custkey)
        .select(Customer.c_custkey, Customer.c_name)
        .sort(Customer.c_custkey)
        .toNative
    },

    // E15: list accessor ops over embedding arrays
    "q17_list_ops" -> { (s, dir) =>
      embeddings(s, dir)
        .select(
          Embeddings.vec_id,
          Embeddings.embedding.listLen.asName("dim"),
          Embeddings.embedding.listGet(0).asName("first_val"),
          Embeddings.embedding.listMin.asName("vmin"),
          Embeddings.embedding.listMax.asName("vmax"),
          Embeddings.embedding.listContains(0.0f).asName("has_zero"),
        ).sort(gref[Long]("vec_id").asc).toNative
    },

    // ST1 batch-equivalent: tumbling 1h window agg over events
    "q18_events_window" -> { (s, dir) =>
      events(s, dir)
        .groupBySel(
          Events.ts.dtTruncate("hour").dtFormat("yyyy-MM-dd HH:mm:ss").asName("window_start"),
          Events.event_type)
        .agg(
          Events.event_id.count.asName("n_events"),
          Events.value.fillNull(0.0).sum.asName("sum_value"),
        ).sort(gref[String]("window_start").asc, Events.event_type.asc).toNative
    },
  )

  /** DuckDB-equivalent SQL per query (column names must match exactly). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_revenue,
        |  avg(l_quantity) AS avg_qty,
        |  max(l_extendedprice) AS max_price,
        |  min(l_extendedprice) AS min_price,
        |  count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_filter_sort" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_discount <= 0.05
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q3_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q4_left_join" ->
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_orders,
        |  CAST(sum(CAST(round(coalesce(o_totalprice, 0.0) * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q5_multi_join" ->
      """SELECT r_name,
        |  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q6_conditional" ->
      """SELECT CASE WHEN o_totalprice > 350000.0 THEN 'high'
        |            WHEN o_totalprice > 150000.0 THEN 'mid'
        |            ELSE 'low' END AS bucket,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q7_string_ops" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  replace(p_brand, '#', '-') AS brand_dash,
        |  p_type LIKE '%M' AS ends_m,
        |  lower(trim(p_name)) AS name_norm
        |FROM part
        |WHERE contains(p_type, 'AN') AND NOT starts_with(p_name, 'z')
        |ORDER BY p_partkey""".stripMargin,

    "q8_date_ops" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS oyear,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS omonth,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q9_window" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rn
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal DESC, c_custkey) AS rn
        |      FROM customer) t
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,

    "q10_null_handling" ->
      """SELECT event_type,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
        |  sum(coalesce(value, 0.0)) AS sum_value_filled,
        |  avg(value) AS avg_value,
        |  count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q11_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment
        |FROM customer ORDER BY 1, 2""".stripMargin,

    "q12_concat" ->
      """SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty
        |FROM (SELECT * FROM lineitem WHERE l_returnflag = 'A'
        |      UNION ALL
        |      SELECT * FROM lineitem WHERE l_returnflag = 'R') t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_cast_schema" ->
      """SELECT p_partkey AS partkey, p_name AS pname,
        |  p_retailprice AS retail, CAST(p_size AS BIGINT) AS size_l
        |FROM part ORDER BY 1""".stripMargin,

    "q14_agg_global" ->
      """SELECT sum(l_quantity) AS sum_qty,
        |  (CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0)
        |    / CAST(count(*) AS DOUBLE) AS avg_price,
        |  count(*) AS n_rows,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
        |  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship
        |FROM lineitem""".stripMargin,

    "q15_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY 1""".stripMargin,

    "q16_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY 1""".stripMargin,

    "q17_list_ops" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS first_val,
        |  list_min(embedding) AS vmin,
        |  list_max(embedding) AS vmax,
        |  list_contains(embedding, 0.0) AS has_zero
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q18_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type,
        |  count(*) AS n_events,
        |  sum(coalesce(value, 0.0)) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
