package graft

import java.nio.file.Files

import org.apache.spark.sql.graftbridge.Bridge

/** S4, F16, F18: typed construction, parquet/csv round trips, typed row
  * iteration, Arrow interchange (reference tests/e2e/test_io.py,
  * arrow.py:27-70). */
class IoSpec extends SparkSpec {
  import fixtures._
  private def freshDir(tag: String) =
    Files.createTempDirectory(s"graft-io-$tag").toString

  test("fromRows round-trips through a typed Dataset") {
    import spark.implicits._
    val tf = Tio.fromRows(spark, Users, users)
    assert(tf.height == 4L)
    val back = tf.toDS[UserRow].collect().sortBy(_.id).toSeq
    assert(back == users)
  }

  test("fromDict builds a typed frame column-wise") {
    val tf = Tio.fromDict(spark, Users, Map(
      "id" -> Seq(10L, 11L),
      "name" -> Seq("x", "y"),
      "age" -> Seq(null, 30L),
      "score" -> Seq(1.0, 2.0)))
    assert(tf.height == 2L)
    assert(tf.df.where("id = 10 AND name = 'x' AND age IS NULL").count() == 1L)
    assert(tf.df.where("id = 11 AND age = 30").count() == 1L)
    val err = intercept[IllegalArgumentException] {
      Tio.fromDict(spark, Users, Map("id" -> Seq(1L)))
    }
    assert(err.getMessage.contains("missing columns"))
  }

  test("rowsToDict is the columnar inverse of fromDict") {
    val data = Map[String, Seq[Any]](
      "id" -> Seq(10L, 11L),
      "name" -> Seq("x", "y"),
      "age" -> Seq(null, 30L),
      "score" -> Seq(1.0, 2.0))
    val tf = Tio.fromDict(spark, Users, data)
    val back = tf.sort(Users.id.asc).rowsToDict()
    assert(back == data)
    // and round-trips back into an identical frame
    val again = Tio.fromDict(spark, Users, back)
    assert(again.sort(Users.id.asc).rowsToDict() == data)
  }

  test("jsonl write/read round trip with pinned schema (no inference pass)") {
    import spark.implicits._
    val dir = freshDir("jsonl") + "/users"
    Tio.writeJson(Tio.fromRows(spark, Users, users), dir)
    val back = Tio.readJson(spark, dir, Users)
    assert(back.toDS[UserRow].collect().sortBy(_.id).toSeq == users)
    // extra fields in the source are pruned; missing nullable reads null
    val mixed = freshDir("jsonl-x")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$mixed/rows.jsonl"),
      """{"id": 9, "name": "zed", "score": 1.5, "extra": "ignored"}""" + "\n")
    val loose = Tio.readJson(spark, mixed, Users).collectRows()
    assert(loose.length == 1 && loose(0).getAs[Any]("age") == null)
  }

  test("parquet write/read round trip preserves schema and rows") {
    import spark.implicits._
    val dir = freshDir("pq") + "/users"
    val tf = Tio.fromRows(spark, Users, users)
    Tio.writeParquet(tf, dir)
    val back = Tio.readParquet(spark, dir, Users)
    assert(back.toDS[UserRow].collect().sortBy(_.id).toSeq == users)
  }

  test("csv write/read round trip") {
    import spark.implicits._
    val dir = freshDir("csv") + "/users"
    val tf = Tio.fromRows(spark, Users, users)
    Tio.writeCsv(tf, dir)
    val back = Tio.readCsv(spark, dir, Users)
    assert(back.toDS[UserRow].collect().sortBy(_.id).toSeq == users)
  }

  test("orc write/read round trip preserves schema and rows; scan pushes filters") {
    import spark.implicits._
    val dir = freshDir("orc") + "/users"
    val tf = Tio.fromRows(spark, Users, users)
    Tio.writeOrc(tf, dir)
    val back = Tio.readOrc(spark, dir, Users)
    assert(back.toDS[UserRow].collect().sortBy(_.id).toSeq == users)
    // same 100 TB scan contract as parquet: predicate reaches the ORC
    // scan and the projection is pruned to the schema's columns
    val plan = back.filter(Users.score > 50.0).toNative
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(score,50.0)"),
      s"expected pushed ORC filter:\n$plan")
  }

  test("hive-partitioned write prunes partitions on re-read (the #1 100 TB scan cut)") {
    import org.apache.spark.sql.functions.col
    val dir = freshDir("part") + "/docs"
    val docs = tables.documents(spark, "/root/testdata/sf0.001").toNative
    docs.write.partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).where(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    // the lang predicate must land in PartitionFilters (directory
    // pruning — non-matching partitions are never opened), NOT as a
    // row-level data filter over a full scan
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"lang must prune partitions:\n$plan")
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "fixture needs multiple partitions for the prune to mean anything")
    assert(back.count() == docs.where(col("lang") === "en").count())
  }

  test("iterRowsAs streams typed rows without collect") {
    import spark.implicits._
    val tf = Tio.fromRows(spark, Users, users)
    val it = tf.iterRowsAs[UserRow]
    assert(it.toSeq.sortBy(_.id) == users)
  }

  test("Arrow batches round-trip through IPC bytes") {
    import spark.implicits._
    val tf = Tio.fromRows(spark, Users, users)
    val batches = tf.toArrowBatches.collect()
    assert(batches.nonEmpty)
    val back = Bridge.fromArrowBatches(batches.iterator, tf.df.schema.json, spark)
    assert(back.count() == 4L)
    assert(back.columns.toSeq == Seq("id", "name", "age", "score"))
    // and the typed constructor inverse
    val typed = Tio.fromBatches(spark, Users, batches.iterator)
    assert(typed.toDS[UserRow].collect().sortBy(_.id).toSeq == users)
  }

  test("toArrowBatches(batchSize) bounds rows per batch and round-trips") {
    import spark.implicits._
    val tf = Tio.fromDF(Tio.fromRows(spark, Users, users).df.repartition(1), Users)
    val bounded = tf.toArrowBatches(2).collect()
    assert(bounded.length == 2) // 4 rows, 1 partition, <=2 rows per batch
    val unbounded = tf.toArrowBatches.collect()
    assert(unbounded.length == 1) // default: one batch per partition
    val back = Tio.fromBatches(spark, Users, bounded.iterator)
    assert(back.toDS[UserRow].collect().sortBy(_.id).toSeq == users)
    intercept[IllegalArgumentException](tf.toArrowBatches(0))
  }

  test("rowsToDict collects column-oriented") {
    val d = Tio.fromRows(spark, Users, users)(org.apache.spark.sql.Encoders.product[UserRow])
      .sort(Users.id).rowsToDict()
    assert(d("id") == Seq(1L, 2L, 3L, 4L))
    assert(d("name") == Seq("ann", "bo", "cy", "dee"))
    assert(d("age")(1) == null)
  }

  test("concat unions same-schema frames") {
    val a = Tio.fromRows(spark, Users, users.take(2))(org.apache.spark.sql.Encoders.product[UserRow])
    val b = Tio.fromRows(spark, Users, users.drop(2))(org.apache.spark.sql.Encoders.product[UserRow])
    assert(Tio.concat(a, b).height == 4L)
  }
}
