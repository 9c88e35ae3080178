package graft

import org.apache.spark.sql.functions._
import graft.sources.Warc

/** L55 WARC/WET ingestion: record walk (plain + concatenated gzip
  * members), header map, payload recovery, Content-Length cap,
  * corrupt-record tombstones with plain-stream resync, gzip
  * truncation, and the end-to-end shard-write → read → html-extract
  * composition the driver gate runs. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("warcspec").toString

  private def rec(id: Long, body: String, typ: String = "response"): Array[Byte] =
    Warc.record(Seq(
      "WARC-Type" -> typ,
      "WARC-Record-ID" -> s"<urn:test:$id>",
      "WARC-Target-URI" -> s"https://example.com/doc/$id",
      "Content-Type" -> "text/plain"), body.getBytes("UTF-8"))

  private def write(dir: String, name: String, parts: Array[Byte]*): String = {
    val f = new java.io.File(dir, name)
    val os = new java.io.FileOutputStream(f)
    parts.foreach(os.write)
    os.close()
    f.getAbsolutePath
  }

  test("plain .warc: multi-record walk, headers lowercased, payload byte-exact") {
    val dir = tmpDir()
    write(dir, "a.warc", rec(1, "hello world"), rec(2, "second\r\nrecord"), rec(3, "", "warcinfo"))
    val rows = Warc.read(spark, dir + "/*", minPartitions = 1)
      .orderBy("record_ix").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Boolean]("valid")))
    assert(rows(0).getAs[String]("target_uri") == "https://example.com/doc/1")
    assert(new String(rows(0).getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    assert(new String(rows(1).getAs[Array[Byte]]("payload"), "UTF-8") == "second\r\nrecord")
    assert(rows(2).getAs[String]("warc_type") == "warcinfo")
    assert(rows(2).getAs[Long]("content_length") == 0L)
    val hdrs = rows(0).getAs[Map[String, String]]("headers")
    assert(hdrs("warc-record-id") == "<urn:test:1>")
    assert(hdrs("content-type") == "text/plain")
  }

  test(".warc.gz: concatenated per-record gzip members read transparently") {
    val dir = tmpDir()
    write(dir, "a.warc.gz",
      Warc.gzipMember(rec(1, "alpha")), Warc.gzipMember(rec(2, "beta")))
    val got = Warc.read(spark, dir + "/*")
      .select("record_ix", "payload").collect()
      .map(r => r.getInt(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(got == Map(0 -> "alpha", 1 -> "beta"))
  }

  test("payload cap: oversized Content-Length truncates, flags, and the walk continues") {
    val dir = tmpDir()
    write(dir, "a.warc", rec(1, "x" * 1000), rec(2, "after"))
    val rows = Warc.read(spark, dir + "/*", maxPayloadBytes = 64)
      .orderBy("record_ix").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Boolean]("truncated"))
    assert(rows(0).getAs[Array[Byte]]("payload").length == 64)
    assert(rows(0).getAs[Long]("content_length") == 1000L)
    assert(!rows(1).getAs[Boolean]("truncated"))
    assert(new String(rows(1).getAs[Array[Byte]]("payload"), "UTF-8") == "after")
  }

  test("corrupt record in a plain stream: tombstone row, then resync to the next record") {
    val dir = tmpDir()
    val garbage = "this is not a warc record\r\nat all\r\n\r\n".getBytes("UTF-8")
    write(dir, "a.warc", garbage, rec(7, "recovered"))
    val rows = Warc.read(spark, dir + "/*").orderBy("record_ix").collect()
    assert(rows.length == 2, rows.mkString("; "))
    assert(!rows(0).getAs[Boolean]("valid"))
    assert(rows(0).getAs[String]("error").nonEmpty)
    assert(rows(1).getAs[Boolean]("valid"))
    assert(new String(rows(1).getAs[Array[Byte]]("payload"), "UTF-8") == "recovered")
  }

  test("missing Content-Length and truncated payload both tombstone, not throw") {
    val dir = tmpDir()
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n").getBytes("UTF-8")
    write(dir, "nolen.warc", noLen)
    val cut = rec(1, "full payload that gets cut")
    write(dir, "cut.warc", cut.take(cut.length - 12))
    val rows = Warc.read(spark, dir + "/*").collect()
    assert(rows.length == 2)
    assert(rows.forall(r => !r.getAs[Boolean]("valid")))
  }

  test("corrupt gzip member: records before it survive, one tombstone after") {
    val dir = tmpDir()
    val ok = Warc.gzipMember(rec(1, "good"))
    // cut into the DEFLATE data itself (a trailer-only cut still
    // yields the full record — the payload bytes all arrived)
    val whole = Warc.gzipMember(rec(2, scala.util.Random.alphanumeric.take(8192).mkString))
    val bad = whole.take(whole.length / 2)
    write(dir, "a.warc.gz", ok, bad)
    val rows = Warc.read(spark, dir + "/*").orderBy("record_ix").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Boolean]("valid"))
    assert(!rows(1).getAs[Boolean]("valid"))
  }

  test("empty file yields no rows; pure garbage yields one tombstone") {
    val dir = tmpDir()
    write(dir, "empty.warc", Array.emptyByteArray)
    write(dir, "junk.warc", Array.tabulate[Byte](256)(i => (i * 7).toByte))
    val rows = Warc.read(spark, dir + "/*").collect()
    // the junk stream has no "\nWARC/" to resync to: exactly one
    // tombstone; the empty file contributes nothing
    assert(rows.length == 1 && !rows(0).getAs[Boolean]("valid"), rows.mkString("; "))
  }

  test("ST7 streaming twin: readStreamWarc over arriving archives equals the batch read") {
    val dir = tmpDir()
    write(dir, "a.warc", rec(1, "alpha"), rec(2, "beta"))
    write(dir, "b.warc.gz", Warc.gzipMember(rec(3, "gamma")))
    val q = graft.streaming.GStream.readStreamWarc(spark, dir + "/*", maxFilesPerTrigger = Some(1))
      .select("record_ix", "valid", "target_uri", "payload")
      .writeStream.format("memory").queryName("warc_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir() + "/ckpt")
      .start()
    q.awaitTermination(120000)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getBoolean(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8"))).sortBy(x => (x._3, x._1)).toSeq
    val got = norm(spark.table("warc_stream"))
    val want = norm(Warc.read(spark, dir + "/*")
      .select("record_ix", "valid", "target_uri", "payload"))
    assert(got == want && got.length == 3, s"got $got")
  }

  test("shard write -> read -> extract composition equals direct extraction") {
    val docs = Seq(
      (0L, "plain words here"),
      (8L, "the quick <brown> fox"),
      (16L, "unicode § and ümlauts")).toDF("doc_id", "text")
    val html = concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
    val pages = docs.select(col("doc_id"), html.as("html")).repartition(3)
    val glob = Warc.writeSyntheticShards(pages, tmpDir() + "/shards")
    val got = Warc.read(spark, glob)
      .where(col("valid") && col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("payload").cast("string").as("page"))
      .select(col("doc_id"),
        graft.functions.TextFns.htmlToText(col("page")).as("text_plain"))
      .as[(Long, String)].collect().toMap
    val want = docs.select(col("doc_id"),
        graft.functions.TextFns.htmlToText(html).as("text_plain"))
      .as[(Long, String)].collect().toMap
    assert(got == want)
    // both shard layouts were written (3 partitions -> plain + gzip)
    val files = new java.io.File(glob.stripSuffix("/*")).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".warc")) && files.exists(_.endsWith(".warc.gz")), files.toSeq)
  }
}
