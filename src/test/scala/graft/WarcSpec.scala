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

  test("corrupt MIDDLE gzip member: loss bounded to one record — the member chain resyncs") {
    val dir = tmpDir()
    val r = new scala.util.Random(41)
    def big(id: Long) = rec(id, Seq.fill(4096)(('a' + r.nextInt(26)).toChar).mkString)
    val whole = Warc.gzipMember(big(3))
    val members = Array(
      Warc.gzipMember(big(1)), Warc.gzipMember(big(2)),
      whole.take(whole.length / 2), // mid-deflate cut
      Warc.gzipMember(big(4)), Warc.gzipMember(big(5)))
    write(dir, "a.warc.gz", members: _*)
    val rows = Warc.read(spark, dir + "/*").orderBy("record_ix").collect()
    // 2 good + 1 tombstone + the 2 TRAILING members recovered by the
    // raw-byte magic rescan (pre-resync behavior lost the file tail)
    assert(rows.length == 5, rows.map(x => (x.getAs[Int]("record_ix"),
      x.getAs[Boolean]("valid"))).mkString("; "))
    assert(rows.count(_.getAs[Boolean]("valid")) == 4)
    assert(!rows(2).getAs[Boolean]("valid"))
    val uris = rows.filter(_.getAs[Boolean]("valid"))
      .map(_.getAs[String]("target_uri")).toSet
    assert(uris == Set(1L, 2L, 4L, 5L).map(i => s"https://example.com/doc/$i"))
  }

  test("gzip member with a flipped payload byte: CRC catches it, chain continues") {
    val dir = tmpDir()
    // STORED-ish small member: flip one byte inside the compressed data
    // so inflate still succeeds but the member CRC must mismatch; use
    // an incompressible payload so deflate stores it near-verbatim
    val r = new scala.util.Random(7)
    val bytes = Array.fill[Byte](2048)(r.nextInt().toByte)
    val m = Warc.gzipMember(Warc.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://example.com/doc/9"), bytes))
    m(m.length / 2) = (m(m.length / 2) ^ 0x01).toByte
    write(dir, "a.warc.gz", m, Warc.gzipMember(rec(10, "after")))
    val rows = Warc.read(spark, dir + "/*").orderBy("record_ix").collect()
    // the flip either breaks the deflate stream or survives to the CRC
    // check — both degrade to a tombstone; the trailing member recovers
    assert(rows.exists(x => !x.getAs[Boolean]("valid")), rows.mkString("; "))
    assert(rows.exists(x => x.getAs[Boolean]("valid") &&
      x.getAs[String]("target_uri") == "https://example.com/doc/10"))
  }

  test("obs-fold header continuation appends to the previous value") {
    val dir = tmpDir()
    val body = "hi"
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.com/very/long\r\n" +
      " /folded/tail\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n" + body + "\r\n\r\n").getBytes("UTF-8")
    write(dir, "a.warc", raw, rec(2, "next"))
    val rows = Warc.read(spark, dir + "/*").orderBy("record_ix").collect()
    assert(rows.length == 2 && rows.forall(_.getAs[Boolean]("valid")), rows.mkString("; "))
    assert(rows(0).getAs[String]("target_uri") ==
      "https://example.com/very/long /folded/tail")
  }

  test("charset: Content-Type param > meta sniff > UTF-8; degrade on bad names/bytes") {
    val dir = tmpDir()
    def r(id: Long, ct: String, body: Array[Byte]) = Warc.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> s"https://example.com/doc/$id",
      "Content-Type" -> ct), body)
    write(dir, "a.warc",
      r(1, "text/html; charset=ISO-8859-1", "café §".getBytes("ISO-8859-1")),
      r(2, "text/plain; charset=Shift_JIS", "日本語".getBytes("Shift_JIS")),
      // meta sniff: bare type, charset only in the head bytes
      r(3, "text/html",
        "<html><head><meta charset=\"windows-1252\"></head><body>“quoted”</body></html>"
          .getBytes("windows-1252")),
      // unsupported charset name degrades to UTF-8 (not a throw)
      r(4, "text/plain; charset=not-a-charset-9x", "plain utf8 ü".getBytes("UTF-8")),
      // malformed UTF-8 bytes decode with replacement, never die
      r(5, "text/plain", Array[Byte](0x68, 0x69, 0xFF.toByte, 0xFE.toByte, 0x21)),
      // non-textual content types do not decode
      r(6, "image/png", Array[Byte](1, 2, 3)),
      r(7, "application/warc-fields", "k: v".getBytes("UTF-8")))
    val got = Warc.read(spark, dir + "/*")
      .select("target_uri", "payload_text").collect()
      .map(x => x.getString(0).split("/doc/")(1).toLong -> x.getString(1)).toMap
    assert(got(1L) == "café §")
    assert(got(2L) == "日本語")
    assert(got(3L).contains("“quoted”"), got(3L))
    assert(got(4L) == "plain utf8 ü")
    assert(got(5L) == "hi��!", got(5L))
    assert(got(6L) == null)
    assert(got(7L) == "k: v")
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
    // one Latin-1 record so the charset decode is exercised THROUGH the
    // streaming path too (payload_text must match the batch read)
    val latin = Warc.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://example.com/doc/4",
      "Content-Type" -> "text/plain; charset=ISO-8859-1"), "café §".getBytes("ISO-8859-1"))
    write(dir, "a.warc", rec(1, "alpha"), rec(2, "beta"))
    write(dir, "b.warc.gz", Warc.gzipMember(rec(3, "gamma")), Warc.gzipMember(latin))
    val q = graft.streaming.GStream.readStreamWarc(spark, dir + "/*", maxFilesPerTrigger = Some(1))
      .select("record_ix", "valid", "target_uri", "payload", "payload_text")
      .writeStream.format("memory").queryName("warc_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir() + "/ckpt")
      .start()
    q.awaitTermination(120000)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getBoolean(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), "UTF-8"), r.getString(4)))
        .sortBy(x => (x._3, x._1)).toSeq
    val got = norm(spark.table("warc_stream"))
    val want = norm(Warc.read(spark, dir + "/*")
      .select("record_ix", "valid", "target_uri", "payload", "payload_text"))
    assert(got == want && got.length == 4, s"got $got")
    assert(got.exists(_._5 == "café §"), s"streamed Latin-1 decode: $got")
  }

  test("HTTP envelope (application/http): body decodes per the HTTP Content-Type") {
    val dir = tmpDir()
    def env(id: Long, httpHeaders: String, body: Array[Byte]) = Warc.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> s"https://example.com/doc/$id",
      "Content-Type" -> "application/http; msgtype=response"),
      (s"HTTP/1.1 200 OK\r\n$httpHeaders\r\n").getBytes("ISO-8859-1") ++ body)
    // chunked body: 2 chunks spelling "café §" in ISO-8859-1
    val lat = "café §".getBytes("ISO-8859-1")
    val chunked =
      (s"${lat.take(4).length.toHexString}\r\n").getBytes("ISO-8859-1") ++ lat.take(4) ++
        "\r\n".getBytes ++ (s"${lat.drop(4).length.toHexString}\r\n").getBytes("ISO-8859-1") ++
        lat.drop(4) ++ "\r\n0\r\n\r\n".getBytes("ISO-8859-1")
    write(dir, "a.warc",
      env(1, "Content-Type: text/html; charset=ISO-8859-1\r\n", "<p>café §</p>".getBytes("ISO-8859-1")),
      env(2, "Content-Type: image/png\r\n", Array[Byte](1, 2, 3)),
      env(3, "Content-Type: text/plain; charset=ISO-8859-1\r\nTransfer-Encoding: chunked\r\n", chunked),
      // headers-only (no terminator): degrade to null, record still valid
      Warc.record(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://example.com/doc/4",
        "Content-Type" -> "application/http; msgtype=response"),
        "HTTP/1.1 304 Not Modified\r\nETag: x".getBytes("ISO-8859-1")))
    val got = Warc.read(spark, dir + "/*")
      .select("target_uri", "payload_text", "valid").collect()
      .map(r => r.getString(0).split("/doc/")(1).toLong -> (r.getString(1), r.getBoolean(2))).toMap
    assert(got(1L) == ("<p>café §</p>", true))
    assert(got(2L) == (null, true))
    assert(got(3L) == ("café §", true), got(3L).toString)
    assert(got(4L) == (null, true))
  }

  test("HTTP envelope Content-Encoding: gzip/deflate inflate; unknown codings degrade to null") {
    val dir = tmpDir()
    def env(id: Long, httpHeaders: String, body: Array[Byte]) = Warc.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> s"https://example.com/doc/$id",
      "Content-Type" -> "application/http; msgtype=response"),
      (s"HTTP/1.1 200 OK\r\n$httpHeaders\r\n").getBytes("ISO-8859-1") ++ body)
    def deflate(raw: Boolean, bytes: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(bytes); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val text = "café § body".getBytes("ISO-8859-1")
    val ct = "Content-Type: text/plain; charset=ISO-8859-1\r\n"
    // chunked + gzip: Transfer-Encoding applies last, so the stored
    // body is chunked(gzip(text)) and the reader de-chunks THEN inflates
    val gz = Warc.gzipMember(text)
    val chunkedGz = (s"${gz.length.toHexString}\r\n").getBytes("ISO-8859-1") ++ gz ++
      "\r\n0\r\n\r\n".getBytes("ISO-8859-1")
    write(dir, "a.warc",
      env(1, ct + "Content-Encoding: gzip\r\n", Warc.gzipMember(text)),
      env(2, ct + "Content-Encoding: deflate\r\n", deflate(raw = false, text)), // zlib-wrapped
      env(3, ct + "Content-Encoding: deflate\r\n", deflate(raw = true, text)), // raw (real servers ship both)
      env(4, "Content-Type: text/html\r\nContent-Encoding: br\r\n", Array[Byte](1, 2, 3)),
      env(5, "Content-Type: text/plain\r\nContent-Encoding: identity\r\n", "plain".getBytes("UTF-8")),
      env(6, "Content-Type: text/plain\r\nContent-Encoding: gzip\r\n", "not gzip".getBytes("UTF-8")),
      env(7, ct + "Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n", chunkedGz))
    val got = Warc.read(spark, dir + "/*")
      .select("target_uri", "payload_text", "valid").collect()
      .map(r => r.getString(0).split("/doc/")(1).toLong -> (r.getString(1), r.getBoolean(2))).toMap
    assert(got(1L) == ("café § body", true), got(1L).toString)
    assert(got(2L) == ("café § body", true), got(2L).toString)
    assert(got(3L) == ("café § body", true), got(3L).toString)
    assert(got(4L) == (null, true)) // brotli: null, not mojibake
    assert(got(5L) == ("plain", true))
    assert(got(6L) == (null, true)) // corrupt gzip body: degrade
    assert(got(7L) == ("café § body", true), got(7L).toString)
  }

  test("gzip rescan: false-positive magics inside a corrupt region don't burn the degrade budget") {
    val dir = tmpDir()
    // 150 fake member headers (magic + CM 8 + FLG 0 pass the old 2-byte
    // check; OS 0x66 fails the fixed-header validation — XFL is
    // deliberately unchecked per RFC 1952) — more fakes
    // than MaxDegradesPerFile, so if each escaped the rescan as its own
    // tombstone the budget would exhaust and drop the recoverable tail
    val junk = Array.fill(150)(Array[Byte](0x1F, 0x8B.toByte, 0x08, 0x00,
      0x00, 0x00, 0x00, 0x00, 0x99.toByte, 0x66)).flatten
    val bytes = Warc.gzipMember(rec(1, "one")) ++ junk ++
      Warc.gzipMember(rec(2, "two")) ++ Warc.gzipMember(rec(3, "three"))
    write(dir, "a.warc.gz", bytes)
    val rows = Warc.read(spark, dir + "/*").collect()
    val uris = rows.filter(_.getAs[Boolean]("valid"))
      .map(_.getAs[String]("target_uri")).toSet
    assert(uris == Set(1L, 2L, 3L).map(i => s"https://example.com/doc/$i"),
      s"tail members must survive the corrupt region: ${rows.mkString("; ")}")
    assert(rows.count(!_.getAs[Boolean]("valid")) == 1,
      s"the whole region costs ONE tombstone: ${rows.mkString("; ")}")
  }

  test("gzip resync: a stray byte between INTACT members costs one tombstone, nothing else") {
    // the failed-magic lookahead must re-feed the rescan: the stray
    // byte's successor IS the next member's first magic byte
    val dir = tmpDir()
    val bytes = Warc.gzipMember(rec(1, "one")) ++ Array[Byte](0x55) ++
      Warc.gzipMember(rec(2, "two")) ++ Warc.gzipMember(rec(3, "three"))
    write(dir, "a.warc.gz", bytes)
    val rows = Warc.read(spark, dir + "/*").orderBy("record_ix").collect()
    val uris = rows.filter(_.getAs[Boolean]("valid"))
      .map(_.getAs[String]("target_uri")).toSet
    assert(uris == Set(1L, 2L, 3L).map(i => s"https://example.com/doc/$i"),
      s"intact members must all survive: ${rows.mkString("; ")}")
    assert(rows.count(!_.getAs[Boolean]("valid")) == 1)
  }

  test("unbounded obs-fold continuations tombstone instead of growing without limit") {
    val dir = tmpDir()
    val folded = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      (" x\r\n" * 500) + "Content-Length: 2\r\n\r\nhi\r\n\r\n").getBytes("UTF-8")
    write(dir, "a.warc", folded, rec(2, "after"))
    val rows = Warc.read(spark, dir + "/*").orderBy("record_ix").collect()
    assert(rows.length == 2, rows.mkString("; "))
    assert(!rows(0).getAs[Boolean]("valid"))
    assert(rows(0).getAs[String]("error").contains("header lines"), rows(0).getAs[String]("error"))
    assert(rows(1).getAs[Boolean]("valid"))
  }

  test("decodePayloadText=false skips the decode for byte-only consumers") {
    val dir = tmpDir()
    write(dir, "a.warc", rec(1, "hello"))
    val r = Warc.read(spark, dir + "/*", decodePayloadText = false)
      .select("payload_text", "payload").head()
    assert(r.getString(0) == null)
    assert(new String(r.getAs[Array[Byte]](1), "UTF-8") == "hello")
  }

  test("mutation fuzz: single-byte corruption never throws; valid rows stay sane") {
    // seeded single-bit flips over plain and gzip archives: the record
    // walk must always terminate with a bounded row list (degrade, never
    // die, never spin) — the 100 TB contract for the crawl entry point
    val plainArchive = (1L to 6L).map(i => rec(i, s"payload body $i " * 4))
      .reduce(_ ++ _)
    val gzArchive = (1L to 6L).map(i => Warc.gzipMember(rec(i, s"payload body $i " * 4)))
      .reduce(_ ++ _)
    val rng = new scala.util.Random(99)
    for ((name, bytes) <- Seq("plain" -> plainArchive, "gz" -> gzArchive); trial <- 1 to 150) {
      val b = bytes.clone()
      val i = rng.nextInt(b.length)
      b(i) = (b(i) ^ (1 << rng.nextInt(8))).toByte
      try {
        val rows = Warc.parseBytes(s"$name-$trial", b).toList
        assert(rows.length <= 200, s"$name trial $trial: runaway row list")
      } catch { case e: Throwable =>
        fail(s"$name trial $trial flipped byte $i: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("shard write -> read -> extract composition equals direct extraction") {
    // doc 8 lands the ISO-8859-1 writer variant AND has Latin-1
    // non-ASCII text, so its shard bytes are byte-distinct from UTF-8 —
    // only the payload_text charset decode reproduces the page
    val docs = Seq(
      (0L, "plain words here"),
      (8L, "unicode § and ümlauts"),
      (16L, "the quick <brown> fox")).toDF("doc_id", "text")
    val html = concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
    val pages = docs.select(col("doc_id"), html.as("html")).repartition(3)
    val glob = Warc.writeSyntheticShards(pages, tmpDir() + "/shards")
    val read = Warc.read(spark, glob)
      .where(col("valid") && col("warc_type") === "response")
    val got = read
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("payload_text").as("page"))
      .select(col("doc_id"),
        graft.functions.TextFns.htmlToText(col("page")).as("text_plain"))
      .as[(Long, String)].collect().toMap
    val want = docs.select(col("doc_id"),
        graft.functions.TextFns.htmlToText(html).as("text_plain"))
      .as[(Long, String)].collect().toMap
    assert(got == want)
    // the Latin-1 variant really wrote non-UTF-8 bytes: a UTF-8
    // reinterpretation of doc 8's payload garbles where decode doesn't
    val raw8 = read.where(col("target_uri").endsWith("/doc/8"))
      .select("payload", "content_type").head()
    assert(raw8.getString(1).contains("ISO-8859-1"), raw8.getString(1))
    assert(new String(raw8.getAs[Array[Byte]](0), "UTF-8") !=
      new String(raw8.getAs[Array[Byte]](0), "ISO-8859-1"))
    // both shard layouts were written (3 partitions -> plain + gzip)
    val files = new java.io.File(glob.stripSuffix("/*")).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".warc")) && files.exists(_.endsWith(".warc.gz")), files.toSeq)
  }
}
