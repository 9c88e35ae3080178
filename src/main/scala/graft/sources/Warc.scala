package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** WARC/WET ingestion (ISO 28500; SURVEY §2.5 L55) — the entry point
  * of the published web pipelines: C4 (Raffel 2020 §2.2) and
  * RefinedWeb (arXiv:2306.01116 §3.2) both start from Common-Crawl
  * WARC/WET archives; until now that step was out-of-repo
  * preprocessing and [[graft.functions.TextFns.htmlToText]] assumed
  * the HTML already sat in a column (the r16 verdict's capability gap
  * #3).
  *
  * Scale shape (100 TB): a crawl dump is tens of thousands of ~1 GB
  * files; gzip members are not splittable without an external index,
  * so the unit of parallelism is the FILE (`binaryFiles` — one task
  * per archive, the layout CommonCrawl publishes for exactly this
  * reason). Within a task the parse is a single streaming pass: each
  * record's headers are read line-wise, the payload is read (and
  * capped at `maxPayloadBytes` — a runaway Content-Length must not
  * OOM an executor), and rows are emitted from a lazy iterator —
  * nothing buffers more than one record.
  *
  * Degrade, never die (the [[graft.operators.Media.HeaderDecoder]]
  * discipline): a truncated or garbled record yields ONE row with
  * `valid = false` and the error text; in a plain `.warc` the parser
  * then resyncs by scanning for the next `WARC/` version line, in a
  * `.warc.gz` (whose member boundaries the stream API cannot recover
  * once a member is corrupt) the file's remaining records are lost
  * with that one row as the tombstone. Gzip is detected per-file by
  * magic, and concatenated members — the per-record-gzip layout crawl
  * archives use — read transparently.
  */
object Warc {

  /** One WARC record (or one degrade tombstone). Header fields are
    * the commonly-queried ones hoisted into columns; `headers` keeps
    * the full map (keys lowercased — WARC header names are
    * case-insensitive). */
  final case class WarcRow(
      file: String,
      record_ix: Int,
      valid: Boolean,
      error: String,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      truncated: Boolean,
      headers: Map[String, String],
      payload: Array[Byte])

  private val MaxLineBytes = 64 * 1024
  private val MaxHeaders = 256
  private val MaxDegradesPerFile = 100

  /** Read a WARC/WET path (globs ok, `.warc` and `.warc.gz` mixed)
    * into a DataFrame of [[WarcRow]]s — one task per archive file. */
  def read(spark: SparkSession, path: String,
      maxPayloadBytes: Int = 16 * 1024 * 1024,
      minPartitions: Int = 0): DataFrame = {
    val minParts = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val rows = spark.sparkContext.binaryFiles(path, minParts)
      .flatMap { case (file, pds) =>
        new RecordIterator(file, pds.open(), maxPayloadBytes)
      }
    spark.createDataset(rows)(Encoders.product[WarcRow]).toDF()
  }

  // ------------------------------------------------------------------
  // Streaming parser
  // ------------------------------------------------------------------

  private final class ParseError(msg: String) extends RuntimeException(msg, null, false, false)

  /** Lazy one-record-at-a-time iterator over one archive stream. */
  private final class RecordIterator(file: String, raw: java.io.InputStream, maxPayload: Int)
      extends Iterator[WarcRow] {

    private val gz = {
      val buf = new java.io.BufferedInputStream(raw, 1 << 16)
      buf.mark(2)
      val b0 = buf.read(); val b1 = buf.read()
      buf.reset()
      if (b0 == 0x1F && b1 == 0x8B)
        (new java.util.zip.GZIPInputStream(buf, 1 << 16), true)
      else (buf: java.io.InputStream, false)
    }
    // pushback lets resync() unread the matched "WARC/" prefix so the
    // next parseOne sees a whole version line
    private val in = new java.io.PushbackInputStream(gz._1, 8)
    private val isGzip = gz._2

    private var ix = 0
    private var degrades = 0
    private var finished = false
    private var pending: WarcRow = null

    override def hasNext: Boolean = {
      if (pending != null) return true
      if (finished) { close(); return false }
      pending = advance()
      if (pending == null) { finished = true; close(); false } else true
    }

    override def next(): WarcRow = {
      if (!hasNext) throw new NoSuchElementException
      val r = pending
      pending = null
      r
    }

    private def close(): Unit = try in.close() catch { case _: Throwable => () }

    /** Parse the next record; on corruption emit a tombstone and (for
      * plain streams) resync. Returns null at clean EOF. */
    private def advance(): WarcRow = {
      try {
        parseOne() match {
          case Some(r) => ix += 1; r
          case None => null
        }
      } catch {
        case e: Throwable =>
          degrades += 1
          val row = WarcRow(file, ix, valid = false,
            error = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(200),
            warc_type = null, record_id = null, target_uri = null,
            warc_date = null, content_type = null, content_length = -1L,
            truncated = false, headers = Map.empty, payload = Array.emptyByteArray)
          ix += 1
          // a corrupt gzip member loses the rest of the stream; a
          // plain stream resyncs on the next WARC/ version line
          if (isGzip || degrades >= MaxDegradesPerFile || !resync()) finished = true
          row
      }
    }

    /** Read one CRLF (or LF) line as ISO-8859-1; null at EOF. */
    private def readLine(): String = {
      val sb = new java.lang.StringBuilder(64)
      var c = in.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') {
        if (sb.length > MaxLineBytes) throw new ParseError("header line too long")
        sb.append(c.toChar)
        c = in.read()
      }
      if (sb.length > 0 && sb.charAt(sb.length - 1) == '\r') sb.setLength(sb.length - 1)
      sb.toString
    }

    private def readFully(buf: Array[Byte], n: Int): Unit = {
      var got = 0
      while (got < n) {
        val k = in.read(buf, got, n - got)
        if (k < 0) throw new ParseError(s"payload truncated at $got/$n")
        got += k
      }
    }

    private def skipFully(n: Long): Unit = {
      var left = n
      val buf = new Array[Byte](1 << 16)
      while (left > 0) {
        val k = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
        if (k < 0) throw new ParseError("payload truncated while skipping")
        left -= k
      }
    }

    private def parseOne(): Option[WarcRow] = {
      // skip inter-record blank lines; EOF here is a clean end
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine()
      if (line == null) return None
      if (!line.startsWith("WARC/")) throw new ParseError(s"expected WARC/ version, got '${line.take(40)}'")
      val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var h = readLine()
      while (h != null && h.nonEmpty) {
        if (headers.size >= MaxHeaders) throw new ParseError("too many headers")
        val i = h.indexOf(':')
        if (i <= 0) throw new ParseError(s"malformed header '${h.take(40)}'")
        headers.put(h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT),
          h.substring(i + 1).trim)
        h = readLine()
      }
      if (h == null) throw new ParseError("EOF inside header block")
      val lenStr = headers.getOrElse("content-length", throw new ParseError("missing Content-Length"))
      val len = try lenStr.toLong catch {
        case _: NumberFormatException => throw new ParseError(s"bad Content-Length '$lenStr'")
      }
      if (len < 0) throw new ParseError(s"negative Content-Length $len")
      val keep = math.min(len, maxPayload.toLong).toInt
      val payload = new Array[Byte](keep)
      readFully(payload, keep)
      if (len > keep) skipFully(len - keep)
      Some(WarcRow(
        file, ix, valid = true, error = null,
        warc_type = headers.getOrElse("warc-type", null),
        record_id = headers.getOrElse("warc-record-id", null),
        target_uri = headers.getOrElse("warc-target-uri", null),
        warc_date = headers.getOrElse("warc-date", null),
        content_type = headers.getOrElse("content-type", null),
        content_length = len,
        truncated = len > keep,
        headers = headers.toMap,
        payload = payload))
    }

    /** Scan forward for "\nWARC/" — the next version line — then
      * unread the "WARC/" prefix so parseOne sees the whole line.
      * False at EOF. */
    private def resync(): Boolean = {
      val target = "\nWARC/"
      var matchLen = 0
      var c = in.read()
      while (c >= 0) {
        val ch = c.toChar
        matchLen = if (ch == target.charAt(matchLen)) matchLen + 1
          else if (ch == '\n') 1 else 0
        if (matchLen == target.length) {
          in.unread("WARC/".getBytes("ISO-8859-1"))
          return true
        }
        c = in.read()
      }
      false
    }

    override def toString: String = s"WarcRecords($file)"
  }

  /** Parse one in-memory archive — the streaming source
    * ([[graft.streaming.GStream.readStreamWarc]]) hands whole files as
    * byte arrays; same lazy record walk and degrade contract as
    * [[read]]. */
  def parseBytes(file: String, bytes: Array[Byte],
      maxPayloadBytes: Int = 16 * 1024 * 1024): Iterator[WarcRow] =
    new RecordIterator(file, new java.io.ByteArrayInputStream(bytes), maxPayloadBytes)

  // ------------------------------------------------------------------
  // Fixture builders (gates/specs — the Media.syntheticContainer precedent)
  // ------------------------------------------------------------------

  /** Serialize one WARC record (WARC/1.0, CRLF, Content-Length added). */
  def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes("ISO-8859-1")
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One gzip member of `bytes` (crawl archives gzip per record and
    * concatenate members). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.finish(); g.close()
    bos.toByteArray
  }

  /** Distributed synthetic-archive writer for the warc_ingest gate:
    * each partition of `pages` — (doc_id LONG, html STRING) — writes
    * one shard into `outDir`, EVEN partition indexes as plain `.warc`,
    * ODD as `.warc.gz` with one gzip member per record (both layouts
    * crawl dumps ship), response records keyed by
    * `https://example.com/doc/<id>`. The dir is wiped first (the
    * fixture is deterministic in the input). Local-filesystem writer —
    * the gate runs local[*]; production [[read]] consumes existing
    * archives from whatever FS Spark is pointed at. Returns the glob. */
  def writeSyntheticShards(pages: DataFrame, outDir: String): String = {
    val dir = new java.io.File(outDir)
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) { val fs = f.listFiles; if (fs != null) fs.foreach(del) }
      f.delete(): Unit
    }
    if (dir.exists) del(dir)
    dir.mkdirs()
    import org.apache.spark.sql.functions.col
    pages.select(col("doc_id").cast("long"), col("html").cast("string"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val gzip = pid % 2 == 1
          val f = new java.io.File(dir, f"shard-$pid%05d.warc" + (if (gzip) ".gz" else ""))
          val os = new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 16)
          try {
            while (it.hasNext) {
              val r = it.next()
              val id = r.getLong(0)
              val rec = record(Seq(
                "WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:graft:$id>",
                "WARC-Date" -> "2026-01-01T00:00:00Z",
                "WARC-Target-URI" -> s"https://example.com/doc/$id",
                "Content-Type" -> "text/html"),
                r.getString(1).getBytes("UTF-8"))
              os.write(if (gzip) gzipMember(rec) else rec)
            }
          } finally os.close()
        }
      }
    outDir + "/*"
  }
}
