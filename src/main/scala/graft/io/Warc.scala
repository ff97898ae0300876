package graft.io

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC (ISO 28500 / WARC-1.1) reader + writer — the Common Crawl
  * ingestion path of a web-scale training-data pipeline.
  *
  * The wire format is public: a WARC file is a concatenation of records,
  * each `WARC/1.x CRLF`, named-field header lines, `CRLF`, a
  * `Content-Length`-framed payload block, and a `CRLF CRLF` separator.
  * Compressed WARC (`.warc.gz`) is one gzip member PER RECORD,
  * concatenated — so a reader can resynchronize at member boundaries and
  * a split can start at any member. `response` records carry a full HTTP
  * message (`Content-Type: application/http`); the HTTP head and body
  * split at the first bare `CRLF CRLF` inside the length-framed payload,
  * so body bytes containing `CRLF CRLF` are safe.
  *
  * Scale shape: at 100 TB the files land in object storage and are read
  * with `spark.read.format("binaryFile")` (or a custom `FileFormat` that
  * splits on gzip-member boundaries); [[parse]] runs inside
  * `flatMap`/`mapPartitions` — map-only, no shuffle, payloads stay
  * `binary` columnar end-to-end. The parser is strict: structural damage
  * (bad magic, missing Content-Length, truncation) fails loudly rather
  * than silently dropping records, so corpus loss is observable; a
  * permissive wrapper can catch per-blob and route to a quarantine sink.
  */
object Warc {

  /** One parsed record. `http_status`/`content_type`/`body` are the HTTP
    * payload split for `response` records; non-HTTP records (warcinfo,
    * metadata) carry status 0 and the raw payload block as `body`. */
  final case class WarcRow(
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      http_status: Int,
      content_type: String,
      body: Array[Byte],
      from_gzip: Boolean)

  private val Crlf = "\r\n".getBytes(StandardCharsets.ISO_8859_1)

  def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  // ---------------------------------------------------------------- parse

  /** Parse a WARC blob (plain or multi-member gzip) into records.
    * `java.util.zip.GZIPInputStream` reads concatenated members, which is
    * exactly the `.warc.gz` record-per-member layout. */
  def parse(blob: Array[Byte]): Seq[WarcRow] = {
    val gz = isGzip(blob)
    val raw: InputStream = new ByteArrayInputStream(blob)
    val in = new BufferedInputStream(
      if (gz) new GZIPInputStream(raw, 8192) else raw, 8192)
    val out = Seq.newBuilder[WarcRow]
    var more = true
    while (more) readRecord(in, gz) match {
      case Some(r) => out += r
      case None    => more = false
    }
    out.result()
  }

  /** Read one record off the stream; None at clean EOF. */
  private def readRecord(in: InputStream, fromGzip: Boolean): Option[WarcRow] = {
    // Tolerate extra blank lines between records; EOF before a version
    // line is a clean end of file.
    var version: String = null
    while (version == null) {
      readLine(in) match {
        case None                      => return None
        case Some("")                  => () // inter-record padding
        case Some(l) if l.startsWith("WARC/") => version = l
        case Some(l) =>
          throw new IllegalArgumentException(
            s"malformed WARC: expected version line, got '${l.take(60)}'")
      }
    }
    val headers = readHeaders(in)
    val len = headers.getOrElse("content-length",
      throw new IllegalArgumentException(
        "malformed WARC: record without Content-Length")).trim.toLong
    require(len <= Int.MaxValue, s"WARC payload too large for one record: $len")
    val payload = readFully(in, len.toInt)
    // Record separator: exactly two CRLFs after the payload block.
    for (_ <- 0 until 2) readLine(in) match {
      case Some("") => ()
      case other =>
        throw new IllegalArgumentException(
          s"malformed WARC: expected CRLF record separator, got $other")
    }
    val warcType = headers.getOrElse("warc-type", "")
    val ctype = headers.getOrElse("content-type", "")
    val (status, httpCtype, body) =
      if (ctype.toLowerCase.startsWith("application/http")) parseHttp(payload)
      else (0, "", payload)
    Some(WarcRow(
      warc_type = warcType,
      record_id = headers.getOrElse("warc-record-id", ""),
      target_uri = headers.getOrElse("warc-target-uri", ""),
      warc_date = headers.getOrElse("warc-date", ""),
      http_status = status,
      content_type = httpCtype,
      body = body,
      from_gzip = fromGzip))
  }

  /** Header block: `Name: value` lines (names case-insensitive per the
    * spec) terminated by an empty line. */
  private def readHeaders(in: InputStream): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var done = false
    while (!done) readLine(in) match {
      case None => throw new EOFException("malformed WARC: EOF inside header block")
      case Some("") => done = true
      case Some(l) =>
        val i = l.indexOf(':')
        require(i > 0, s"malformed WARC: header line without ':': '${l.take(60)}'")
        m += l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
    }
    m.result()
  }

  /** Split an application/http payload into (status, content-type, body)
    * at the first bare CRLF CRLF. */
  def parseHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(payload)
    require(sep >= 0, "malformed HTTP message: no CRLFCRLF head/body separator")
    val head = new String(payload, 0, sep, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val statusParts = lines(0).split(" ", 3)
    require(statusParts.length >= 2 && statusParts(0).startsWith("HTTP/"),
      s"malformed HTTP status line: '${lines(0).take(60)}'")
    val status = statusParts(1).toInt
    var ctype = ""
    var clen = -1L
    lines.iterator.drop(1).foreach { l =>
      val i = l.indexOf(':')
      if (i > 0) {
        val name = l.substring(0, i).trim.toLowerCase
        val value = l.substring(i + 1).trim
        if (name == "content-type") ctype = value
        else if (name == "content-length") clen = value.toLong
      }
    }
    val body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
    require(clen < 0 || clen == body.length,
      s"HTTP Content-Length $clen != body ${body.length}")
    (status, ctype, body)
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Read a CRLF-terminated line (strips the terminator); None at EOF
    * before any byte. A bare LF is accepted (robustness), a trailing CR
    * is stripped. */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
    if (c < 0 && buf.size == 0) return None
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1 else bytes.length
    Some(new String(bytes, 0, n, StandardCharsets.ISO_8859_1))
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(b, off, n - off)
      if (r < 0) throw new EOFException(
        s"malformed WARC: payload truncated at $off of $n bytes")
      off += r
    }
    b
  }

  // ---------------------------------------------------------------- write

  /** Serialize one HTTP response message. */
  def httpResponse(status: Int, reason: String, contentType: String,
                   body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val out = new ByteArrayOutputStream(head.length + body.length)
    out.write(head.getBytes(StandardCharsets.ISO_8859_1))
    out.write(body)
    out.toByteArray
  }

  /** Serialize one WARC record (headers + length-framed payload + the
    * two-CRLF separator). */
  def record(warcType: String, recordId: String, date: String,
             contentType: String, extraHeaders: Seq[(String, String)],
             payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("WARC/1.1\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    sb.append(s"WARC-Record-ID: $recordId\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    extraHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    val out = new ByteArrayOutputStream(sb.length + payload.length + 4)
    out.write(sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    out.write(payload)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  def responseRecord(uri: String, recordId: String, date: String,
                     http: Array[Byte]): Array[Byte] =
    record("response", recordId, date, "application/http;msgtype=response",
      Seq("WARC-Target-URI" -> uri), http)

  def warcinfoRecord(recordId: String, date: String, fields: String): Array[Byte] =
    record("warcinfo", recordId, date, "application/warc-fields", Nil,
      fields.getBytes(StandardCharsets.UTF_8))

  /** One gzip member (the `.warc.gz` unit). `GZIPOutputStream` writes a
    * fixed zero-MTIME header, so output is deterministic. */
  def gzipMember(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new GZIPOutputStream(out, 8192)
    gz.write(b); gz.finish(); gz.close()
    out.toByteArray
  }

  /** RFC 4122-shaped deterministic record id from the md5 of a seed
    * string — `<urn:uuid:xxxxxxxx-xxxx-xxxx-xxxx-xxxxxxxxxxxx>`. */
  def recordId(seed: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(seed.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"<urn:uuid:${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20, 32)}>"
  }

  /** ISO-8601 WARC-Date: fixed epoch + `offsetSeconds`. */
  def warcDate(offsetSeconds: Long): String =
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      java.time.Instant.parse("2026-01-01T00:00:00Z").plusSeconds(offsetSeconds))
}
