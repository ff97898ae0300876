package graft.io

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Warc._

class WarcSpec extends AnyFunSuite {

  private def mkResponse(uri: String, docId: Long, body: Array[Byte],
                         ctype: String = "text/plain"): Array[Byte] =
    responseRecord(uri, recordId(uri), warcDate(docId),
      httpResponse(200, "OK", ctype, body))

  test("single response record round-trips all fields") {
    val body = "hello warc".getBytes(UTF_8)
    val rec = mkResponse("http://x.test/1", 7, body)
    val rows = parse(rec)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.warc_type == "response")
    assert(r.target_uri == "http://x.test/1")
    assert(r.warc_date == "2026-01-01T00:00:07Z")
    assert(r.http_status == 200)
    assert(r.content_type == "text/plain")
    assert(r.body.sameElements(body))
    assert(!r.from_gzip)
    assert(r.record_id.matches(raw"<urn:uuid:[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}>"))
  }

  test("multi-record file parses in order; warcinfo framed like any record") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(warcinfoRecord(recordId("f"), warcDate(0), "software: graft\r\n"))
    for (i <- 1 to 5) out.write(mkResponse(s"http://x.test/$i", i, s"body$i".getBytes(UTF_8)))
    val rows = parse(out.toByteArray)
    assert(rows.map(_.warc_type) == Seq("warcinfo") ++ Seq.fill(5)("response"))
    assert(rows.tail.map(r => new String(r.body, UTF_8)) == (1 to 5).map(i => s"body$i"))
    // warcinfo payload is the raw warc-fields block, no HTTP split
    assert(rows.head.http_status == 0)
    assert(new String(rows.head.body, UTF_8) == "software: graft\r\n")
  }

  test("concatenated gzip members (.warc.gz layout) parse transparently") {
    val out = new java.io.ByteArrayOutputStream()
    out.write(gzipMember(warcinfoRecord(recordId("f"), warcDate(0), "a: b\r\n")))
    for (i <- 1 to 3) out.write(gzipMember(mkResponse(s"http://x.test/$i", i,
      s"payload $i".getBytes(UTF_8))))
    val rows = parse(out.toByteArray)
    assert(rows.length == 4)
    assert(rows.forall(_.from_gzip))
    assert(new String(rows.last.body, UTF_8) == "payload 3")
  }

  test("length-framed body may contain CRLFCRLF; HTTP splits at the FIRST one") {
    val body = "head-looking\r\n\r\nstill body".getBytes(UTF_8)
    val rows = parse(mkResponse("http://x.test/9", 9, body))
    assert(rows.head.body.sameElements(body))
  }

  test("binary bodies survive byte-exact (all 256 byte values)") {
    val body = Array.tabulate[Byte](512)(i => i.toByte)
    val rows = parse(mkResponse("http://x.test/2", 2, body, "application/octet-stream"))
    assert(rows.head.body.sameElements(body))
  }

  test("header names are case-insensitive") {
    val body = "x".getBytes(UTF_8)
    val http = httpResponse(200, "OK", "text/plain", body)
    val rec = ("WARC/1.1\r\nwarc-type: response\r\nWARC-RECORD-ID: <urn:uuid:0>\r\n" +
      "Warc-Date: 2026-01-01T00:00:00Z\r\nWARC-Target-URI: http://y\r\n" +
      "content-type: application/http;msgtype=response\r\n" +
      s"CONTENT-LENGTH: ${http.length}\r\n\r\n").getBytes(UTF_8) ++ http ++
      "\r\n\r\n".getBytes(UTF_8)
    val r = parse(rec).head
    assert(r.warc_type == "response" && r.target_uri == "http://y" && r.http_status == 200)
  }

  test("truncated payload fails loudly, not silently") {
    val rec = mkResponse("http://x.test/3", 3, "0123456789".getBytes(UTF_8))
    val cut = rec.dropRight(8) // into the payload/separator
    val e = intercept[Exception](parse(cut))
    assert(e.getMessage.contains("malformed WARC") || e.isInstanceOf[java.io.EOFException])
  }

  test("missing Content-Length fails loudly") {
    val rec = "WARC/1.1\r\nWARC-Type: metadata\r\n\r\n\r\n\r\n".getBytes(UTF_8)
    val e = intercept[IllegalArgumentException](parse(rec))
    assert(e.getMessage.contains("Content-Length"))
  }

  test("garbage at record start fails loudly") {
    val e = intercept[IllegalArgumentException](parse("NOT-A-WARC\r\n".getBytes(UTF_8)))
    assert(e.getMessage.contains("version line"))
  }

  test("HTTP Content-Length mismatch fails loudly") {
    val body = "abc".getBytes(UTF_8)
    val badHttp = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Content-Length: 999\r\n\r\n").getBytes(UTF_8) ++ body
    val rec = record("response", recordId("u"), warcDate(0),
      "application/http;msgtype=response", Seq("WARC-Target-URI" -> "http://z"), badHttp)
    val e = intercept[IllegalArgumentException](parse(rec))
    assert(e.getMessage.contains("Content-Length"))
  }

  test("gzip member bytes are deterministic and sniffable") {
    val rec = mkResponse("http://x.test/5", 5, "same".getBytes(UTF_8))
    val a = gzipMember(rec); val b = gzipMember(rec)
    assert(a.sameElements(b))
    assert(isGzip(a) && !isGzip(rec))
  }
}
