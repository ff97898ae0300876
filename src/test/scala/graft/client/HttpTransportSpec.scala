package graft.client

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** S2 against a loopback HTTP server (JDK built-in; zero egress): batch
  * param shape, 429 retry, HTTP-error fail-fast, HTML download guard,
  * and the distributed fetch path end to end. */
class HttpTransportSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpServer = _
  private var base: String = _
  private val entryCalls = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/entry", (ex: HttpExchange) => {
      val q = ex.getRequestURI.getQuery
      if (entryCalls.incrementAndGet() == 1) respond(ex, 429, "slow down")
      else {
        val mims = q.split("&").find(_.startsWith("mimNumber="))
          .get.stripPrefix("mimNumber=").split(",")
        val entries = mims.map(m => s"""{"entry": {"mimNumber": $m}}""")
        respond(ex, 200,
          s"""{"omim": {"entryList": [${entries.mkString(",")}]}}""")
      }
    })
    server.createContext("/download/morbidmap.txt",
      (ex: HttpExchange) => respond(ex, 200, "# Phenotype\nA, 100100 (3)\tG\t1\t1p"))
    server.createContext("/html",
      (ex: HttpExchange) => respond(ex, 200, "<!DOCTYPE html><html>login</html>"))
    server.createContext("/secret",
      (ex: HttpExchange) => respond(ex, 403, "The API key: x is inactive"))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  private def transport =
    new HttpTransport(s"$base/api/entry", "test-key", pauseMillis = 1)

  test("fetchBatch sends batched mimNumber params and survives a 429") {
    entryCalls.set(0)
    val body = transport.fetchBatch(Seq("100100", "100200"))
    assert(body.contains(""""mimNumber": 100100"""))
    assert(entryCalls.get() == 2) // one 429, one success
  }

  test("HTTP errors beyond retry fail fast with status and body") {
    val t = new HttpTransport(s"$base/secret", "k", pauseMillis = 1)
    val e = intercept[RuntimeException] { t.fetchBatch(Seq("1")) }
    assert(e.getMessage.contains("403") && e.getMessage.contains("inactive"))
  }

  test("error messages never leak the apiKey (redacted from the URL)") {
    val t = new HttpTransport(s"$base/secret", "sekret123", pauseMillis = 1)
    val e = intercept[RuntimeException] { t.fetchBatch(Seq("1")) }
    assert(!e.getMessage.contains("sekret123"), s"apiKey leaked: ${e.getMessage}")
    assert(e.getMessage.contains("apiKey=***")) // URL still diagnosable
  }

  test("downloadText returns file bodies but rejects HTML error pages") {
    assert(transport.downloadText(s"$base/download/morbidmap.txt")
      .startsWith("# Phenotype"))
    val e = intercept[RuntimeException] {
      transport.downloadText(s"$base/html")
    }
    assert(e.getMessage.contains("Unexpected response"))
  }

  test("distributed fetchEntries drives the real transport per partition") {
    entryCalls.set(0)
    val ids = (1 to 45).map(i => (100000 + i).toString).toDS()
    val out = OmimClient.fetchEntries(ids, transport, maxConcurrency = 1).collect()
    assert(out.length == 3) // 45 ids in batches of 20 -> 20+20+5
    assert(out.map(_.mims.size).sorted.toSeq == Seq(5, 20, 20))
    assert(out.forall(_.json.contains("entryList")))
  }
}
