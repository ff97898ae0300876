package graft.client

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** S2/S3 production transport (ref: omim_client.py:22-24, 144, 186,
  * 191-215): java.net.http GET against the entry API with batched
  * mimNumber params, paced requests (the reference sleeps 2 s between
  * calls), bounded 429 retry, fail-fast on other HTTP errors, and the
  * reference's HTML-response guard for bulk file downloads
  * (get_mim_file, omim_txt_parser.py:224-238).
  *
  * One instance serves one executor partition
  * ([[OmimClient.fetchEntries]] constructs the transport once per
  * partition), so pacing state is per-partition: the total request rate
  * is maxConcurrency × (1 per `pauseMillis`) — size maxConcurrency to
  * respect the API's global limit. The HttpClient is @transient-lazy so
  * the transport serializes into tasks and connects lazily on the
  * executor.
  */
final class HttpTransport(entryUrl: String, apiKey: String,
                          pauseMillis: Long = 2000,
                          maxRetries: Int = 3) extends OmimClient.Transport {

  @transient private lazy val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL).build()
  private var lastRequestAt = 0L

  private def pacedGet(url: String): HttpResponse[String] = {
    val wait = lastRequestAt + pauseMillis - System.currentTimeMillis()
    if (wait > 0) Thread.sleep(wait)
    lastRequestAt = System.currentTimeMillis()
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
    client.send(req, HttpResponse.BodyHandlers.ofString())
  }

  /** The apiKey query param is a secret; exception messages propagate
    * into Spark task-failure logs and driver output, so never
    * interpolate the raw URL into an error. */
  private def redact(url: String): String =
    url.replaceAll("apiKey=[^&]+", "apiKey=***")

  /** GET with bounded 429 retry. The reference aborts the run and asks
    * the operator to resume later (omim_client.py:203-205 + RATE_ERR);
    * here a bounded paced retry composes with Spark's own task retry,
    * and the cache-upsert resume (A8/J8) picks up whatever completed. */
  private def getWithRetry(url: String): String = {
    var attempt = 0
    while (true) {
      val resp = pacedGet(url)
      if (resp.statusCode() == 429 && attempt < maxRetries) attempt += 1
      else if (resp.statusCode() >= 400)
        throw new RuntimeException(
          s"HTTP ${resp.statusCode()} from ${redact(url)}: ${resp.body().take(500)}")
      else return resp.body()
    }
    throw new IllegalStateException("unreachable")
  }

  /** Entry batch fetch (ref _fetch_ids params, omim_client.py:158-163). */
  def fetchBatch(mims: Seq[String]): String = {
    require(mims.nonEmpty && mims.size <= OmimClient.BatchSize,
      s"batch size ${mims.size} outside 1..${OmimClient.BatchSize}")
    val q = s"?mimNumber=${mims.mkString(",")}" +
      "&include=referenceList&include=externalLinks&format=json" +
      s"&apiKey=${URLEncoder.encode(apiKey, "UTF-8")}"
    getWithRetry(entryUrl + q)
  }

  /** S2 bulk file download (ref: get_mim_file download branch,
    * omim_txt_parser.py:224-238): an HTML body is an auth/error page,
    * not data → fail like the reference's RuntimeError. */
  def downloadText(url: String): String = {
    val body = getWithRetry(url)
    if (body.startsWith("<!DOCTYPE html>"))
      throw new RuntimeException(s"Unexpected response: ${body.take(200)}")
    body
  }
}
