package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII scrub cascade semantics: each class redacts, order prevents
  * cross-class double-eating, clean text passes through untouched. */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String): (Long, Long, Long, Long, String) = {
    val r = PiiScrub.scrub(Seq((1L, text)).toDF("id", "text"), col("text"))
      .select("n_email", "n_ssn", "n_ipv4", "n_phone", "scrubbed").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("each class redacts with its token") {
    assert(scrubOne("write to bob.smith+x@corp.example.com today") ==
      ((1L, 0L, 0L, 0L, "write to <EMAIL> today")))
    assert(scrubOne("ssn is 123-45-6789 ok") == ((0L, 1L, 0L, 0L, "ssn is <SSN> ok")))
    assert(scrubOne("host 192.168.0.1 up") == ((0L, 0L, 1L, 0L, "host <IP> up")))
    assert(scrubOne("call (555) 867-5309 now") ==
      ((0L, 0L, 0L, 1L, "call <PHONE> now")))
    assert(scrubOne("call 555.867.5309 now") ==
      ((0L, 0L, 0L, 1L, "call <PHONE> now")))
  }

  test("cascade order: SSN digits never feed the phone rule, IPs are not phones") {
    val (_, ssn, ip, phone, out) = scrubOne("ids 123-45-6789 and 10.20.30.40") match {
      case (e, s, i, p, o) => (e, s, i, p, o)
    }
    assert((ssn, ip, phone) == ((1L, 1L, 0L)), s"got $out")
    assert(out == "ids <SSN> and <IP>")
  }

  test("multi-class documents count every class once") {
    assert(scrubOne("mail a@b.io call (123) 456-7890 ssn 111-22-3333 ip 1.2.3.4") ==
      ((1L, 1L, 1L, 1L, "mail <EMAIL> call <PHONE> ssn <SSN> ip <IP>")))
  }

  test("clean text passes through byte-identical with zero counts") {
    val clean = "the quick brown fox jumps over 7 lazy dogs at dawn"
    assert(scrubOne(clean) == ((0L, 0L, 0L, 0L, clean)))
  }

  test("phone rule never bites mid-number (word-boundary anchors)") {
    // review-caught: unanchored, any 10 digits inside a longer run were
    // redacted — card numbers and wide ids came out half-eaten
    val card = "card 4111111111111111 on file"
    assert(scrubOne(card) == ((0L, 0L, 0L, 0L, card)))
    val wideId = "record 12345678901 found"
    assert(scrubOne(wideId) == ((0L, 0L, 0L, 0L, wideId)))
    // a bare 10-digit run IS still a phone
    assert(scrubOne("call 5558675309 now") == ((0L, 0L, 0L, 1L, "call <PHONE> now")))
  }
}
