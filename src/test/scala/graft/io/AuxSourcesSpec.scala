package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AuxSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("scrapeUpdateCodes extracts (prefix, mim) from statistics HTML") {
    val html =
      """<table><tr><td>*</td><td><a href="/entry/613456">613456</a></td></tr>
        |<tr><td>#100100</td></tr>
        |<tr><td>%</td><td>100200</td></tr>
        |<tr><td>not a code</td><td>junk</td></tr></table>""".stripMargin
    assert(AuxSources.scrapeUpdateCodes(html) ==
      Seq(("*", "613456"), ("#", "100100"), ("%", "100200")))
  }

  test("removeAngleBrackets strips wrapping <> only") {
    assert(AuxSources.removeAngleBrackets("<https://x/1>") == "https://x/1")
    assert(AuxSources.removeAngleBrackets("https://x/1") == "https://x/1")
    val r = Seq("<https://x/2>").toDF("u")
      .select(AuxSources.stripAngles($"u")).as[String].collect().head
    assert(r == "https://x/2")
  }

  test("staleCacheRows applies the one-day precaution") {
    val cached = Seq(
      ("100100", "2026-01-10"), ("100200", "2026-01-14"), ("100300", "2026-01-15")
    ).toDF("mim", "date_fetched")
    // since 2026-01-15 -> cutoff 2026-01-14 (exclusive below)
    val stale = AuxSources.staleCacheRows(cached, "2026-01-15")
      .select("mim").as[String].collect().toSet
    assert(stale == Set("100100"))
  }

  test("observeBadRows surfaces metrics without a second scan") {
    val df = Seq(("a", 1), (null, 2), ("c", 3), (null, 4)).toDF("k", "v")
    val obs = org.apache.spark.sql.Observation("qc")
    AuxSources.observeBadRows(df, $"k".isNotNull, obs).collect()
    val m = obs.get
    assert(m("bad") == 2L && m("total") == 4L)
    AuxSources.assertBadRowRate(m("bad").asInstanceOf[Long],
      m("total").asInstanceOf[Long], maxRate = 0.6)
    intercept[IllegalArgumentException] {
      AuxSources.assertBadRowRate(2, 4, maxRate = 0.1)
    }
  }
}
