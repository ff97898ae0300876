package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Robots._

class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# robots for example.test
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/pub/
      |Disallow: /*.tmp$
      |
      |User-agent: GraftBot
      |User-agent: OtherBot
      |Disallow: /graft-only/
      |Crawl-delay: 10
      |""".stripMargin

  test("star group: longest match wins, allow overrides shorter disallow") {
    val rules = rulesFor(txt, "randombot")
    assert(decide(rules, "/private/x") == ((false, "/private/")))
    assert(decide(rules, "/private/pub/x") == ((true, "/private/pub/")))
    assert(decide(rules, "/open/x") == ((true, "")))
  }

  test("$-anchored wildcard rule matches ends only") {
    val rules = rulesFor(txt, "randombot")
    assert(decide(rules, "/file9.tmp") == ((false, "/*.tmp$")))
    assert(decide(rules, "/file9.tmpx")._1)
  }

  test("named group is exclusive: star rules never leak into it") {
    val rules = rulesFor(txt, "graftbot")
    assert(decide(rules, "/graft-only/a") == ((false, "/graft-only/")))
    // /private/ is NOT disallowed for graftbot — its group has no such rule
    assert(decide(rules, "/private/x") == ((true, "")))
  }

  test("stacked user-agent lines share one group; UA match is case-insensitive") {
    assert(!isAllowed(txt, "OTHERBOT", "/graft-only/a"))
    assert(isAllowed(txt, "otherbot", "/private/x"))
  }

  test("allow wins a specificity tie; $ does not add specificity") {
    val t = "User-agent: *\nDisallow: /dir/\nAllow: /dir/$\n"
    // both patterns are 5 octets ($ excluded) → tie → allow
    assert(isAllowed(t, "bot", "/dir/"))
    // beyond the anchor the allow no longer matches
    assert(!isAllowed(t, "bot", "/dir/x"))
  }

  test("empty Disallow allows everything; no matching group allows everything") {
    assert(isAllowed("User-agent: *\nDisallow:\n", "bot", "/anything"))
    assert(isAllowed("User-agent: special\nDisallow: /\n", "bot", "/x"))
  }

  test("Disallow: / blocks all; comments and blank lines are ignored") {
    val t = "# hi\nUser-agent: bot # inline\n\nDisallow: / # everything\n"
    assert(!isAllowed(t, "bot", "/"))
    assert(!isAllowed(t, "bot", "/deep/path"))
  }

  test("field names are case-insensitive") {
    val t = "USER-AGENT: *\nDISALLOW: /a/\nallow: /a/b/\n"
    assert(!isAllowed(t, "bot", "/a/x"))
    assert(isAllowed(t, "bot", "/a/b/x"))
  }

  test("mid-pattern wildcard and rules before any group") {
    val t = "Disallow: /orphan/\nUser-agent: *\nDisallow: /a/*/secret\n"
    assert(isAllowed(t, "bot", "/orphan/x")) // orphan rule has no group
    assert(!isAllowed(t, "bot", "/a/x/secret"))
    assert(!isAllowed(t, "bot", "/a/x/y/secretz")) // prefix semantics after match
    assert(isAllowed(t, "bot", "/a/secret"))
  }

  test("glob matcher edge cases") {
    assert(matches("/", "/"))
    assert(matches("/", "/x"))
    assert(!matches("/x$", "/xy"))
    assert(matches("/*", "/anything"))
    assert(matches("/a*b*c", "/aXbYc-tail"))
    assert(!matches("/a*b$", "/aXbY"))
    assert(matches("/a**b$", "/aXXb"))
    assert(!matches("/abc", "/ab"))
  }
}
