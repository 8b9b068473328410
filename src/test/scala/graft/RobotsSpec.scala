package graft

import graft.operators.{Robots, Url}

class RobotsSpec extends SparkSpec {

  test("planted robots bodies: every parser contract rule") {
    // comment stripping + case-insensitive directives + delay
    val r1 = Robots.parse(
      "# banner\nUSER-AGENT: *   # all\nDisallow: /a # trailing\n" +
        "disallow: /b\ncrawl-delay: 7\n")
    assert(r1.disallow == Seq("/a") ++ Seq("/b"))
    assert(r1.crawlDelay.contains(7L))

    // consecutive User-agent lines share ONE group
    val r2 = Robots.parse(
      "User-agent: other\nUser-agent: graftbot\nDisallow: /x\n\n" +
        "User-agent: *\nDisallow: /y\n")
    assert(r2.disallow == Seq("/x"), "multi-UA group applies to us")

    // a specific-agent group overrides *, wherever it appears
    val r3 = Robots.parse(
      "User-agent: *\nDisallow: /all\n\nUser-agent: GRAFTBOT\nDisallow:\n")
    assert(r3.disallow.isEmpty && r3.crawlDelay.isEmpty)

    // a foreign agent's deny-all never leaks into *
    val r4 = Robots.parse("User-agent: evilbot\nDisallow: /\n\n" +
      "User-agent: *\nDisallow: /private\n")
    assert(r4.disallow == Seq("/private"))

    // no matching group at all -> allow-all
    assert(Robots.parse("User-agent: evilbot\nDisallow: /\n") ==
      Robots.Rules(Nil, None))
    assert(Robots.parse("") == Robots.Rules(Nil, None))

    // unknown directives are skipped; directives before any group and
    // non-numeric delays are ignored
    val r5 = Robots.parse(
      "Disallow: /orphan\nSitemap: http://x/s.xml\n" +
        "User-agent: *\nNoindex: /n\nCrawl-delay: fast\nDisallow: /z\n")
    assert(r5 == Robots.Rules(Seq("/z"), None))
  }

  test("screen verdicts: prefix semantics, overrides, delay rollup") {
    val rows = Robots.robotsScreen(spark, sfDir).collect()
    // valid variants only (robots attaches to URLs)
    assert(rows.length == 500 * (Url.UrlVariants - 1))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val h = id % Url.HostMod
      val path = r.getAs[String]("path")
      val expectAllowed =
        if (h % 3 == 0) true // graftbot override group
        else !(path.startsWith("/private") || path.startsWith(s"/p$h"))
      assert(r.getAs[Boolean]("allowed") == expectAllowed, s"doc $id $path")
      val d = Option(r.getAs[java.lang.Long]("crawl_delay")).map(_.longValue)
      assert(d == (if (h % 3 == 0) None else Some(1 + h % 5)), s"doc $id")
    }
    // both verdicts occur, and the prefix rule really bites somewhere
    assert(rows.exists(!_.getAs[Boolean]("allowed")))
    assert(rows.exists(_.getAs[Boolean]("allowed")))
  }
}
