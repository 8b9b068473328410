package graft

import graft.operators.Sitemap
import org.apache.spark.sql.functions._

class SitemapSpec extends SparkSpec {

  test("parser: entries, entity decode, optional elements") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset>
        |<url><loc>http://a.example/p?x=1&amp;y=2</loc>
        |  <lastmod>2024-03-01</lastmod><priority>0.8</priority></url>
        |<url><loc>  http://b.example/  </loc></url>
        |</urlset>""".stripMargin
    val (es, corrupt) = Sitemap.parse(xml)
    assert(corrupt == 0)
    assert(es == Seq(
      Sitemap.Entry("http://a.example/p?x=1&y=2", Some("2024-03-01"),
        Some("0.8")),
      Sitemap.Entry("http://b.example/", None, None)))
  }

  test("parser: comments never surface, corrupt entries counted not fatal") {
    val xml =
      """<urlset>
        |<!-- <url><loc>http://commented.example/x</loc></url> -->
        |<url><lastmod>2024-01-01</lastmod></url>
        |<url><loc>http://ok.example/</loc></url>
        |<url><loc>http://unterminated.example/
        |</urlset>""".stripMargin
    val (es, corrupt) = Sitemap.parse(xml)
    assert(es.map(_.loc) == Seq("http://ok.example/"))
    // loc-less entry + the unterminated tail
    assert(corrupt == 2)
  }

  test("synthesized sitemaps parse clean: census matches the arithmetic") {
    (0L until graft.operators.Url.HostMod).foreach { h =>
      val (es, corrupt) = Sitemap.parse(Sitemap.sitemapTxt(h))
      val expected = (3 + h % 3) + (if (h % 5 == 0) 1 else 0)
      assert(es.length == expected, s"host $h")
      assert(corrupt == 1, s"host $h: the loc-less entry is the one skip")
      assert(!es.exists(_.loc.contains("commented")), s"host $h")
      // entities decoded: the raw & is back
      assert(es.head.loc.contains("&b=2"), s"host $h")
    }
  }

  test("screen: spellings collapse, garbage goes NULL, known hits frontier") {
    val out = Sitemap.sitemapScreen(spark, sfDir).collect()
    // every well-formed entry canonicalized; garbage locs NULL
    val bad = out.filter(r => r.getAs[String]("loc").startsWith("not a url"))
    assert(bad.nonEmpty && bad.forall(r => r.getAs[String]("canon_url") == null
      && !r.getAs[Boolean]("known")))
    val good = out.filter(r => r.getAs[String]("canon_url") != null)
    // the three dressings of one page share one canonical form shape
    assert(good.forall(r =>
      r.getAs[String]("canon_url").matches(
        "http://host\\d+\\.example/p\\d+\\?a=\\d&b=2")))
    // known agrees with a frontier recompute
    val frontier = graft.operators.Url.frontier(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    good.foreach { r =>
      assert(r.getAs[Boolean]("known") ==
        frontier.contains(r.getAs[String]("canon_url")))
    }
    // both outcomes occur at this SF (CRT residues land in/out of corpus)
    assert(good.exists(_.getAs[Boolean]("known")))
    assert(good.exists(r => !r.getAs[Boolean]("known")))
  }

  test("recrawl: staleness replays lastmod vs last-crawl; ranks are per-host dense over stale") {
    val screen = Sitemap.sitemapScreen(spark, sfDir).collect()
    val out = Sitemap.recrawl(spark, sfDir).collect()
    // exactly the KNOWN valid sitemap pages appear
    val known = screen.filter(r => r.getAs[Boolean]("known")).map(
      r => (r.getAs[Long]("host_id"), r.getAs[String]("canon_url"))).toSet
    assert(out.map(r => (r.getAs[Long]("host_id"),
      r.getAs[String]("canon_url"))).toSet == known)
    out.foreach { r =>
      // stale is exactly the date comparison
      assert(r.getAs[Boolean]("stale") ==
        r.getAs[java.sql.Date]("lastmod").toLocalDate
          .isAfter(r.getAs[java.sql.Date]("last_crawl").toLocalDate))
      // fresh pages carry no refresh rank
      if (!r.getAs[Boolean]("stale")) assert(r.isNullAt(r.fieldIndex("refresh_rank")))
    }
    // per host, stale ranks are a dense 1..k in (priority desc, canon asc)
    out.filter(_.getAs[Boolean]("stale")).groupBy(_.getAs[Long]("host_id"))
      .foreach { case (h, g) =>
        val byRank = g.sortBy(_.getAs[Long]("refresh_rank"))
        assert(byRank.map(_.getAs[Long]("refresh_rank")).toSeq ==
          (1L to g.length).toSeq, s"host $h ranks")
        val expected = g.map(r => (r.getAs[String]("priority"),
            r.getAs[String]("canon_url")))
          .sortBy { case (p, c) => (p, c) }(
            Ordering.Tuple2(Ordering.String.reverse, Ordering.String))
          .map(_._2).toSeq
        assert(byRank.map(_.getAs[String]("canon_url")).toSeq == expected,
          s"host $h order")
      }
  }

  test("recrawl plan: refresh rides slack, never exceeds stale demand or capacity") {
    val plan = graft.operators.CrawlBudget.recrawlPlan(spark, sfDir).collect()
    val budget = graft.operators.CrawlBudget.crawlBudget(spark, sfDir).collect()
      .map(r => r.getAs[Long]("host_id") ->
        (r.getAs[Long]("capacity"), r.getAs[Long]("quota"))).toMap
    val stale = Sitemap.recrawl(spark, sfDir).collect()
      .filter(_.getAs[Boolean]("stale"))
      .groupBy(_.getAs[Long]("host_id")).map { case (h, g) => h -> g.length.toLong }
    assert(plan.map(_.getAs[Long]("host_id")).toSet == budget.keySet)
    plan.foreach { r =>
      val h = r.getAs[Long]("host_id")
      val (cap, quota) = budget(h)
      assert(r.getAs[Long]("refresh_demand") == stale.getOrElse(h, 0L), s"host $h")
      assert(r.getAs[Long]("slack") == cap - quota, s"host $h slack")
      assert(r.getAs[Long]("refresh_quota") ==
        math.min(r.getAs[Long]("refresh_demand"), cap - quota), s"host $h rq")
      // novel discovery is never starved: refresh fits inside the window
      assert(r.getAs[Long]("refresh_quota") + quota <= cap, s"host $h window")
    }
    // the freshness loop actually schedules something where stale pages
    // exist (sf0.001's three known pages all happen to be fresh — the
    // composed CRT residues put stale known pages in the corpus at sf0.1)
    val big = graft.operators.CrawlBudget.recrawlPlan(spark, "/root/testdata/sf0.1")
      .collect()
    assert(big.map(_.getAs[Long]("refresh_quota")).sum > 0)
    big.foreach { r =>
      assert(r.getAs[Long]("refresh_quota") <=
        math.min(r.getAs[Long]("refresh_demand"), r.getAs[Long]("slack")))
    }
  }
}
