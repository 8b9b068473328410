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
}
