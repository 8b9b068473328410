package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sitemap ingestion — the discovery-side dual of the robots screen
  * ([[Robots]]): where robots.txt tells the crawler what it may NOT
  * fetch, the per-host sitemap tells it what the host WANTS fetched,
  * with freshness (`lastmod`) and `priority` hints that seed the
  * frontier scheduler. The PARSER is real ([[parse]]: XML comment
  * stripping — a commented-out `<url>` block must not surface —
  * `<url>` element scan, `<loc>`/`<lastmod>`/`<priority>` extraction,
  * entity decode of `&amp;`-escaped URLs, loc-less or unterminated
  * entries counted corrupt and skipped — the mm_* and WARC
  * tolerant-parse convention); the sitemap corpus is synthesized per
  * host by pure
  * arithmetic so the DuckDB oracle recomputes every emitted row — a
  * parser bug (entity left encoded, comment leaking, wrong element
  * boundary) breaks the hash gate at every scale factor.
  *
  * Synthesized sitemap for `host{h}.example` (see [[sitemapTxt]]):
  * `3 + h%3` well-formed entries whose `loc` spellings rotate through
  * clean / uppercase+default-port+fragment / tracking-param dressings
  * of the same canonical page (the [[graft.functions.UrlCanon]]
  * collapse, entity-escaped in the XML), plus on every 5th host a
  * non-URL loc (→ NULL canon, the corrupt-payload convention), plus a
  * loc-LESS entry every host that the parser must count-and-skip, and
  * a commented-out entry that must never surface.
  *
  * The screen composes the canonicalizer and the standing corpus
  * frontier ([[Url.frontier]]): each sitemap URL arrives canonical
  * with `known` telling the scheduler whether the page is already
  * crawled — the sitemap→frontier admission decision.
  *
  * Scale shape: sitemap fetch+parse is per-host executor work (the
  * sitemap table is HOST-catalog-sized); canonicalization is map-side
  * codegen; the frontier membership is ONE join keyed on the
  * collapsed canonical string (both sides hash-partition on it at
  * crawl scale; the frontier is the persisted index of
  * [[Url.saveFrontier]]).
  */
object Sitemap {

  /** One parsed sitemap entry (strings as they appear, entities
    * decoded; absent elements None). */
  final case class Entry(loc: String, lastmod: Option[String],
      priority: Option[String])

  private def decode(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&amp;", "&")

  private def stripComments(xml: String): String = {
    val sb = new java.lang.StringBuilder(xml.length)
    var i = 0
    while (i < xml.length) {
      val at = xml.indexOf("<!--", i)
      if (at < 0) { sb.append(xml, i, xml.length); i = xml.length }
      else {
        sb.append(xml, i, at)
        val end = xml.indexOf("-->", at + 4)
        i = if (end < 0) xml.length else end + 3
      }
    }
    sb.toString
  }

  private def element(block: String, name: String): Option[String] = {
    val open = s"<$name>"
    val a = block.indexOf(open)
    if (a < 0) return None
    val b = block.indexOf(s"</$name>", a + open.length)
    if (b < 0) return None
    Some(decode(block.substring(a + open.length, b).trim))
  }

  /** Parse a sitemap body: (entries in document order, corrupt-entry
    * count). A `<url>` element missing its `<loc>` or its closing tag
    * is counted and skipped — corruption in one entry never fails the
    * sitemap. */
  def parse(xml: String): (Seq[Entry], Int) = {
    val body = stripComments(xml)
    val out = Vector.newBuilder[Entry]
    var corrupt = 0
    var i = 0
    var done = false
    while (!done) {
      val a = body.indexOf("<url>", i)
      if (a < 0) done = true
      else {
        val b = body.indexOf("</url>", a + 5)
        if (b < 0) { corrupt += 1; done = true }
        else {
          val block = body.substring(a + 5, b)
          element(block, "loc") match {
            case Some(loc) =>
              out += Entry(loc, element(block, "lastmod"),
                element(block, "priority"))
            case None => corrupt += 1
          }
          i = b + 6
        }
      }
    }
    (out.result(), corrupt)
  }

  /** Deterministic per-host sitemap body (see the object scaladoc);
    * shared by the query, the oracle arithmetic and SitemapSpec. */
  def sitemapTxt(h: Long): String = {
    val sb = new StringBuilder(512)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      .append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      .append("<!-- generated for host").append(h)
      .append(" <url><loc>http://commented.example/x</loc></url> -->\n")
    (0L to 2L + h % 3).foreach { k =>
      val q = h * 31 + k
      val loc = (k % 3) match {
        case 0 => s"http://host$h.example/p${q % 97}?a=${q % 7}&b=2"
        case 1 => s"HTTP://HOST$h.EXAMPLE:80/p${q % 97}?a=${q % 7}&b=2#frag"
        case _ => s"http://host$h.example/p${q % 97}?utm_source=sm&a=${q % 7}&b=2"
      }
      sb.append("  <url><loc>").append(loc.replace("&", "&amp;"))
        .append("</loc><lastmod>2024-01-")
        .append(f"${1 + q % 28}%02d")
        .append("</lastmod><priority>0.").append(5 + q % 5)
        .append("</priority></url>\n")
    }
    if (h % 5 == 0)
      sb.append("  <url><loc>not a url ").append(h)
        .append("</loc><lastmod>2024-02-01</lastmod>")
        .append("<priority>0.1</priority></url>\n")
    sb.append("  <url><lastmod>2024-01-01</lastmod></url>\n") // loc-less: skipped
      .append("</urlset>\n")
    sb.toString
  }

  /** The parsed per-host sitemap entries: (host_id, seq, loc, lastmod
    * string, priority) — fetch+parse is per-host executor work. */
  private[graft] def entries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(Url.HostMod).as[Long]
      .flatMap { h =>
        parse(sitemapTxt(h))._1.iterator.zipWithIndex.map { case (e, i) =>
          (h, i, e.loc, e.lastmod, e.priority)
        }
      }
      .toDF("host_id", "seq", "loc", "lastmod_s", "priority")
  }

  /** `xf_sitemap`: every sitemap entry canonicalized and screened
    * against the standing corpus frontier — per (host, entry): the
    * advertised spelling, its canonical URL (NULL for garbage locs),
    * the parsed freshness date and priority hint, and whether the
    * canonical page is already crawled. The discovery feed a frontier
    * scheduler merges, dressed spellings already collapsed. */
  def sitemapScreen(spark: SparkSession, dir: String): DataFrame = {
    val e = entries(spark)
      .select(col("host_id"), col("seq"), col("loc"),
        graft.functions.UrlCanon.canonCol(spark, col("loc")).as("canon_url"),
        to_date(col("lastmod_s")).as("lastmod"), col("priority"))
    e.join(Url.frontier(spark, dir).withColumn("known0", lit(true)),
        Seq("canon_url"), "left")
      .select(col("host_id"), col("seq"), col("loc"), col("canon_url"),
        col("lastmod"), col("priority"),
        coalesce(col("known0"), lit(false)).as("known"))
      .orderBy("host_id", "seq")
  }

  val oracles: Map[String, String] = Map(
    "xf_sitemap" ->
      s"""WITH ${Url.variantCteSql},
         |cf AS (SELECT DISTINCT canon_url FROM v WHERE canon_url IS NOT NULL),
         |hosts AS (SELECT unnest(generate_series(0, ${Url.HostMod - 1})) AS h),
         |g AS (SELECT h, unnest(generate_series(0, 2 + h % 3)) AS k FROM hosts),
         |good AS (SELECT h, CAST(k AS INT) AS seq, h*31 + k AS q FROM g),
         |ge AS (SELECT h, seq,
         |         CASE seq % 3
         |           WHEN 0 THEN 'http://host'||h||'.example/p'||(q%97)
         |                       ||'?a='||(q%7)||'&b=2'
         |           WHEN 1 THEN 'HTTP://HOST'||h||'.EXAMPLE:80/p'||(q%97)
         |                       ||'?a='||(q%7)||'&b=2#frag'
         |           ELSE 'http://host'||h||'.example/p'||(q%97)
         |                ||'?utm_source=sm&a='||(q%7)||'&b=2' END AS loc,
         |         'http://host'||h||'.example/p'||(q%97)
         |           ||'?a='||(q%7)||'&b=2' AS canon_url,
         |         DATE '2024-01-01' + CAST(q % 28 AS INT) AS lastmod,
         |         '0.'||(5 + q % 5) AS priority
         |       FROM good),
         |bad AS (SELECT h, CAST(3 + h % 3 AS INT) AS seq,
         |               'not a url '||h AS loc,
         |               CAST(NULL AS VARCHAR) AS canon_url,
         |               DATE '2024-02-01' AS lastmod,
         |               '0.1' AS priority
         |        FROM hosts WHERE h % 5 = 0),
         |alle AS (SELECT * FROM ge UNION ALL SELECT * FROM bad)
         |SELECT a.h AS host_id, a.seq, a.loc, a.canon_url, a.lastmod,
         |       a.priority, cf.canon_url IS NOT NULL AS known
         |FROM alle a LEFT JOIN cf ON a.canon_url = cf.canon_url
         |ORDER BY host_id, seq""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "xf_sitemap" -> sitemapScreen)
}
