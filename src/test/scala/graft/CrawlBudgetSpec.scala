package graft

import graft.operators.{CrawlBudget, Robots, Url}
import org.apache.spark.sql.functions._

class CrawlBudgetSpec extends SparkSpec {

  private lazy val rows = CrawlBudget.crawlBudget(spark, sfDir).collect()

  test("shares sum exactly to the budget (largest-remainder invariant)") {
    val demandTot = rows.map(_.getAs[Long]("demand")).sum
    assert(rows.map(_.getAs[Long]("share")).sum == demandTot / 2)
  }

  test("sequential replay: share/quota/binding from the driver recompute") {
    val budget = rows.map(_.getAs[Long]("demand")).sum / 2
    val pointsTot = rows.map(_.getAs[Long]("points")).sum
    val share0 = rows.map(r => r.getAs[Long]("host_id") ->
      budget * r.getAs[Long]("points") / pointsTot).toMap
    val remPts = rows.map(r => r.getAs[Long]("host_id") ->
      budget * r.getAs[Long]("points") % pointsTot).toMap
    val rem = budget - share0.values.sum
    val bonus = rows.map(_.getAs[Long]("host_id"))
      .sortBy(h => (-remPts(h), h)).take(rem.toInt).toSet
    rows.foreach { r =>
      val h = r.getAs[Long]("host_id")
      val share = share0(h) + (if (bonus(h)) 1L else 0L)
      assert(r.getAs[Long]("share") == share, s"host $h share")
      val quota = Seq(r.getAs[Long]("demand"), r.getAs[Long]("capacity"),
        share).min
      assert(r.getAs[Long]("quota") == quota, s"host $h quota")
      val binding =
        if (quota == r.getAs[Long]("demand")) "demand"
        else if (quota == r.getAs[Long]("capacity")) "robots"
        else "rank"
      assert(r.getAs[String]("binding") == binding, s"host $h binding")
    }
  }

  test("demand equals the funnel novel frame rolled up by host") {
    val novel = Robots.funnelFrames(spark, sfDir)._4
      .groupBy("host_id").count().collect()
      .map(r => r.getAs[Long]("host_id") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val h = r.getAs[Long]("host_id")
      assert(r.getAs[Long]("demand") == novel.getOrElse(h, 0L), s"host $h")
    }
    // the pageless sink host has rank points but zero demand → quota 0
    val sink = rows.find(_.getAs[Long]("host_id") == Url.HostMod)
    assert(sink.exists(r => r.getAs[Long]("demand") == 0L &&
      r.getAs[Long]("quota") == 0L && r.getAs[String]("binding") == "demand"))
  }

  test("fetch schedule: fills quotas in canon order inside the window") {
    val sched = CrawlBudget.fetchSchedule(spark, sfDir).collect()
    val quota = rows.map(r => r.getAs[Long]("host_id") ->
      r.getAs[Long]("quota")).toMap
    val novel = Robots.funnelFrames(spark, sfDir)._4
      .select(col("host_id"), col("canon_url")).distinct().collect()
      .groupBy(_.getAs[Long]("host_id"))
      .map { case (h, v) => h -> v.map(_.getAs[String]("canon_url")).sorted }
    sched.groupBy(_.getAs[Long]("host_id")).foreach { case (h, rs) =>
      // exactly min(quota, frontier-distinct novel) slots, 1..n
      val expect = math.min(quota(h), novel.getOrElse(h, Array.empty).length)
      assert(rs.length == expect, s"host $h slots")
      val bySlot = rs.sortBy(_.getAs[Int]("slot"))
      assert(bySlot.map(_.getAs[Int]("slot")).toSeq == (1 to rs.length))
      // canon order and politeness spacing
      assert(bySlot.map(_.getAs[String]("canon_url")).toSeq ==
        novel(h).take(rs.length).toSeq, s"host $h order")
      bySlot.foreach { r =>
        assert(r.getAs[Long]("fetch_offset_s") ==
          (r.getAs[Int]("slot") - 1).toLong * r.getAs[Long]("delay"))
        assert(r.getAs[Long]("fetch_offset_s") < CrawlBudget.FetchWindow,
          s"host $h offset past the window")
      }
    }
    // hosts with zero quota emit nothing
    assert(!sched.exists(r => quota(r.getAs[Long]("host_id")) == 0L))
  }

  test("refresh schedule: queue order, quota fill, offsets after the novel slots") {
    val sched = CrawlBudget.refreshSchedule(spark, sfDir).collect()
    val plan = CrawlBudget.recrawlPlan(spark, sfDir).collect()
      .map(r => r.getAs[Long]("host_id") -> r.getAs[Long]("refresh_quota")).toMap
    val quota = rows.map(r => r.getAs[Long]("host_id") ->
      r.getAs[Long]("quota")).toMap
    val capacity = rows.map(r => r.getAs[Long]("host_id") ->
      r.getAs[Long]("capacity")).toMap
    // the recrawl queue (stale known pages, priority desc / canon asc)
    val queue = graft.operators.Sitemap.recrawl(spark, sfDir).collect()
      .filter(_.getAs[Boolean]("stale"))
      .groupBy(_.getAs[Long]("host_id"))
      .map { case (h, v) =>
        h -> v.sortBy(_.getAs[Long]("refresh_rank"))
          .map(_.getAs[String]("canon_url")).toSeq }
    sched.groupBy(_.getAs[Long]("host_id")).foreach { case (h, rs) =>
      val expect = math.min(plan(h), queue.getOrElse(h, Seq.empty).length.toLong)
      assert(rs.length.toLong == expect, s"host $h slots")
      val bySlot = rs.sortBy(_.getAs[Int]("slot"))
      assert(bySlot.map(_.getAs[Int]("slot")).toSeq == (1 to rs.length))
      assert(bySlot.map(_.getAs[String]("canon_url")).toSeq ==
        queue(h).take(rs.length), s"host $h queue order")
      bySlot.foreach { r =>
        // refresh slots ride AFTER the novel quota's slots...
        assert(r.getAs[Long]("fetch_offset_s") ==
          (quota(h) + r.getAs[Int]("slot") - 1) * r.getAs[Long]("delay"))
        // ...and still land inside the window: quota+refresh ≤ capacity
        assert(r.getAs[Long]("fetch_offset_s") < CrawlBudget.FetchWindow,
          s"host $h refresh offset past the window")
      }
      assert(quota(h) + plan(h) <= capacity(h), s"host $h capacity overrun")
    }
    // hosts with zero refresh quota emit nothing
    assert(!sched.exists(r => plan(r.getAs[Long]("host_id")) == 0L))
    // non-vacuous at sf0.1 (sf0.001's three known pages are all fresh —
    // the SitemapSpec CRT note): stale pages exist there, so the
    // freshness loop actually emits slots, all inside the window
    val big = CrawlBudget.refreshSchedule(spark, "/root/testdata/sf0.1").collect()
    assert(big.nonEmpty)
    big.foreach(r => assert(r.getAs[Long]("fetch_offset_s") <
      CrawlBudget.FetchWindow))
  }

  test("capacity honors the robots crawl delays") {
    val delays = Robots.rulesTable(spark)
      .select(col("host_id"), col("crawl_delay")).collect()
      .map(r => r.getAs[Long]("host_id") ->
        Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(1L)).toMap
    rows.foreach { r =>
      val h = r.getAs[Long]("host_id")
      assert(r.getAs[Long]("capacity") ==
        CrawlBudget.FetchWindow / delays.getOrElse(h, 1L), s"host $h")
    }
  }
}
