package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-host crawl-budget allocator — the scheduling decision that sits
  * on top of the whole round-12 crawl stack: given a global fetch
  * budget for the next scheduling window, how many fetches does each
  * host get? Three signals meet, each an existing operator's output:
  *
  *   - DEMAND: how many admitted-novel URLs are waiting per host —
  *     the crawl funnel's stage-3 frame ([[Robots.funnelFrames]])
  *     rolled up by host;
  *   - CAPACITY: politeness — [[FetchWindow]] seconds divided by the
  *     host's robots crawl delay ([[Robots.rulesTable]]; hosts with
  *     the agent override or no robots get delay 1);
  *   - PRIORITY: the host-quality prior — [[Graph.hostRank]]'s
  *     PageRank, fixed to integer rank points (`FLOOR(pr·1e9)` — one
  *     IEEE multiply+floor, identical in both engines) so the
  *     allocation itself is ALL-INTEGER and bit-portable (the
  *     [[Curation.mixPlan]] discipline).
  *
  * Allocation rule (single-pass, deterministic): the global budget is
  * half the total demand (the mixPlan convention); each host's rank
  * share is `budget·points DIV points_tot` with the integer remainder
  * going one fetch each to the hosts with the largest
  * `(budget·points) MOD points_tot`, ties to the smaller host id
  * (largest-remainder apportionment — shares sum EXACTLY to the
  * budget); the final quota is `least(demand, capacity, share)` with
  * `binding` naming the constraint that bit (precedence
  * demand → robots → rank on ties). Slots freed by demand/politeness
  * clamps are NOT recursively refilled — a one-pass allocator is the
  * honest per-window semantics (the next window reallocates with the
  * next funnel's demand).
  *
  * Scale shape: the only corpus-sized work is the funnel's own plan
  * collapsed to a host-keyed partial-aggregating count; rank points,
  * delays and the allocation run on the HOST CATALOG (a ≤3-row-per-
  * host self-join for the remainder order, two 1-row broadcast
  * aggregates) — metadata-sized at any corpus scale.
  */
object CrawlBudget {

  /** Seconds per scheduling window: capacity = window DIV delay. */
  val FetchWindow = 600L

  /** `smp_crawl_budget` (see object scaladoc). */
  def crawlBudget(spark: SparkSession, dir: String): DataFrame = {
    val pr = Graph.hostRank(spark, dir)
      .select(col("host_id"), col("host"),
        floor(col("pagerank") * lit(1e9)).cast("long").as("points"))
    val demand = Robots.funnelFrames(spark, dir)._4
      .groupBy("host_id").agg(count(lit(1)).as("demand"))
    val delays = Robots.rulesTable(spark)
      .select(col("host_id"), col("crawl_delay"))
    // LAZY lineage cut: every downstream branch (tot, rp self-join,
    // rem, the final join) would otherwise re-run the funnel demand
    // rollup — the only corpus-sized work here — once each; the
    // checkpoint is the HOST-catalog frame, materialized once at
    // first action (construction stays plan-only)
    val base = pr
      .join(demand, Seq("host_id"), "left")
      .join(broadcast(delays), Seq("host_id"), "left")
      .select(col("host_id"), col("host"), col("points"),
        coalesce(col("demand"), lit(0L)).as("demand"),
        expr(s"$FetchWindow DIV coalesce(crawl_delay, 1)").as("capacity"))
      .localCheckpoint(false)
    val tot = base.agg(sum("points").as("points_tot"),
      sum("demand").as("demand_tot"))
    val sh = base.crossJoin(broadcast(tot))
      .withColumn("budget", expr("demand_tot DIV 2"))
      .withColumn("share0", expr("budget * points DIV points_tot"))
      .withColumn("rem_pts", expr("(budget * points) % points_tot"))
    // largest-remainder order via a host-catalog-sized self-join (the
    // mixPlan idx pattern — no global window)
    val rp = sh.select(col("host_id"), col("rem_pts"))
    val idx = rp
      .join(rp.select(col("host_id").as("h2"), col("rem_pts").as("r2")),
        col("r2") > col("rem_pts") ||
          (col("r2") === col("rem_pts") && col("h2") < col("host_id")),
        "left")
      .groupBy("host_id").agg((count(col("h2")) + 1).as("idx"))
    val rem = sh.agg((max("budget") - sum("share0")).as("rem"))
    sh.join(idx, Seq("host_id"))
      .crossJoin(broadcast(rem))
      .withColumn("share",
        col("share0") + when(col("idx") <= col("rem"), 1L).otherwise(0L))
      .withColumn("quota", least(col("demand"), col("capacity"), col("share")))
      .select(col("host_id"), col("host"), col("points"), col("demand"),
        col("capacity"), col("share"), col("quota"),
        when(col("quota") === col("demand"), "demand")
          .when(col("quota") === col("capacity"), "robots")
          .otherwise("rank").as("binding"))
      .orderBy("host_id")
  }

  val oracles: Map[String, String] = Map(
    "smp_crawl_budget" -> {
      val h = Curation.portableHashSql("doc_id")
      s"""WITH ${Graph.hostRankCte},
         |${Url.variantCteSql},
         |fb AS (SELECT doc_id, variant, url, canon_url,
         |             doc_id % ${Url.HostMod} AS h,
         |             CASE WHEN variant <= 3
         |                    THEN '/p'||(doc_id % ${Url.PathMod})
         |                         ||'?a='||(doc_id % ${Url.ParamMod})||'&b=2'
         |                  WHEN variant = 4 THEN '/' END AS path,
         |             (($h) % 10 = 0) AS is_batch
         |      FROM v),
         |valid AS (SELECT * FROM fb WHERE is_batch AND canon_url IS NOT NULL),
         |allowed AS (
         |  SELECT * FROM valid
         |  WHERE h % 3 = 0 OR NOT (starts_with(path, '/private')
         |                          OR starts_with(path, '/p'||h))),
         |cfr AS (SELECT DISTINCT canon_url FROM fb
         |        WHERE NOT is_batch AND canon_url IS NOT NULL),
         |novel AS (SELECT a.* FROM allowed a LEFT JOIN cfr
         |          ON a.canon_url = cfr.canon_url
         |          WHERE cfr.canon_url IS NULL),
         |dem AS (SELECT h AS host_id, CAST(COUNT(*) AS BIGINT) AS demand
         |        FROM novel GROUP BY 1),
         |base AS (
         |  SELECT hp.host_id, hp.host,
         |         CAST(FLOOR(hp.pagerank * 1e9) AS BIGINT) AS points,
         |         CAST(COALESCE(dem.demand, 0) AS BIGINT) AS demand,
         |         CAST($FetchWindow // (CASE WHEN hp.host_id >= ${Url.HostMod}
         |                 OR hp.host_id % 3 = 0 THEN 1
         |               ELSE 1 + hp.host_id % 5 END) AS BIGINT) AS capacity
         |  FROM hostpr hp LEFT JOIN dem ON hp.host_id = dem.host_id),
         |tot AS (SELECT CAST(SUM(points) AS BIGINT) AS points_tot,
         |               CAST(SUM(demand) AS BIGINT) AS demand_tot
         |        FROM base),
         |sh AS (SELECT ba.*, demand_tot // 2 AS budget,
         |              (demand_tot // 2) * points // points_tot AS share0,
         |              ((demand_tot // 2) * points) % points_tot AS rem_pts
         |       FROM base ba, tot),
         |ix AS (SELECT a.host_id, 1 + COUNT(b.host_id) AS idx
         |       FROM sh a LEFT JOIN sh b
         |         ON b.rem_pts > a.rem_pts
         |            OR (b.rem_pts = a.rem_pts AND b.host_id < a.host_id)
         |       GROUP BY 1),
         |re AS (SELECT MAX(budget) - CAST(SUM(share0) AS BIGINT) AS rem
         |       FROM sh),
         |fin AS (SELECT s.host_id, s.host, s.points, s.demand, s.capacity,
         |               s.share0 + CASE WHEN ix.idx <= re.rem
         |                 THEN CAST(1 AS BIGINT) ELSE 0 END AS share
         |        FROM sh s JOIN ix ON s.host_id = ix.host_id, re)
         |SELECT host_id, host, points, demand, capacity, share,
         |       LEAST(demand, capacity, share) AS quota,
         |       CASE WHEN LEAST(demand, capacity, share) = demand
         |              THEN 'demand'
         |            WHEN LEAST(demand, capacity, share) = capacity
         |              THEN 'robots'
         |            ELSE 'rank' END AS binding
         |FROM fin ORDER BY host_id""".stripMargin
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "smp_crawl_budget" -> crawlBudget)
}
