package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's user-facing analytics queries
  * (scripts/athena_queries.py:76-122), composed over the Gold outputs.
  *
  * Scale design: these run over the (small) gold aggregates, so the only
  * heavy work is the upstream gold plan. The scalar subquery in
  * `product_analysis` (MAX(times_sold)) is a 1-row aggregate joined back
  * with a broadcast — a BroadcastNestedLoopJoin of one row, never a
  * cartesian re-join or a second scan of the fact.
  */
object Athena {

  /** daily_revenue (athena_queries.py:76-85). */
  def dailyRevenueOf(daily: DataFrame): DataFrame =
    daily
      .where(col("revenue") > 0)
      .select(
        col("sale_date"), col("total_orders"), col("total_items"), col("revenue"),
        Gold.fixedRound(col("revenue") / col("total_items"), 2).as("avg_item_value"))
      .orderBy(col("sale_date").desc)
      .limit(10)

  def dailyRevenue(spark: SparkSession, dir: String): DataFrame =
    dailyRevenueOf(Gold.dailySalesSummary(spark, dir))

  /** top_performing_customers (athena_queries.py:87-98). */
  def topPerformingCustomersOf(topCustomers: DataFrame): DataFrame =
    topCustomers
      .select(
        col("customer_id"), col("total_spent"), col("order_count"), col("total_items"),
        Gold.fixedRound(col("total_spent") / col("order_count"), 2).as("avg_order_value"),
        col("city"), col("country"))
      .orderBy(col("total_spent").desc, col("customer_id"))
      .limit(5)

  def topPerformingCustomers(spark: SparkSession, dir: String): DataFrame =
    topPerformingCustomersOf(Gold.topCustomers(spark, dir))

  /** product_analysis (athena_queries.py:100-112): popularity score
    * against the global MAX(times_sold). The max is a 1-row aggregate
    * cross-joined back via `broadcast` — a BroadcastNestedLoopJoin of a
    * single row, so the product aggregate is never funneled through a
    * single-partition window exchange (which would bottleneck a wide
    * product dimension at 100 TB). The aggregate branch shares the same
    * gold subplan, so ReuseExchange keeps the fact scan single. */
  def productAnalysisOf(perf: DataFrame): DataFrame =
    perf
      .crossJoin(broadcast(perf.agg(max(col("times_sold")).as("max_sold"))))
      .select(
        col("product_id"), col("product_name"), col("category"),
        col("times_sold"), col("total_quantity"),
        Gold.fixedRound(col("avg_price"), 2).as("avg_price"),
        Gold.fixedRound(col("times_sold") * lit(1.0) / col("max_sold"), 2)
          .as("popularity_score"))
      .orderBy(col("times_sold").desc, col("product_id"))
      .limit(10)

  def productAnalysis(spark: SparkSession, dir: String): DataFrame =
    productAnalysisOf(Gold.productPerformance(spark, dir))

  /** revenue_by_category (athena_queries.py:114-122). */
  def revenueByCategoryOf(perf: DataFrame): DataFrame =
    perf
      .groupBy("category")
      .agg(
        sum(col("times_sold")).as("total_sales"),
        sum(col("total_quantity")).as("total_units"),
        Gold.fixedRound(Gold.moneySum(col("times_sold") * col("avg_price")), 2)
          .as("estimated_revenue"))
      .orderBy(col("estimated_revenue").desc, col("category"))

  def revenueByCategory(spark: SparkSession, dir: String): DataFrame =
    revenueByCategoryOf(Gold.productPerformance(spark, dir))

  // ---- DuckDB oracles ----

  private val goldCtes =
    s"""${Tables.salesCte}, ${Tables.customersCte}, ${Tables.productsCte},
       |daily AS (
       |  SELECT CAST(sale_ts AS DATE) AS sale_date,
       |         COUNT(transaction_id) AS total_orders,
       |         CAST(SUM(quantity) AS BIGINT) AS total_items,
       |         CAST(SUM(CAST(FLOOR((unit_price*quantity)*10000) AS DECIMAL(28,0))) AS DOUBLE)/10000 AS revenue
       |  FROM sales WHERE CAST(sale_ts AS DATE) IS NOT NULL GROUP BY 1),
       |cust_spend AS (
       |  SELECT customer_id,
       |         COUNT(transaction_id) AS order_count,
       |         CAST(SUM(quantity) AS BIGINT) AS total_items,
       |         CAST(SUM(CAST(FLOOR((unit_price*quantity)*10000) AS DECIMAL(28,0))) AS DOUBLE)/10000 AS total_spent
       |  FROM sales GROUP BY 1),
       |top_cust AS (
       |  SELECT s.*, c.city, c.country
       |  FROM cust_spend s LEFT JOIN customers c USING (customer_id)
       |  ORDER BY s.total_spent DESC, s.customer_id LIMIT 10),
       |prod_perf AS (
       |  SELECT f.product_id,
       |         f.times_sold, f.total_quantity, f.avg_price,
       |         p.product_name, p.category
       |  FROM (SELECT product_id,
       |               COUNT(transaction_id) AS times_sold,
       |               CAST(SUM(quantity) AS BIGINT) AS total_quantity,
       |               CAST(SUM(CAST(FLOOR(unit_price*10000) AS DECIMAL(28,0))) AS DOUBLE)/10000
       |                 / COUNT(transaction_id) AS avg_price
       |        FROM sales GROUP BY 1) f
       |  LEFT JOIN products p USING (product_id))""".stripMargin

  val oracles: Map[String, String] = Map(
    "ath_daily_revenue" ->
      s"""WITH $goldCtes
         |SELECT sale_date, total_orders, total_items, revenue,
         |       ${Gold.fixedRoundSql("revenue / total_items", 2)} AS avg_item_value
         |FROM daily WHERE revenue > 0
         |ORDER BY sale_date DESC LIMIT 10""".stripMargin,
    "ath_top_customers" ->
      s"""WITH $goldCtes
         |SELECT customer_id, total_spent, order_count, total_items,
         |       ${Gold.fixedRoundSql("total_spent / order_count", 2)} AS avg_order_value,
         |       city, country
         |FROM top_cust
         |ORDER BY total_spent DESC, customer_id LIMIT 5""".stripMargin,
    "ath_product_analysis" ->
      s"""WITH $goldCtes
         |SELECT product_id, product_name, category, times_sold, total_quantity,
         |       ${Gold.fixedRoundSql("avg_price", 2)} AS avg_price,
         |       ${Gold.fixedRoundSql("(times_sold * 1.0) / (SELECT MAX(times_sold) FROM prod_perf)", 2)}
         |         AS popularity_score
         |FROM prod_perf
         |ORDER BY times_sold DESC, product_id LIMIT 10""".stripMargin,
    "ath_revenue_by_category" ->
      s"""WITH $goldCtes
         |SELECT category,
         |       CAST(SUM(times_sold) AS BIGINT) AS total_sales,
         |       CAST(SUM(total_quantity) AS BIGINT) AS total_units,
         |       ${Gold.fixedRoundSql(Gold.moneySumSql("times_sold*avg_price"), 2)}
         |         AS estimated_revenue
         |FROM prod_perf GROUP BY category
         |ORDER BY estimated_revenue DESC, category""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ath_daily_revenue"       -> dailyRevenue,
    "ath_top_customers"       -> topPerformingCustomers,
    "ath_product_analysis"    -> productAnalysis,
    "ath_revenue_by_category" -> revenueByCategory)
}
