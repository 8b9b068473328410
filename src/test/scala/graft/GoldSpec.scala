package graft

import org.apache.spark.sql.functions._
import graft.operators.{Athena, Gold}
import graft.sources.Tables

class GoldSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has Spark code, and every oracle key a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 30)
  }

  test("daily sales totals reconcile with the fact table") {
    val daily = Gold.dailySalesSummary(spark, sfDir)
    val totalOrders = daily.agg(sum("total_orders")).head.getLong(0)
    val lineCount = Tables.table(spark, sfDir, "lineitem").count()
    assert(totalOrders == lineCount)
  }

  test("top customers is at most 10, sorted by spend desc") {
    val top = Gold.topCustomers(spark, sfDir).collect()
    assert(top.length <= 10)
    val spends = top.map(_.getAs[Double]("total_spent"))
    assert(spends.sameElements(spends.sortBy(-_)))
  }

  test("product performance covers every sold product") {
    val perf = Gold.productPerformance(spark, sfDir)
    val sold = Tables.sales(spark, sfDir).select("product_id").distinct().count()
    assert(perf.count() == sold)
  }

  test("store performance revenue reconciles with daily revenue") {
    val byStore = Gold.storePerformance(spark, sfDir)
      .agg(sum("total_revenue")).head.getDouble(0)
    val byDay = Gold.dailySalesSummary(spark, sfDir)
      .agg(sum("revenue")).head.getDouble(0)
    assert(math.abs(byStore - byDay) < 1.0)
  }

  test("popularity score is 1.0 for the most-sold product") {
    val top = Athena.productAnalysis(spark, sfDir).head()
    assert(top.getAs[Double]("popularity_score") == 1.0)
  }

  test("gold dimension joins are broadcast, not shuffled") {
    val plan = Gold.topCustomers(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("product analysis gets the global max via a 1-row broadcast, not a window") {
    val plan = Athena.productAnalysis(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the 1-row MAX aggregate is broadcast cross-joined back; an
    // unpartitioned window would funnel the whole product aggregate
    // through one partition
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("Window"))
  }
}
