package graft

import org.apache.spark.sql.functions._
import graft.sinks.CatalogRegistry
import graft.sources.Tables

class BucketingSpec extends SparkSpec {

  test("facts bucketed on the join key join with zero shuffles") {
    CatalogRegistry.saveAsBucketedTable(
      Tables.table(spark, sfDir, "lineitem"), "b_lineitem", "l_orderkey", 8)
    CatalogRegistry.saveAsBucketedTable(
      Tables.table(spark, sfDir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
      "b_orders", "l_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), plan.take(400))
      assert(joined.count() ==
        Tables.table(spark, sfDir, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
