package graft

import org.apache.spark.sql.functions._
import graft.operators.Ingest
import graft.sources.Tables

class CatalogSpec extends SparkSpec {

  test("external partitioned table answers by name and matches the source") {
    val ext = Ingest.externalPartitionedCatalog(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val direct = Tables.sales(spark, sfDir)
      .where(year(col("sale_ts")) >= 1996)
      .groupBy(year(col("sale_ts")).as("sale_year"))
      .agg(count(lit(1)).as("n_rows"),
        graft.operators.Gold.moneySum(col("unit_price") * col("quantity"))
          .as("revenue"))
      .orderBy("sale_year").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(ext.nonEmpty)
    assert(ext.sameElements(direct))
  }

  test("lake discovery registers every table directory under the root") {
    val out = Ingest.lakeDiscovery(spark, sfDir).collect()
    assert(out.nonEmpty)
    // both discovered tables are queryable by name
    assert(spark.table("lake_customers_dim").count() ==
      Tables.customers(spark, sfDir).count())
    assert(spark.table("lake_stores_dim").count() ==
      Tables.stores(spark, sfDir).count())
    // the join result matches a direct (catalog-free) computation
    val direct = Tables.customers(spark, sfDir).groupBy("country")
      .agg(count(lit(1)).as("n_customers"))
      .join(Tables.stores(spark, sfDir).groupBy("country")
        .agg(count(lit(1)).as("n_stores")), "country")
      .orderBy("country").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sameElements(direct))
  }

  test("year predicate reaches the scan as a partition filter (pruning)") {
    Ingest.externalPartitionedCatalog(spark, sfDir).collect() // registers
    val pruned = spark.table("silver_sales_ext")
      .where(col("sale_year") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    // partition pruning, not a data filter: the predicate must appear in
    // PartitionFilters so non-matching directories are never opened
    assert(plan.contains("PartitionFilters"), plan.take(800))
    val partLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(partLine.contains("sale_year"), partLine)
    assert(pruned.count() > 0)
  }
}
