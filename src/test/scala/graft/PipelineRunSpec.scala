package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Gold

class PipelineRunSpec extends SparkSpec {

  test("full medallion run: bronze CSV -> silver -> DQ -> gold -> analytics") {
    val lake = Files.createTempDirectory("graft_lake").toString
    val result = Pipeline.run(spark, sfDir, lake)

    assert(result.dqPassed, "silver DQ gate must pass on clean testdata")
    assert(result.silverTables.keySet ==
      Set("sales", "customers", "products", "stores"))
    assert(result.goldTables.keySet == Set("daily_sales_summary",
      "top_customers", "product_performance", "store_performance"))

    // gold written through the lake equals gold computed directly —
    // the CSV bronze hop and silver clean must be lossless
    val viaLake = spark.read.parquet(result.goldTables("daily_sales_summary"))
      .agg(sum("revenue"), sum("total_orders")).head
    val direct = Gold.dailySalesSummary(spark, sfDir)
      .agg(sum("revenue"), sum("total_orders")).head
    assert(math.abs(viaLake.getDouble(0) - direct.getDouble(0)) < 1e-6)
    assert(viaLake.getLong(1) == direct.getLong(1))

    // analytics run over the registered gold tables and return rows
    result.analytics.foreach { case (name, df) =>
      assert(df.count() > 0, name)
    }
    // partitioned silver layout on disk (hive-style load_date dirs)
    assert(new java.io.File(s"${result.silverTables("sales")}/load_date=d20260101")
      .exists())
  }
}
