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

  test("re-run into the same lake is idempotent (daily @retries contract)") {
    // the reference DAG re-runs (@daily, retries: 1, catchup=False):
    // a second run over the same input into the same lakeBase must
    // leave byte-identical gold content, not append or drift
    val lake = Files.createTempDirectory("graft_lake2").toString
    def goldHashes(r: Pipeline.RunResult): Map[String, (Long, String)] =
      r.goldTables.map { case (name, path) =>
        val df = spark.read.parquet(path)
        val cols = df.columns.sorted.map(col).toSeq
        val h = df.select(sha2(to_json(struct(cols: _*)), 256).as("h"))
          .agg(sum(conv(substring(col("h"), 1, 15), 16, 10).cast("decimal(38,0)")))
          .head().getDecimal(0).toString
        name -> (df.count(), h)
      }
    val first = goldHashes(Pipeline.run(spark, sfDir, lake))
    val second = goldHashes(Pipeline.run(spark, sfDir, lake))
    assert(second == first, "second run changed gold content")
  }
}
