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
    def catalogState(): Map[String, Long] =
      Seq("daily_sales_summary", "top_customers", "product_performance",
        "store_performance").map(n => n -> spark.table(n).count()).toMap
    val firstCat = catalogState()
    val second = goldHashes(Pipeline.run(spark, sfDir, lake))
    assert(second == first, "second run changed gold content")
    assert(catalogState() == firstCat, "second run changed catalog state")
  }

  test("scheduling calendar: @daily processes yesterday only, catchup=False never backfills") {
    val lake = java.nio.file.Files.createTempDirectory("graft_lake_cal").toString
    val d0 = java.time.LocalDate.of(2026, 1, 2)
    // fresh lake: the manifest is exactly yesterday, not yet loaded
    val m0 = Pipeline.runManifest(spark, lake, d0)
    assert(m0 == Seq(Pipeline.ManifestEntry("d20260101", alreadyLoaded = false)))
    val r0 = Pipeline.runScheduled(spark, sfDir, lake, d0)
    assert(r0.map(_._1) == m0 && r0.head._2.dqPassed)
    assert(Pipeline.loadedDates(spark, lake) == Set("d20260101"))
    // scheduler down for 3 days, back on Jan 6: the manifest is ONLY
    // Jan 5 — the missed Jan 2/3/4 intervals are never backfilled
    val m1 = Pipeline.runManifest(spark, lake, d0.plusDays(4))
    assert(m1 == Seq(Pipeline.ManifestEntry("d20260105", alreadyLoaded = false)))
    Pipeline.runScheduled(spark, sfDir, lake, d0.plusDays(4))
    assert(Pipeline.loadedDates(spark, lake) == Set("d20260101", "d20260105"),
      "no backfill dates appeared")
    // the same tick re-fired: the manifest flags the rerun, and the
    // re-run leaves the loaded-date state unchanged (idempotence)
    val m2 = Pipeline.runManifest(spark, lake, d0.plusDays(4))
    assert(m2 == Seq(Pipeline.ManifestEntry("d20260105", alreadyLoaded = true)))
    Pipeline.runScheduled(spark, sfDir, lake, d0.plusDays(4))
    assert(Pipeline.loadedDates(spark, lake) == Set("d20260101", "d20260105"))
  }

  test("retry policy: transient failure recovers, exhaustion rethrows") {
    // the DAG's retries:1 + retry_delay contract — a task that fails
    // once succeeds on the retry, with the delay honored between
    var slept = List.empty[Long]
    var calls = 0
    val out = Pipeline.withRetries(retries = 1, retryDelayMs = 300000L,
      sleep = ms => slept ::= ms) { attempt =>
      calls += 1
      if (attempt == 0) sys.error("transient extract failure")
      "ok"
    }
    assert(out == "ok" && calls == 2 && slept == List(300000L))
    // retries exhausted: the LAST failure surfaces
    val e = intercept[RuntimeException] {
      Pipeline.withRetries(retries = 1, sleep = _ => ()) { attempt =>
        sys.error(s"persistent failure $attempt")
      }
    }
    assert(e.getMessage == "persistent failure 1")
    // retries < 0 is a caller bug: fail loudly up front, never an
    // opaque NPE from `throw last` with no attempt ever run
    val bad = intercept[IllegalArgumentException] {
      Pipeline.withRetries(retries = -1, sleep = _ => ())(_ => "never")
    }
    assert(bad.getMessage.contains("retries must be >= 0"))
    // a retried RUN still lands the idempotent result (attempt 0 dies
    // mid-flight AFTER writing bronze — the rerun must recover cleanly)
    val lake = java.nio.file.Files.createTempDirectory("graft_lake3").toString
    var attempts = 0
    val r = Pipeline.withRetries(retries = 1, sleep = _ => ()) { attempt =>
      attempts += 1
      if (attempt == 0) {
        // simulate dying between bronze and silver: partial lake state
        graft.sources.CsvSource.write(
          graft.sources.Tables.stores(spark, sfDir),
          graft.sinks.ParquetSink.layerPath(lake, "bronze", "stores"))
        sys.error("executor lost")
      }
      Pipeline.run(spark, sfDir, lake)
    }
    assert(attempts == 2 && r.dqPassed)
    assert(r.goldTables.keySet.size == 4)
  }
}
