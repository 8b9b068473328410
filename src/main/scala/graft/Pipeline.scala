package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Athena, DataQuality, Gold, Silver}
import graft.sinks.ParquetSink
import graft.sources.{CsvSource, Tables}

/** The reference DAG as a composable library call
  * (dags/etl_retail_pipeline.py: extract ∥3 → transform_to_silver →
  * quality_checks → create_gold → upload_to_s3 → register_in_glue →
  * run_athena_queries), run over a lake base directory with the
  * medallion layout <base>/{bronze,silver,gold}/<table>.
  *
  * Bronze lands as headered CSV for fidelity with the reference's
  * extract stage (extract.py dumps CSV); at 100 TB the bronze landing
  * would go straight to parquet — swap `bronzeCsv=false` for that.
  */
object Pipeline {

  final case class RunResult(
      silverTables: Map[String, String],
      goldTables: Map[String, String],
      dqPassed: Boolean,
      analytics: Map[String, DataFrame])

  private val retailSchemas: Map[String, StructType] = Map(
    "sales" -> StructType(Seq(
      StructField("transaction_id", LongType), StructField("customer_id", LongType),
      StructField("product_id", LongType), StructField("store_id", LongType),
      StructField("quantity", LongType), StructField("unit_price", DoubleType),
      StructField("sale_ts", StringType))),
    "customers" -> StructType(Seq(
      StructField("customer_id", LongType), StructField("customer_name", StringType),
      StructField("city", StringType), StructField("country", StringType),
      StructField("acctbal", DoubleType))),
    "products" -> StructType(Seq(
      StructField("product_id", LongType), StructField("product_name", StringType),
      StructField("sku", StringType), StructField("category", StringType),
      StructField("price", DoubleType))),
    "stores" -> StructType(Seq(
      StructField("store_id", LongType), StructField("store_name", StringType),
      StructField("country", StringType))))

  /** Full medallion run: returns layer paths, the DQ gate verdict, and
    * the four analytics results computed FROM the lake's gold layer. */
  def run(spark: SparkSession, srcDir: String, lakeBase: String,
      loadDate: String = "d20260101"): RunResult = {

    // 1. extract → bronze (reference extracts each source table to CSV)
    val sources = Map(
      "sales"     -> Tables.sales(spark, srcDir)
        .withColumn("sale_ts", col("sale_ts").cast("string")),
      "customers" -> Tables.customers(spark, srcDir),
      "products"  -> Tables.products(spark, srcDir),
      "stores"    -> Tables.stores(spark, srcDir))
    sources.foreach { case (name, df) =>
      CsvSource.write(df, ParquetSink.layerPath(lakeBase, "bronze", name))
    }

    // 2. transform → silver: explicit-schema CSV read, clean, partitioned
    //    snappy parquet (transform.py semantics)
    val silver = sources.keys.map { name =>
      val cleaned = Silver
        .clean(
          CsvSource.read(spark, ParquetSink.layerPath(lakeBase, "bronze", name),
            retailSchemas(name)),
          dateCols = Seq("sale_ts"))
        .withColumn("load_date", lit(loadDate))
      val path = ParquetSink.layerPath(lakeBase, "silver", name)
      ParquetSink.writePartitioned(cleaned, path, Seq("load_date"))
      name -> path
    }.toMap

    // THIS run's snapshot only: with dynamic partition overwrite the
    // lake accumulates one load_date partition per daily tick, and a
    // run's DQ/gold read their own partition (pruned at the directory
    // level), never a mix of loads
    def silverTable(name: String): DataFrame =
      spark.read.parquet(silver(name))
        .where(col("load_date") === loadDate).drop("load_date")

    // 3. quality gate on the silver layer: single-pass rule checks plus
    //    referential integrity (orphan FK rows via broadcast anti-joins)
    val sales = silverTable("sales")
    val rules = DataQuality
      .genericRules(sales, silverTable("customers"), silverTable("products"))
      .select("check_name", "passed")
    val refs = Seq(
      ("customers", "customer_id"), ("products", "product_id"),
      ("stores", "store_id")).map { case (dim, fk) =>
      DataQuality.orphanCheck(s"sales_${fk}_fk", sales, fk,
        silverTable(dim).select(fk))
        .select(col("fk_name").as("check_name"), col("passed"))
    }.reduce(_ unionAll _)
    val dqPassed = rules.unionAll(refs)
      .agg(min(col("passed"))).head.getBoolean(0)

    // 4. gold aggregates from silver, written in the S3 layout
    val gold = Map(
      "daily_sales_summary" -> Gold.dailySalesSummaryOf(sales),
      "top_customers"       -> Gold.topCustomersOf(sales, silverTable("customers")),
      "product_performance" -> Gold.productPerformanceOf(sales, silverTable("products")),
      "store_performance"   -> Gold.storePerformanceOf(sales, silverTable("stores")))
    val goldPaths = gold.map { case (name, df) =>
      name -> ParquetSink.writeGold(df, lakeBase, name)
    }

    // 5. catalog registration (Glue analog): gold tables by name
    goldPaths.foreach { case (name, path) =>
      spark.read.parquet(path).createOrReplaceTempView(name)
    }

    // 6. the Athena business queries over the registered gold layer
    val analytics = Map(
      "daily_revenue"       -> Athena.dailyRevenueOf(spark.table("daily_sales_summary")),
      "top_performing_customers" ->
        Athena.topPerformingCustomersOf(spark.table("top_customers")),
      "product_analysis"    -> Athena.productAnalysisOf(spark.table("product_performance")),
      "revenue_by_category" -> Athena.revenueByCategoryOf(spark.table("product_performance")))

    RunResult(silver, goldPaths, dqPassed, analytics)
  }

  /** The reference DAG's operational contract
    * (dags/etl_retail_pipeline.py:15-23 — `retries: 1`,
    * `retry_delay`, `catchup=False`) as a library combinator:
    * re-execute a failed attempt up to `retries` times, sleeping
    * `retryDelayMs` between attempts (`sleep` injectable so tests
    * don't wait out the delay). Re-execution is safe BECAUSE [[run]]
    * is idempotent — a rerun into the same lake leaves byte-identical
    * gold and catalog state (pinned in PipelineRunSpec). Non-fatal
    * errors only; the last failure is rethrown once retries are
    * exhausted. */
  def withRetries[T](retries: Int, retryDelayMs: Long = 0L,
      sleep: Long => Unit = Thread.sleep)(attempt: Int => T): T = {
    // retries < 0 would skip the attempt entirely and `throw last`
    // with last == null — an opaque NPE instead of a real error
    require(retries >= 0, s"retries must be >= 0, got $retries")
    var n = 0
    var last: Throwable = null
    while (n <= retries) {
      try return attempt(n)
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e; n += 1
          if (n <= retries && retryDelayMs > 0) sleep(retryDelayMs)
      }
    }
    throw last
  }

  /** The load-date partition tag for an execution date (the reference's
    * `dYYYYMMDD` convention). */
  def loadDateTag(execDate: java.time.LocalDate): String =
    "d" + execDate.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)

  /** Load dates already landed in the lake's silver layer — read from
    * the `load_date=` partition directories of the silver sales table
    * (metadata-only: a directory listing, no data scan). */
  def loadedDates(spark: SparkSession, lakeBase: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(
      ParquetSink.layerPath(lakeBase, "silver", "sales"))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith("load_date="))
      .map(_.stripPrefix("load_date="))
      .toSet
  }

  /** The DAG's scheduling-calendar contract
    * (dags/etl_retail_pipeline.py:97-98 — `schedule_interval='@daily'`,
    * `catchup=False`) as a pure decision: which load dates does the run
    * triggered on `today` process, given the lake's current state?
    *
    * `@daily` closes one interval per day and a run executes for the
    * interval that JUST CLOSED — yesterday. `catchup=False` means a
    * scheduler that was down never backfills the missed intervals: the
    * manifest is always exactly ONE date, yesterday's, no matter how
    * many days are absent from the lake. Re-processing a date already
    * landed is safe — [[run]] is idempotent (byte-identical gold +
    * catalog state, pinned in PipelineRunSpec) — so the manifest only
    * REPORTS rerun-ness, it never skips the date. */
  final case class ManifestEntry(loadDate: String, alreadyLoaded: Boolean)
  def runManifest(spark: SparkSession, lakeBase: String,
      today: java.time.LocalDate): Seq[ManifestEntry] = {
    val tag = loadDateTag(today.minusDays(1))
    Seq(ManifestEntry(tag, loadedDates(spark, lakeBase).contains(tag)))
  }

  /** [[run]] for the dates [[runManifest]] selects — the daily
    * scheduled tick as one call. Returns the manifest with each entry's
    * run result. */
  def runScheduled(spark: SparkSession, srcDir: String, lakeBase: String,
      today: java.time.LocalDate): Seq[(ManifestEntry, RunResult)] =
    runManifest(spark, lakeBase, today).map { e =>
      e -> run(spark, srcDir, lakeBase, e.loadDate)
    }

  /** [[run]] under the DAG's retry policy. */
  def runWithRetries(spark: SparkSession, srcDir: String, lakeBase: String,
      loadDate: String = "d20260101", retries: Int = 1,
      retryDelayMs: Long = 300000L,
      sleep: Long => Unit = Thread.sleep): RunResult =
    withRetries(retries, retryDelayMs, sleep)(_ =>
      run(spark, srcDir, lakeBase, loadDate))
}
