package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Catalog registration (reference: scripts/glue_registry.py registers
  * each layer's S3 location as a Glue external table so Athena can query
  * it by name).
  *
  * The Spark-native equivalent: register locations in the session
  * catalog so `spark.sql` resolves them by name. Temp views keep the
  * scan lazy (external-table semantics: no data copy); `saveAsTable`
  * covers the managed-table path.
  */
object CatalogRegistry {

  val baseTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  /** Register every base parquet table plus the retail views
    * (glue_registry.py:register_s3_table for each layer table). */
  def registerStarSchema(spark: SparkSession, dir: String): Unit = {
    baseTables.foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.sales(spark, dir).createOrReplaceTempView("sales")
    Tables.customers(spark, dir).createOrReplaceTempView("customers")
    Tables.products(spark, dir).createOrReplaceTempView("products")
    Tables.stores(spark, dir).createOrReplaceTempView("stores")
  }

  /** Managed-table registration (glue create_table analog). */
  def saveAsTable(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").saveAsTable(name)

  /** Bucketed managed table: rows hash-partitioned into `numBuckets`
    * files by `bucketCol` and sorted within buckets. Two facts bucketed
    * on the same key join with NO shuffle on either side — the 100 TB
    * answer for the recurring lineitem⋈orders join (asserted
    * exchange-free in BucketingSpec). */
  def saveAsBucketedTable(df: DataFrame, name: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(name)

  /** External partitioned table over a hive-layout directory
    * (glue_registry.py:40-64 registers a location with explicit
    * `PartitionKeys` so Athena prunes partitions; this is the
    * Spark-native analog for the silver layer ParquetSink writes):
    * schema AND partition columns are discovered from the directory,
    * then `RECOVER PARTITIONS` (the MSCK REPAIR crawler step) adds every
    * partition to the catalog. Queries by name then hit only matching
    * partition directories — the scan shows PartitionFilters, and at
    * 100 TB a day-filtered query reads one day, not the lake. */
  def registerExternalPartitioned(spark: SparkSession, name: String,
      path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING parquet OPTIONS (path '$path')")
    // unpartitioned directories register fine but have nothing to recover
    val partitioned = spark.catalog.listColumns(name).collect().exists(_.isPartition)
    if (partitioned) spark.catalog.recoverPartitions(name)
  }

  /** Lake discovery (glue_registry.py:139-182 crawler analog): list the
    * table directories under a lake prefix and register every one as an
    * external table — schema read from parquet footers, hive partition
    * columns discovered from the layout, partitions recovered. The only
    * driver-side work is one listing of the lake root (O(#tables), not
    * O(data)); each registered table stays a lazy external scan.
    * Returns the registered names (sorted, deterministic). */
  def discoverAndRegister(spark: SparkSession, lakeRoot: String,
      prefix: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(lakeRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .sortBy(_.getName)
      .map { p =>
        val name = s"${prefix}_${p.getName}"
        registerExternalPartitioned(spark, name, p.toString)
        name
      }.toSeq
  }
}
