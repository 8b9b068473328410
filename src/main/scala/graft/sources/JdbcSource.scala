package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC extract (reference: scripts/extract.py:13-21,47-59 pulls
  * `public.<table>` from Postgres into the bronze layer).
  *
  * Scale design: a naive `SELECT *` through one connection serializes
  * the whole table through a single task. `partitionColumn` +
  * lowerBound/upperBound/numPartitions makes Spark issue range-predicate
  * queries in parallel — the only way a 100 TB extract finishes.
  * Untestable in this sandbox (no database), so the builder is exercised
  * by unit tests on its configuration only.
  */
object JdbcSource {

  final case class JdbcConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 32,
      fetchSize: Int = 10000)

  /** Configure a reader for the given table; `.load()` connects. */
  def reader(spark: SparkSession, cfg: JdbcConfig): DataFrameReader = {
    val base = spark.read
      .format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("fetchsize", cfg.fetchSize.toString)
    (cfg.partitionColumn, cfg.lowerBound, cfg.upperBound) match {
      case (Some(col), Some(lo), Some(hi)) =>
        base
          .option("partitionColumn", col)
          .option("lowerBound", lo.toString)
          .option("upperBound", hi.toString)
          .option("numPartitions", cfg.numPartitions.toString)
      case _ => base
    }
  }

  def extractTable(spark: SparkSession, cfg: JdbcConfig): DataFrame =
    reader(spark, cfg).load()
}
