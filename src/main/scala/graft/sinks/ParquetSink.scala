package graft.sinks

import org.apache.spark.sql.DataFrame

/** Parquet sinks (reference: scripts/transform.py:50-60 silver writes,
  * scripts/aws_upload.py layered S3 upload).
  *
  * Paths are scheme-agnostic: `s3a://bucket/...` on a cluster,
  * `file:/...` locally — the Hadoop FS layer picks the implementation,
  * which is exactly how the reference's S3 layout maps to Spark. Writes
  * are snappy parquet; `partitionBy` produces the hive-style
  * `col=value/` layout Athena/Glue expect. No coalesce(1): output
  * parallelism follows the plan's partitioning so large writes scale.
  */
object ParquetSink {

  /** Silver-layer write: snappy parquet partitioned by the given columns
    * (the reference partitions by ingestion date, transform.py:47-49).
    * DYNAMIC partition overwrite: a run replaces only the partitions it
    * writes — yesterday's `load_date=` stays when today's run lands, and
    * a RERUN of the same date still replaces its own partition cleanly
    * (the idempotence the retry/calendar contracts ride on). Static
    * overwrite would truncate the whole table on every daily tick. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df
      // r15 (guide §6): REBALANCE on the partition columns before the
      // write — AQE coalesces small outputs AND splits skewed partition
      // values by advisoryPartitionSizeInBytes, so file count tracks
      // DATA SIZE instead of (tasks × live partition values): locally
      // the year-partitioned silver write dropped ~224 near-empty files
      // to one per partition value; at 100 TB a hot date splits across
      // many writers instead of funnelling one task. Layout-only: the
      // hive directory structure and every read-back result are
      // unchanged.
      .hint("rebalance", partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** The reference's S3 layout: <base>/<layer>/<table> (aws_upload.py
    * uploads bronze/silver/gold trees under one bucket prefix). */
  def layerPath(base: String, layer: String, table: String): String =
    s"$base/$layer/$table"

  /** Gold-layer write: one table per directory under <base>/gold/. */
  def writeGold(df: DataFrame, base: String, table: String): String = {
    val path = layerPath(base, "gold", table)
    // r15 (guide §6): keyless REBALANCE — gold aggregates are small, and
    // writing them from every post-aggregation task produced one near-
    // empty file per task; AQE sizes the output to the data instead.
    df.hint("rebalance")
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
    path
  }
}
