package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Gold

/** Incremental gold-layer maintenance: the streaming twin of
  * Gold.dailySalesSummary. New sale events update their day's aggregate
  * in place instead of recomputing the gold table from scratch (the
  * reference recomputes all of gold every DAG run — load.py:148-186).
  *
  * Scale design: streaming state holds one row per open day-window per
  * key (bounded by the watermark), and the sink overwrites ONLY the
  * date partitions present in each micro-batch (dynamic partition
  * overwrite) — a day's reaggregation never touches other days' files.
  */
object GoldStreams {

  /** Watermarked per-day aggregation over a sales stream with the
    * gold daily_sales_summary schema. */
  def dailySalesSummaryStream(sales: DataFrame): DataFrame =
    sales
      .withWatermark("sale_ts", "1 day")
      .groupBy(window(col("sale_ts"), "1 day").as("w"))
      .agg(
        count(col("transaction_id")).as("total_orders"),
        sum(col("quantity")).as("total_items"),
        Gold.moneySum(col("unit_price") * col("quantity")).as("revenue"))
      .select(to_date(col("w.start")).as("sale_date"),
        col("total_orders"), col("total_items"), col("revenue"))

  /** Maintain a date-partitioned parquet gold table from the streaming
    * aggregate: update-mode emits each changed day, foreachBatch
    * replaces exactly those partitions. */
  def maintainDailySummary(agg: DataFrame, path: String,
      checkpoint: String): StreamingQuery = {
    val writeBatch: (DataFrame, Long) => Unit = (batch, _) => {
      if (!batch.isEmpty) {
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.write
          .mode("overwrite")
          .option("compression", "snappy")
          .partitionBy("sale_date")
          .parquet(path)
      }
    }
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(writeBatch)
      .start()
  }
}
