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
    * gold daily_sales_summary schema. Watermarks require a zoned
    * TIMESTAMP event-time column, whose day windows are epoch-aligned —
    * they only coincide with the batch twin's `to_date(sale_ts)` when
    * the session time zone is UTC, so a non-UTC session fails fast here
    * rather than silently mis-bucketing rows near midnight. */
  def dailySalesSummaryStream(sales: DataFrame): DataFrame = {
    require(
      sales.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
      "dailySalesSummaryStream requires spark.sql.session.timeZone=UTC " +
        "(day windows over a zoned event-time column shift with the " +
        "session time zone and would diverge from the batch gold table)")
    sales
      .withWatermark("sale_ts", "1 day")
      .groupBy(window(col("sale_ts"), "1 day").as("w"))
      .agg(
        count(col("transaction_id")).as("total_orders"),
        sum(col("quantity")).as("total_items"),
        Gold.moneySum(col("unit_price") * col("quantity")).as("revenue"))
      .select(to_date(col("w.start")).as("sale_date"),
        col("total_orders"), col("total_items"), col("revenue"))
  }

  /** Maintain a date-partitioned parquet gold table from the streaming
    * aggregate: update-mode emits each changed day, foreachBatch
    * replaces exactly those partitions. */
  def maintainDailySummary(agg: DataFrame, path: String,
      checkpoint: String): StreamingQuery = {
    val writeBatch: (DataFrame, Long) => Unit = (batch, _) => {
      // persist: isEmpty and write are both actions on the same
      // incremental plan — without caching it would execute twice
      val b = batch.persist()
      try {
        if (!b.isEmpty) {
          b.sparkSession.conf
            .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          b.write
            .mode("overwrite")
            .option("compression", "snappy")
            .partitionBy("sale_date")
            .parquet(path)
        }
      } finally b.unpersist()
    }
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(writeBatch)
      .start()
  }
}
