package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch twins of the streaming operators (graft.streaming runs the
  * same logic incrementally): tumbling-window aggregation and gap-based
  * sessionization over `events`.
  *
  * Timestamps are truncated to seconds before any gap/window arithmetic
  * so ns-vs-µs storage precision can never flip a boundary.
  */
object Events {

  val SessionGapSec = 1800L

  /** 5-minute tumbling windows per event type. */
  def windowedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Gold.moneySum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** (user_id, event_id, es): tz-agnostic epoch seconds per event —
    * computed from the NTZ wall clock (a cast to TIMESTAMP would make
    * downstream gap/range math depend on the session time zone).
    * Shared by sessionize and IntervalJoin. */
  def eventsWithEpochSeconds(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
          .as("es"))

  /** 30-minute-gap sessions per user: lag → new-session flag → running
    * sum as session index → per-session aggregate. One shuffle on
    * user_id; everything after is window/aggregate within partitions. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsWithEpochSeconds(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    e.withColumn("prev", lag(col("es"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("es") - col("prev") > SessionGapSec, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("es")).as("session_start_es"),
        (max(col("es")) - min(col("es"))).as("duration_sec"))
      .orderBy("user_id", "session_idx")
  }

  /** Semi-structured props extraction: pull typed fields out of the
    * JSON payload column (get_json_object is codegen'd; no UDF). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** Per-type value quantiles. `percentile` here is the exact
    * sort-based aggregate (oracle-comparable); at 100 TB swap in
    * `approx_percentile` (t-digest, mergeable, one pass) — same plan
    * shape, bounded memory. */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        Gold.fixedRound(expr("percentile(value, 0.5)"), 4).as("p50"),
        Gold.fixedRound(expr("percentile(value, 0.9)"), 4).as("p90"),
        Gold.fixedRound(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")

  val oracles: Map[String, String] = Map(
    "evt_quantiles" ->
      s"""SELECT event_type, COUNT(*) AS n_events,
         |       ${Gold.fixedRoundSql("quantile_cont(value, 0.5)", 4)} AS p50,
         |       ${Gold.fixedRoundSql("quantile_cont(value, 0.9)", 4)} AS p90,
         |       ${Gold.fixedRoundSql("quantile_cont(value, 0.99)", 4)} AS p99
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "evt_json_extract" ->
      """SELECT event_id, event_type,
        |       CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "str_windowed_agg" ->
      s"""SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         |       event_type, COUNT(*) AS n_events,
         |       ${Gold.moneySumSql("value")} AS sum_value
         |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "str_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id,
         |                  CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events),
         |l AS (SELECT *, LAG(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS prev
         |      FROM e),
         |f AS (SELECT *, CASE WHEN prev IS NULL OR es - prev > $SessionGapSec
         |                     THEN 1 ELSE 0 END AS new_s FROM l),
         |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id
         |                 ROWS UNBOUNDED PRECEDING) AS session_idx FROM f)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |       COUNT(*) AS n_events, MIN(es) AS session_start_es,
         |       MAX(es) - MIN(es) AS duration_sec
         |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "str_windowed_agg" -> windowedAgg,
    "str_sessionize"   -> sessionize,
    "evt_json_extract" -> jsonExtract,
    "evt_quantiles"    -> valueQuantiles)
}
