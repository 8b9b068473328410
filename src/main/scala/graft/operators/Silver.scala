package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, ShortType}
import graft.sources.Tables

/** Silver-layer cleaning (reference: scripts/transform.py:33-44):
  * string→timestamp with coercion-to-null (pandas `errors='coerce'`)
  * and numeric null-fill with 0.
  *
  * Both are pure row-local expressions — no shuffle, fully inside
  * whole-stage codegen, trivially scalable.
  */
object Silver {

  /** Columns the reference treats as dates (transform.py:33). */
  val defaultDateCols: Seq[String] =
    Seq("created_at", "updated_at", "order_date", "signup_date", "last_restocked")

  /** Parse string timestamp columns, null on unparseable input —
    * `try_to_timestamp` is exactly pandas to_datetime(errors='coerce'). */
  def coerceTimestamps(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.withColumn(c, try_to_timestamp(col(c)).cast("timestamp_ntz"))
    }

  /** Fill nulls in every numeric column with 0 (transform.py:40-44). */
  def fillNumericNulls(df: DataFrame): DataFrame = {
    val numeric = df.schema.fields.collect {
      case f if Seq(DoubleType, FloatType, IntegerType, LongType, ShortType)
        .contains(f.dataType) => f.name
    }
    df.na.fill(0, numeric)
  }

  /** Full silver clean: coerce known date columns, fill numeric nulls. */
  def clean(df: DataFrame, dateCols: Seq[String] = defaultDateCols): DataFrame =
    fillNumericNulls(coerceTimestamps(df, dateCols))

  // ---- contract queries -------------------------------------------------

  /** Date coercion demo: orders with 10% of dates corrupted to garbage;
    * the operator must null exactly those. */
  def dateCoercion(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.table(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_orderkey") % 10 === 0, lit("not-a-date"))
          .otherwise(col("o_orderdate").cast("string")).as("order_date"))
    coerceTimestamps(raw, Seq("order_date"))
      .select(col("o_orderkey"), col("order_date").as("parsed_ts"))
      .orderBy("o_orderkey")
  }

  /** Null-fill demo: events with 1-in-7 values nulled, then filled. */
  def nullFill(spark: SparkSession, dir: String): DataFrame = {
    val holey = Tables.events(spark, dir)
      .select(
        col("event_id"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value"))
          .as("value"))
    fillNumericNulls(holey)
      .select(col("event_id"), col("value").as("value_filled"))
      .orderBy("event_id")
  }

  val oracles: Map[String, String] = Map(
    "xf_date_coercion" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderdate END AS parsed_ts
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "xf_null_fill" ->
      """SELECT event_id,
        |       CASE WHEN event_id % 7 = 0 THEN 0.0 ELSE value END AS value_filled
        |FROM events ORDER BY event_id""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "xf_date_coercion" -> dateCoercion,
    "xf_null_fill"     -> nullFill)
}
