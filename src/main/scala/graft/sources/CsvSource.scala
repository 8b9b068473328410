package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV (bronze-layer) source (reference: scripts/transform.py:26,
  * scripts/extract.py writes bronze CSVs).
  *
  * Always an explicit schema: `inferSchema` needs a full extra pass over
  * the data — unacceptable at 100 TB — and silently guesses types. Date
  * coercion to null for unparseable values (pandas `errors='coerce'`)
  * is handled downstream by `Silver.coerceTimestamps`.
  */
object CsvSource {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** Bronze write (extract.py:78-80 dumps query results as headered CSV). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Bronze extract-all with timestamped names (extract.py:64-66 writes
    * `{table}_{timestamp}.csv` per table; extract_all_tables at :92-104
    * loops the table list): every table lands at
    * `<outDir>/<name>_<runTs>/` as headered CSV. One run timestamp for
    * the whole batch (the reference stamps per-call; a single stamp is
    * what makes the batch re-discoverable as one load). Writes stay
    * distributed — each table's write is a normal parallel Spark job,
    * the driver only names paths. Returns name → path. */
  def writeAll(tables: Map[String, DataFrame], outDir: String,
      runTs: java.time.LocalDateTime): Map[String, String] = {
    val stamp = runTs.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    tables.map { case (name, df) =>
      val path = s"$outDir/${name}_$stamp"
      write(df, path)
      name -> path
    }
  }
}
