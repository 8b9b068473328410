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
}
