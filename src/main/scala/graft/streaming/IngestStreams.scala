package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest of raw text-lines corpora — the stream twin of
  * [[graft.operators.Ingest.textlinesRoundtrip]]'s read side. A
  * crawler trickles one-document-per-line files into a landing dir;
  * `spark.readStream.text` picks each file up as it arrives, the
  * SAME limit-4 tab parse runs per row (stateless map), and a
  * catalog-sized per-source health counter tells the ingest operator
  * whether a feed has started shipping garbage — before the corpus
  * build consumes it.
  */
object IngestStreams {

  /** Shared line parse — the stream and batch sides of the text-lines
    * contract (one builder, so the two can never drift; the parity
    * spec pins it). ANSI-mode safe by construction: `try_element_at`
    * / `try_cast` turn short or non-numeric lines into NULL fields
    * with `parse_ok=false` — crawler garbage must be COUNTED, never
    * dropped silently and never allowed to kill the stream (under
    * ANSI a bare element_at or cast would throw on the first bad
    * line). */
  private[graft] def parseLines(lines: DataFrame): DataFrame =
    lines.select(split(col("value"), "\t", 4).as("f"))
      .select(
        expr("try_cast(try_element_at(f, 1) AS BIGINT)").as("doc_id"),
        try_element_at(col("f"), lit(2)).as("lang"),
        try_element_at(col("f"), lit(3)).as("source"),
        try_element_at(col("f"), lit(4)).as("text"))
      .withColumn("parse_ok",
        col("doc_id").isNotNull && col("lang").isNotNull &&
          col("source").isNotNull && col("text").isNotNull)

  /** Per-source ingest-health counters over a parsed frame: arrived
    * lines, parse failures, char volume. EVERY failed parse lands in
    * the sentinel source — keyed on parse_ok, not on the source field
    * alone, so a partially-parsed garbage line (3 tab fields leave a
    * non-null field 3) can't pollute, or fabricate, a counter row
    * under whatever token happened to sit third. State is one counter
    * row per source — catalog-sized, complete-mode output. */
  private[graft] def ingestHealth(parsed: DataFrame): DataFrame =
    parsed
      .groupBy(when(col("parse_ok"), col("source"))
        .otherwise(lit("(unparsed)")).as("source"))
      .agg(count(lit(1)).as("n_lines"),
        sum((!col("parse_ok")).cast("long")).as("n_bad"),
        sum(length(coalesce(col("text"), lit(""))).cast("long"))
          .as("n_chars"))

  /** Streaming text-lines ingest-health monitor: parse + per-source
    * counters over a `readStream.text` (or any `value`-typed) feed. */
  def ingestHealthStream(lines: DataFrame): DataFrame =
    ingestHealth(parseLines(lines))
}
