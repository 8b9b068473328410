package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Multimodal.MediaHeaders

/** Streaming decode-health monitoring of a media ingest feed — the
  * stream twin of [[graft.operators.Multimodal.corruptRate]].
  *
  * A multimodal crawl lands as (ts, media_type, payload) records; the
  * DQ question is the same one the batch gate answers — what fraction
  * of each declared type fails header decode — but asked per ingest
  * window, so a feed that starts shipping truncated files alarms a
  * micro-batch later, not at the nightly rollup.
  */
object MediaStreams {

  /** Shared window decode-health aggregation — applied to the
    * watermarked stream by [[decodeHealthMonitorStream]] and to the
    * static frame by the parity spec, so the two can never drift.
    *
    * The decode flag comes from the SAME pure-JVM header parsers as
    * the batch metadata decodes (PNG/JPEG/GIF ∪ WAV/MP3 ∪ MP4/AVI —
    * one seam, all three families), evaluated per row map-side; payload BYTES never
    * enter the aggregate, only (ok, length). State is one counter row
    * per (window, declared type) — stateless windowed agg, evicted at
    * the watermark. */
  private[graft] def decodeHealthWindowed(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val flagged = media
      .select(col("ts"), col("media_type"), col("payload"))
      .as[(java.sql.Timestamp, String, Array[Byte])]
      .map { case (ts, mt, p) =>
        val ok = MediaHeaders.parse(p).isDefined ||
          MediaHeaders.parseAudio(p).isDefined ||
          MediaHeaders.parseVideo(p).isDefined
        (ts, mt, p.length.toLong, ok)
      }
      .toDF("ts", "media_type", "byte_len", "ok")
    flagged
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("media_type"))
      .agg(count(lit(1)).as("n_records"),
        sum((!col("ok")).cast("long")).as("n_corrupt"),
        sum(col("byte_len")).as("total_bytes"))
      .select(col("w.start").as("window_start"), col("media_type"),
        col("n_records"), col("n_corrupt"), col("total_bytes"),
        (col("n_corrupt").cast("double") / col("n_records").cast("double"))
          .as("corrupt_rate"))
  }

  /** Streaming decode-health monitor: per 5-minute window per declared
    * media type, record count, header-parse failures, byte volume and
    * the corrupt fraction the ingest gate alarms on. */
  def decodeHealthMonitorStream(media: DataFrame): DataFrame =
    decodeHealthWindowed(media.withWatermark("ts", "10 minutes"))
}
