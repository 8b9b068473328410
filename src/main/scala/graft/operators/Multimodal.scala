package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column handling: media payloads ride along as opaque
  * `binary` columns with typed metadata, processed per-partition through
  * a pluggable decoder.
  *
  * The decode step is a DETERMINISTIC STUB (no codec libraries in this
  * container) — but the Spark plumbing is real: binary columns in
  * parquet, a typed Dataset schema, partition-parallel `mapPartitions`
  * with a serializable decoder (exactly where an image/audio codec JNI
  * call would sit), and metadata that downstream queries filter on
  * without touching payload bytes.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, media_type: String, byte_len: Long, magic: String,
      frame_count: Long, width: Long, height: Long)

  /** The decode seam: swap `StubDecoder` for a real codec in prod. */
  trait MediaDecoder extends Serializable {
    def decode(rec: MediaRecord): MediaMeta
  }

  /** Deterministic fake decode: metadata derived only from payload
    * bytes, so results are reproducible and oracle-checkable. */
  object StubDecoder extends MediaDecoder {
    def decode(r: MediaRecord): MediaMeta = {
      val len = r.payload.length.toLong
      // first 4 BYTES (the oracle mirrors this via substring(hex(blob)))
      val magic = r.payload.take(4).map(b => f"${b & 0xFF}%02X").mkString
      MediaMeta(r.doc_id, r.media_type, len, magic,
        frame_count = len % 7 + 1,
        width = 64 + len % 640,
        height = 64 + len % 360)
    }
  }

  /** Partition-parallel metadata extraction — the batch shape a real
    * decoder needs (iterator in, iterator out, no per-row JNI setup). */
  def extractMeta(ds: Dataset[MediaRecord], decoder: MediaDecoder): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decoder.decode))
  }

  /** Contract query: documents as synthetic media payloads (UTF-8 bytes
    * as the opaque blob; type assigned round-robin), metadata extracted
    * through the decoder seam. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = Tables.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    extractMeta(recs, StubDecoder).toDF().orderBy("doc_id")
  }

  final case class ResizedMedia(
      doc_id: Long, media_type: String, width: Long, height: Long,
      payload: Array[Byte])

  /** Resize stage: scale every record's media to fit a target box
    * (aspect preserved) and re-encode. The pixel work is the stub (the
    * payload is proportionally truncated — a real codec call sits in
    * its place); the plumbing is the production shape: per-partition
    * batch, payload bytes never touch the driver, metadata recomputed
    * from the decode. */
  def resizeToFit(ds: Dataset[MediaRecord], decoder: MediaDecoder,
      maxW: Long, maxH: Long): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { rec =>
      val meta = decoder.decode(rec)
      val scale = math.min(1.0,
        math.min(maxW.toDouble / meta.width, maxH.toDouble / meta.height))
      val w = math.max(1L, (meta.width * scale).toLong)
      val h = math.max(1L, (meta.height * scale).toLong)
      val newLen = math.max(1, (rec.payload.length * scale * scale).toInt)
      ResizedMedia(rec.doc_id, rec.media_type, w, h, rec.payload.take(newLen))
    })
  }

  final case class FrameSample(
      doc_id: Long, frame_idx: Long, frame_off: Long, feat: Array[Float])

  /** Frame sampling: one row per decoded frame with a feature vector —
    * the batch shape of a video/image feature-extraction stage
    * (explode multiplies rows; the feature array column is the
    * embedding schema downstream ANN expects). Frame decode + feature
    * extraction are the deterministic stub; partitioning, schema and
    * iterator batching are the real pipeline. */
  def sampleFrames(ds: Dataset[MediaRecord], decoder: MediaDecoder): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      val meta = decoder.decode(rec)
      (0L until meta.frame_count).iterator.map { i =>
        val off = i * math.max(meta.byte_len / meta.frame_count, 1L)
        // stub feature: 4 deterministic floats derived from (len, frame)
        val feat = Array.tabulate(4)(j =>
          ((meta.byte_len + i * 31 + j * 7) % 997).toFloat / 997.0f)
        FrameSample(rec.doc_id, i, off, feat)
      }
    })
  }

  /** Contract query: frames sampled from the synthetic media corpus;
    * the feature vector is summarized (dot with a ones vector — the
    * native codegen path; a raw double sum, no ROUND, per the repo's
    * determinism rules) so the oracle stays SQL. */
  def frameSamples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.ArrayDotProduct.register(spark)
    val recs = Tables.table(spark, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    val ones = array(Seq.fill(4)(lit(1.0)): _*)
    sampleFrames(recs, StubDecoder)
      .toDF()
      .select(col("doc_id"), col("frame_idx"), col("frame_off"),
        graft.functions.VectorFunctions.dot(col("feat").cast("array<double>"), ones)
          .as("feat_sum"))
      .orderBy("doc_id", "frame_idx")
  }

  val oracles: Map[String, String] = Map(
    "mm_frame_samples" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |         CAST(octet_length(encode(text)) % 7 + 1 AS BIGINT) AS frame_count
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, byte_len, frame_count,
        |         CAST(unnest(generate_series(0, frame_count - 1)) AS BIGINT) AS frame_idx
        |  FROM m)
        |SELECT doc_id, frame_idx,
        |       frame_idx * GREATEST(byte_len // frame_count, 1) AS frame_off,
        |         CAST(CAST((byte_len + frame_idx*31 + 0) % 997 AS REAL)/CAST(997 AS REAL) AS DOUBLE)
        |       + CAST(CAST((byte_len + frame_idx*31 + 7) % 997 AS REAL)/CAST(997 AS REAL) AS DOUBLE)
        |       + CAST(CAST((byte_len + frame_idx*31 + 14) % 997 AS REAL)/CAST(997 AS REAL) AS DOUBLE)
        |       + CAST(CAST((byte_len + frame_idx*31 + 21) % 997 AS REAL)/CAST(997 AS REAL) AS DOUBLE)
        |         AS feat_sum
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_media_meta" ->
      """SELECT doc_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS media_type,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       substring(hex(encode(text)), 1, 8) AS magic,
        |       CAST(octet_length(encode(text)) % 7 + 1 AS BIGINT) AS frame_count,
        |       CAST(64 + octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |       CAST(64 + octet_length(encode(text)) % 360 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_meta"    -> mediaMeta,
    "mm_frame_samples" -> frameSamples)
}
