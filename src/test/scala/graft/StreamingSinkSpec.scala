package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.CatalogRegistry
import graft.sources.Tables
import graft.streaming.EventStreams

class StreamingSinkSpec extends SparkSpec {

  test("file source -> windowed agg -> checkpointed parquet sink, end to end") {
    val base = Files.createTempDirectory("graft_stream").toString
    val inDir = s"$base/in"
    // stage the events as an input directory the stream watches
    val ev = Tables.events(spark, sfDir)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
    ev.write.mode("overwrite").parquet(inDir)

    val stream = EventStreams.fileSource(spark, inDir, ev.schema)
    val q = EventStreams.parquetSink(
      EventStreams.windowedAgg(stream),
      s"$base/out", s"$base/chk")
    q.processAllAvailable()
    q.stop()

    // append mode only emits watermark-closed windows; all but the final
    // 10 minutes of event time must be present
    val out = spark.read.parquet(s"$base/out")
    assert(out.columns.toSeq ==
      Seq("window_start", "event_type", "n_events", "sum_value"))
    assert(out.count() > 0)
    val batch = graft.operators.Events.windowedAgg(spark, sfDir).count()
    assert(out.count() <= batch)
  }

  test("saveAsTable registers a queryable managed table") {
    val df = Tables.table(spark, sfDir, "nation")
    CatalogRegistry.saveAsTable(df, "graft_nation_copy")
    assert(spark.table("graft_nation_copy").count() == 25)
    spark.sql("DROP TABLE graft_nation_copy")
  }
}
