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

  test("streaming dedup drops replayed events within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = EventStreams.dedupStream(
      input.toDF().toDF("ts", "event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:05")
    input.addData(Seq((t0, 1L), (t0, 2L), (t0, 1L))) // replay of id 1
    q.processAllAvailable()
    input.addData(Seq((t1, 2L), (t0, 3L)))           // replay of id 2, re-stamped ts
    q.processAllAvailable()
    val out = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    q.stop()
    assert(out == Seq(1L, 2L, 3L))
  }

  test("partition pruning reaches the scan when filtering silver by load_date") {
    val base = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Tables.table(spark, sfDir, "nation")
    graft.sinks.ParquetSink.writePartitioned(
      df.withColumn("load_date", lit("d1")).unionAll(
        df.withColumn("load_date", lit("d2"))),
      base, Seq("load_date"))
    val pruned = spark.read.parquet(base).where(col("load_date") === "d1")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(load_date"), plan.take(600))
    assert(pruned.count() == 25)
  }

  test("saveAsTable registers a queryable managed table") {
    val df = Tables.table(spark, sfDir, "nation")
    CatalogRegistry.saveAsTable(df, "graft_nation_copy")
    assert(spark.table("graft_nation_copy").count() == 25)
    spark.sql("DROP TABLE graft_nation_copy")
  }
}
