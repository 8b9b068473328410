package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  * Queries are FULLY materialized through the noop sink (every column
  * computed and consumed by the executors) — a bare .count() would let
  * Spark prune columns and skip most of the work being measured.
  *
  * Timing protocol: `SPARK_GRAFT_BENCH_ITERS` (default 2) FULL sweeps
  * of the query set, per-query time = min across sweeps. Sweep 1 pays
  * codegen/JIT; a host-contention burst is localized in time, so it
  * lands in one sweep and the min recovers the steady state — the
  * 97→280 s recorded-total spread of round 3 came from single-sweep
  * runs with no such insurance.
  *
  * Artifacts: besides the stdout line (the driver contract), the FULL
  * result — every sweep's time per query plus a variance summary — is
  * written to `SPARK_GRAFT_BENCH_OUT` (default `bench_out/bench.json`),
  * so a truncated stdout tail can never lose the record.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default 2 sweeps (min-of-sweeps absorbs JIT + contention bursts);
    // an EXPLICIT value is honored as given — iters=1 is a deliberate
    // cold-start measurement, not a mistake to clamp away
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS")
      .map(v => math.max(1, v.toInt)).getOrElse(2)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out/bench.json")
    val spark = SparkConfigs.local(SparkSession.builder(),
      SparkConfigs.cpusFromEnv(32)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT the scan/aggregate/noop paths so the first timed query
    // doesn't absorb compilation cost
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val failed = scala.collection.mutable.Set[String]()
    (1 to iters).foreach { _ =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
        }
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }

    def obj(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val mins = names.map(n => n -> times(n).min)
    val total = mins.map(_._2).sum
    val sumMax = names.map(times(_).max).sum
    val relSpread = if (total > 0) (sumMax - total) / total else 0.0
    val qs = obj(mins.map { case (k, v) => k -> v.toString })
    val runs = obj(names.map(n => n -> times(n).mkString("[", ",", "]")))
    val errs = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val variance = obj(Seq(
      "iters" -> iters.toString, "sum_min" -> total.toString,
      "sum_max" -> sumMax.toString, "rel_spread" -> relSpread.toString))

    val full = obj(Seq(
      "metric" -> "\"total\"", "value" -> total.toString, "unit" -> "\"sec\"",
      "queries" -> qs, "runs" -> runs, "variance" -> variance,
      "errors" -> errs, "sf" -> ("\"" + sfDir + "\"")))
    val out = java.nio.file.Paths.get(outPath)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, full)

    // the driver-scraped line: min-of-sweeps per query + the variance
    // summary (not the per-sweep lists — keep the line compact)
    println(obj(Seq(
      "metric" -> "\"total\"", "value" -> total.toString, "unit" -> "\"sec\"",
      "queries" -> qs, "variance" -> variance, "errors" -> errs,
      "sf" -> ("\"" + sfDir + "\""), "artifact" -> ("\"" + outPath + "\""))))
    spark.stop()
  }
}
