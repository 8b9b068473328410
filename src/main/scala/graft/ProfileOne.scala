package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev utility (guide §1: measure first): run queries through the noop
  * sink with a listener attached and print WHERE the wall time goes —
  * planning vs execution, job/stage/task counts, summed task time,
  * shuffle bytes, GC — so an optimization targets the measured cost,
  * not a guess. Usage: `sbt "runMain graft.ProfileOne <key> [key...]"`;
  * iteration 2's row is the steady state (iteration 1 pays codegen).
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkConfigs.local(SparkSession.builder(),
      SparkConfigs.cpusFromEnv(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTime = new AtomicLong   // ms, summed across tasks
    val gcTime = new AtomicLong     // ms
    val shufRead = new AtomicLong   // bytes
    val shufWrite = new AtomicLong  // bytes
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTime.addAndGet(m.executorRunTime)
          gcTime.addAndGet(m.jvmGCTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm the scan/agg/noop paths once so iter-1 rows aren't all JIT
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    println(f"${"query"}%-28s it ${"wall"}%7s ${"plan"}%6s jobs stages tasks ${"taskT"}%7s ${"gc"}%5s ${"shR"}%8s ${"shW"}%8s")
    args.foreach { name =>
      (1 to 2).foreach { it =>
        jobs.set(0); stages.set(0); tasks.set(0)
        taskTime.set(0); gcTime.set(0); shufRead.set(0); shufWrite.set(0)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        println(f"$name%-28s $it  ${(t2 - t0) / 1e9}%7.2f ${(t1 - t0) / 1e9}%6.2f ${jobs.get}%4d ${stages.get}%6d ${tasks.get}%5d ${taskTime.get / 1e3}%7.1f ${gcTime.get / 1e3}%5.1f ${shufRead.get / 1048576.0}%7.1fM ${shufWrite.get / 1048576.0}%7.1fM")
      }
    }
    spark.stop()
  }
}
