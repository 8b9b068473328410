package graft

import org.apache.spark.sql.SparkSession

/** Audit main: prints every Window operator in every committed query
  * plan as `query TAB partition-cols` (empty spec = `(global)`), one
  * line per distinct window shape. PlanShapeSpec's negative-space
  * audit pins this inventory — run this to regenerate the allowlist
  * when a reviewed change adds or removes a window.
  *
  * Usage: `sbt "runMain graft.WindowAudit [sfDir]"`.
  */
object WindowAudit {

  /** Distinct window shapes of one plan: each window's partition
    * column names, sorted and `+`-joined ("(global)" when empty). */
  def windowShapes(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        if (w.partitionSpec.isEmpty) "(global)"
        else w.partitionSpec.flatMap(_.references.map(_.name))
          .distinct.sorted.mkString("+")
    }.toSet

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkConfigs.local(SparkSession.builder(),
      SparkConfigs.cpusFromEnv(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val shapes =
        try windowShapes(fn(spark, sfDir))
        catch { case e: Throwable => Set(s"ERROR: ${e.getMessage}") }
      shapes.toSeq.sorted.foreach(s => println(s"$name\t$s"))
    }
    spark.stop()
  }
}
