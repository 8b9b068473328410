package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: print the formatted physical plan of a query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkConfigs.local(SparkSession.builder(), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
