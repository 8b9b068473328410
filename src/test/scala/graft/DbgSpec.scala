package graft
import org.apache.spark.sql.functions._
class DbgSpec extends SparkSpec {
  test("dbg3") {
    val dir = "/root/testdata/sf0.1"
    val first = graft.sources.Tables.sales(spark, dir)
      .groupBy("customer_id")
      .agg(min(struct(col("sale_ts"), col("transaction_id"), col("product_id"))).as("f"))
      .select(col("customer_id"), col("f.transaction_id").as("tid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = new java.io.PrintWriter("/tmp/spark_first.csv")
    first.foreach { case (c, t) => out.println(s"$c,$t") }
    out.close()
    info(s"n=${first.length}")
  }
}
